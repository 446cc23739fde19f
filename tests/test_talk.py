"""Voice-chat loop tests (reference: examples/talk-llama)."""

import pathlib

import pytest

from whisper_tpu.cli import talk

JFK = pathlib.Path("/root/reference/samples/jfk.wav")


def test_build_prompt_substitution():
    import datetime

    now = datetime.datetime(2026, 8, 16, 14, 30)
    p = talk.build_prompt(talk.K_PROMPT_LLAMA, "Alice", "Bot", now)
    assert "Alice interacts with an AI assistant named Bot" in p
    assert "It is 14:30 o'clock." in p
    assert "We are in 2026." in p
    assert p.rstrip().endswith("Alice:")
    assert "{" not in p.replace("{0", "")  # all placeholders substituted


def test_clean_heard():
    assert talk.clean_heard(" [BLANK_AUDIO] hello (sighs) there! ") == \
        "hello  there!"
    assert talk.clean_heard("it's 5 o'clock, ok?") == "it's 5 o'clock, ok?"
    assert talk.clean_heard("héllo wörld") == "hllo wrld"


def test_cut_at_stops():
    assert talk.cut_at_stops("Blue.\nGeorgi: next", ["Georgi:"]) == "Blue.\n"
    assert talk.cut_at_stops("no stops here", ["Georgi:"]) == "no stops here"


def test_llm_cmd_backend():
    llm = talk.LLM(cmd="head -c 32", n_predict=8)
    out = llm.generate("PROMPT Blue.\nGeorgi: more", ["Georgi:"])
    # `head` echoes the prompt prefix back; the continuation-strip plus
    # stop-cutting leaves nothing past the stop marker
    assert "Georgi:" not in out


def test_speak_with_file(tmp_path):
    path = tmp_path / "say.txt"
    ok = talk.speak_with_file("true", "hello there", str(path), 2)
    assert ok and path.read_text() == "hello there"
    assert not talk.speak_with_file("false", "x", str(path), 2)


def test_talk_loop_end_to_end(mini_model_path, capsys):
    """Full loop on file audio with the echo backend: VAD triggers, STT runs,
    a bot turn is printed, TTS shell-out fires."""
    if not JFK.exists():
        pytest.skip("jfk.wav not available")
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        sf = f"{td}/speak.txt"
        rc = talk.main(["-m", str(mini_model_path), "-f", str(JFK),
                        "--no-realtime", "-p", "Sam", "-bn", "Echo",
                        "-s", "true", "-sf", sf, "-vms", "4000"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "Echo:" in out and "Sam:" in out
        assert pathlib.Path(sf).exists()
