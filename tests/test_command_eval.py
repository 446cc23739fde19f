"""Voice-command mode + WER harness tests."""

import pathlib
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
JFK = pathlib.Path("/root/reference/samples/jfk.wav")


def test_wer_basics():
    from whisper_tpu.evals.wer import normalize_english, wer

    assert normalize_english("Hello, World!") == "hello world"
    # reference-normalizer behavior: "mr" -> "mister", "'s" -> " is"
    assert normalize_english("Mr. Smith's car (loudly)") == \
        "mister smith is car"
    assert normalize_english("I can't    stop") == "i can not stop"


def test_normalize_numbers():
    """Expectations are the REFERENCE normalizer's outputs verbatim
    (OpenAI EnglishTextNormalizer quirks included: currency words become
    prefix symbols, literal 'one' stays spelled out, bare 'second' is read
    as the ordinal 2nd); the full differential sweep lives in
    tests/test_wer_normalizer.py."""
    from whisper_tpu.evals.wer import normalize_english as N

    assert N("One hundred and twenty three dollars.") == "$123"
    assert N("twenty-one pilots") == "21 pilots"
    assert N("three point five percent") == "3.5%"
    assert N("the twenty-first century") == "the 21st century"
    assert N("two thousand and five") == "2005"
    assert N("one million four hundred thousand") == "1400000"
    assert N("the third quarter") == "the 3rd quarter"
    assert N("one and two") == "one and 2"
    assert N("zero point zero five") == "0.05"
    assert N("nineteen eighty four") == "1984"
    assert N("a hundredth of a second") == "a 100th of a 2nd"
    assert N("twenty second of May") == "22nd of may"
    assert N("five hundred and sixty seven") == "567"
    assert N("no numbers here") == "no numbers here"


def test_wer_scoring():
    from whisper_tpu.evals.wer import wer

    assert wer(["a b c"], ["a b c"]) == 0.0
    assert wer(["a b c"], ["a x c"]) == pytest.approx(1 / 3)
    assert wer(["a b c"], ["a c"]) == pytest.approx(1 / 3)       # deletion
    assert wer(["a b c"], ["a b x c"]) == pytest.approx(1 / 3)   # insertion
    assert wer(["a b", "c d"], ["a b", "c x"]) == pytest.approx(1 / 4)


def test_score_commands(mini_model_path):
    if not JFK.exists():
        pytest.skip("jfk.wav not available")
    from whisper_tpu.audio.io import load_audio
    from whisper_tpu.cli.command import score_commands
    from whisper_tpu.runtime.context import WhisperContext

    ctx = WhisperContext.from_file(str(mini_model_path))
    samples, _ = load_audio(str(JFK))
    commands = ["red", "green", "turn off the lights"]
    scores = score_commands(ctx, samples[:16000 * 3], commands)
    assert len(scores) == 3
    assert all(np.isfinite(s) and s <= 0 for s in scores)


def test_eval_harness_layout(tmp_path, mini_model_path):
    """eval_librispeech finds utterances in the LibriSpeech layout and
    produces a WER report."""
    sys.path.insert(0, str(REPO / "tools"))
    import subprocess

    d = tmp_path / "ds" / "spk" / "chap"
    d.mkdir(parents=True)
    # two tiny synthetic wavs + transcripts
    from whisper_tpu.audio.io import write_wav

    rng = np.random.default_rng(0)
    for i in range(2):
        write_wav(str(d / f"spk-chap-000{i}.wav"),
                  (0.05 * rng.standard_normal(8000)).astype(np.float32))
    (d / "spk-chap.trans.txt").write_text(
        "spk-chap-0000 HELLO WORLD\nspk-chap-0001 GOOD MORNING\n")

    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "eval_librispeech.py"),
         "-m", str(mini_model_path), "-d", str(tmp_path / "ds")],
        capture_output=True, text=True, timeout=600,
        env={"PYTHONPATH": str(REPO), "JAX_PLATFORMS": "cpu",
             "PATH": "/usr/bin:/bin:/usr/local/bin",
             "HOME": "/root"})
    assert r.returncode == 0, r.stderr[-800:]
    assert "WER:" in r.stdout
    assert "utterances: 2" in r.stdout
