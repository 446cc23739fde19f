"""Earnings21 harness tests (reference: tests/earnings21/eval.py)."""

import importlib.util
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
spec = importlib.util.spec_from_file_location(
    "eval_earnings21", ROOT / "tools" / "eval_earnings21.py")
e21 = importlib.util.module_from_spec(spec)
spec.loader.exec_module(e21)

NLP = """token|speaker|ts|endTs|punctuation|case|tags|wer_tags
good|1|0.0|0.1|||[]|[]
morning|1|0.1|0.2|||[]|[]
everyone|1|0.2|0.3|||[]|[]
thank|2|0.3|0.4|||[]|[]
you|2|0.4|0.5|||[]|[]
"""


def make_dataset(tmp_path, hyp_text):
    (tmp_path / "transcripts" / "nlp_references").mkdir(parents=True)
    (tmp_path / "media").mkdir()
    (tmp_path / "transcripts" / "nlp_references" / "call1.nlp").write_text(NLP)
    (tmp_path / "media" / "call1.mp3.txt").write_text(hyp_text)
    return tmp_path


def test_read_nlp(tmp_path):
    p = tmp_path / "x.nlp"
    p.write_text(NLP)
    toks = e21.read_nlp(p)
    assert toks[0] == ("good", "1") and toks[-1] == ("you", "2")
    assert e21.speaker_spans(toks) == [
        ("1", "good morning everyone"), ("2", "thank you")]


def test_exact_match_scores_zero(tmp_path, capsys):
    make_dataset(tmp_path, "Good morning, everyone. Thank you.\n")
    assert e21.main(["-d", str(tmp_path)]) == 0
    out = capsys.readouterr().out
    assert "WER: 0.00%" in out


def test_errors_and_speaker_breakdown(tmp_path, capsys):
    # speaker 1 gets one substitution (evening/morning); speaker 2 clean
    make_dataset(tmp_path, "Good evening everyone thank you\n")
    assert e21.main(["-d", str(tmp_path), "--speakers"]) == 0
    out = capsys.readouterr().out
    assert "WER: 20.00%" in out            # 1 error / 5 ref words
    lines = [l for l in out.splitlines() if l.strip().startswith(("1", "2"))]
    spk = {l.split()[0]: l for l in lines}
    assert "WER  33.33%" in spk["1"]       # 1 / 3
    assert "WER   0.00%" in spk["2"]


def test_windows_1252_hypothesis(tmp_path, capsys):
    make_dataset(tmp_path, "")
    (tmp_path / "media" / "call1.mp3.txt").write_bytes(
        b"\x93Good morning everyone thank you\x94")
    assert e21.main(["-d", str(tmp_path)]) == 0
    assert "WER: 0.00%" in capsys.readouterr().out
