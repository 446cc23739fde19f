"""Output-writer BYTE parity vs the reference whisper-cli binary.

tests/data/writer_parity/* was produced by the reference binary
(tools/make_writer_refs.py) on the decisive f16 mini model over jfk.wav.
Our CLI, run with the identical flags, must reproduce every output file
byte-for-byte:

  txt/srt/vtt/csv/lrc  (examples/cli/cli.cpp:560-608, 937-960)
  wts karaoke script   (cli.cpp:816-937; -owts implies -ml 60 + token
                        timestamps, cli.cpp:1227-1229)
  -oj JSON             (cli.cpp:611-815) modulo the "systeminfo" line,
                        which names the implementation by design
  -ojf full JSON       additionally modulo token "p" (printf %f of
                        backend-dependent float; compared numerically)

This tier caught two real divergences on first run: our lrc writer
stripped the segment's leading space (the reference prints the raw text)
and our CLI did not apply the -owts→max_len=60 / -ojf→token_timestamps
implications.
"""

import json
import pathlib
import re
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
REF_DIR = REPO / "tests" / "data" / "writer_parity"
FIXTURES = REPO / ".fixtures"
JFK = pathlib.Path("/root/reference/samples/jfk.wav")

pytestmark = pytest.mark.skipif(not JFK.exists(),
                                reason="reference samples not available")


@pytest.fixture(scope="session")
def writer_meta(dec_models_shared):
    from whisper_tpu.evals import text_parity as TP

    meta = json.loads((REF_DIR / "meta.json").read_text())
    import hashlib
    model = FIXTURES / meta["model"]
    assert hashlib.sha256(model.read_bytes()).hexdigest() == \
        meta["model_sha256"], "mini model drifted from the committed ref"
    assert hashlib.sha256(JFK.read_bytes()).hexdigest() == \
        meta["audio_sha256"]
    st = TP.make_stereo_audio(str(JFK), FIXTURES / "jfk-stereo.wav",
                              repeats=1)
    assert hashlib.sha256(st.read_bytes()).hexdigest() == \
        meta["stereo_sha256"], "stereo fixture drifted from the committed ref"
    tdrz = FIXTURES / meta["tdrz_model"]
    assert hashlib.sha256(tdrz.read_bytes()).hexdigest() == \
        meta["tdrz_model_sha256"], "tdrz mini drifted from the committed ref"
    return meta


@pytest.fixture(scope="session")
def dec_models_shared():
    """Build (or reuse) the decisive mini models the refs were made on."""
    from whisper_tpu.evals import text_parity as TP

    paths = {}
    for base in ("f16", "tdrz-f16"):
        path = FIXTURES / TP.model_filename(base)
        if not path.exists():
            FIXTURES.mkdir(exist_ok=True)
            donor, margs = TP.model_recipe(base)
            subprocess.run(
                [sys.executable, str(REPO / "tools" / "make_test_model.py"),
                 "--header-from", donor, "--out", str(path), *margs],
                check=True)
        paths[base] = path
    return paths


def _run_ours(meta, run_name: str, tmp_path: pathlib.Path,
              extra=()) -> pathlib.Path:
    """Re-run our CLI with the recorded oracle args, redirecting -of."""
    args = list(meta["runs"][run_name]["cli_args"]) + list(extra)
    of = args.index("-of")
    prefix = tmp_path / f"ours-{run_name}"
    args[of + 1] = str(prefix)
    # -ng: force the CPU backend in the child.  The axon sitecustomize
    # force-registers the tunneled-TPU plugin and OVERRIDES the
    # JAX_PLATFORMS env var, so without the flag these byte-parity children
    # silently depend on the tunnel — and hang the whole suite for the
    # 900 s timeout apiece when it wedges (observed 2026-08-21).
    r = subprocess.run(
        [sys.executable, "-m", "whisper_tpu.cli.transcribe", *args, "-ng"],
        cwd=REPO, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    return prefix


@pytest.mark.parametrize("ext", ["txt", "srt", "vtt", "csv", "lrc"])
def test_plain_writers_byte_identical(writer_meta, ext, _plain_prefix):
    ref = (REF_DIR / f"plain.{ext}").read_bytes()
    ours = _plain_prefix.with_name(_plain_prefix.name + f".{ext}").read_bytes()
    assert ours == ref


@pytest.fixture(scope="session")
def _plain_prefix(writer_meta, tmp_path_factory):
    return _run_ours(writer_meta, "plain",
                     tmp_path_factory.mktemp("writer_plain"))


def _drop_systeminfo(text: str) -> str:
    return "\n".join(l for l in text.splitlines()
                     if '"systeminfo"' not in l) + "\n"


def test_json_byte_identical_mod_systeminfo(writer_meta, _plain_prefix):
    ref = (REF_DIR / "plain.json").read_text()
    ours = _plain_prefix.with_name(_plain_prefix.name + ".json").read_text()
    assert _drop_systeminfo(ours) == _drop_systeminfo(ref)


@pytest.fixture(scope="session")
def _diarize_prefix(writer_meta, tmp_path_factory):
    return _run_ours(writer_meta, "diarize",
                     tmp_path_factory.mktemp("writer_di"))


@pytest.mark.parametrize("ext", ["txt", "srt", "vtt", "csv", "lrc"])
def test_diarize_writers_byte_identical(writer_meta, ext, _diarize_prefix):
    ref = (REF_DIR / f"diarize.{ext}").read_bytes()
    ours = _diarize_prefix.with_name(
        _diarize_prefix.name + f".{ext}").read_bytes()
    assert ours == ref


def test_diarize_json_identical_mod_systeminfo(writer_meta, _diarize_prefix):
    ref = (REF_DIR / "diarize.json").read_text()
    ours = _diarize_prefix.with_name(
        _diarize_prefix.name + ".json").read_text()
    assert _drop_systeminfo(ours) == _drop_systeminfo(ref)


def test_wts_byte_identical(writer_meta, tmp_path_factory):
    prefix = _run_ours(writer_meta, "wts", tmp_path_factory.mktemp("wts"))
    ref = (REF_DIR / "wts.wts").read_bytes()
    ours = prefix.with_name(prefix.name + ".wts").read_bytes()
    assert ours == ref


def test_tdrz_writers(writer_meta, tmp_path_factory):
    """-tdrz: lrc/txt byte-identical; JSON carries speaker_turn_next for
    EVERY segment, true and false (cli.cpp:803-805)."""
    prefix = _run_ours(writer_meta, "tdrz", tmp_path_factory.mktemp("tdrz"))
    for ext in ("txt", "lrc"):
        assert prefix.with_name(prefix.name + f".{ext}").read_bytes() == \
            (REF_DIR / f"tdrz.{ext}").read_bytes()
    ref = (REF_DIR / "tdrz.json").read_text()
    ours = prefix.with_name(prefix.name + ".json").read_text()
    assert ref.count('"speaker_turn_next"') >= 2  # every segment has it
    assert _drop_systeminfo(ours) == _drop_systeminfo(ref)


def test_nt_negative_t0_writers(writer_meta, tmp_path_factory):
    """-nt's tid-zero quirk produces NEGATIVE t0 — every time formatter
    must reproduce the reference's C-truncation division output."""
    prefix = _run_ours(writer_meta, "nt", tmp_path_factory.mktemp("nt"))
    for ext in ("srt", "vtt", "csv", "lrc"):
        assert prefix.with_name(prefix.name + f".{ext}").read_bytes() == \
            (REF_DIR / f"nt.{ext}").read_bytes(), ext
    ref = (REF_DIR / "nt.json").read_text()
    ours = prefix.with_name(prefix.name + ".json").read_text()
    assert _drop_systeminfo(ours) == _drop_systeminfo(ref)


def test_full_json_identical_mod_p(writer_meta, tmp_path_factory):
    # token "p" is a softmax over 51k logits — far more arithmetic-sensitive
    # than the decisive argmax — so this case runs our ggml_cpu_f16 precision
    # mode (reproduces the oracle's f16 CPU arithmetic, docs/VERIFICATION.md)
    prefix = _run_ours(writer_meta, "full", tmp_path_factory.mktemp("full"),
                       extra=["--precision", "ggml_cpu_f16"])
    ref = (REF_DIR / "full.json").read_text()
    ours = prefix.with_name(prefix.name + ".json").read_text()

    p_re = re.compile(r'^\s*"p": [0-9.eE+-]+,$')

    def split(text):
        keep, ps = [], []
        for line in text.splitlines():
            if '"systeminfo"' in line:
                continue
            if p_re.match(line):
                ps.append(float(line.split(":")[1].rstrip(",")))
            else:
                keep.append(line)
        return keep, ps

    ref_keep, ref_p = split(ref)
    our_keep, our_p = split(ours)
    assert our_keep == ref_keep
    assert len(our_p) == len(ref_p)
    # Token "p" on the decisive mini is arithmetic-noise-amplified: the
    # crafted model's BACKGROUND logits are near-uniform, so the softmax
    # denominator sums 51k terms each carrying the backend's ~6e-4 rel
    # logit error — measured Z skew up to 1.4x even though the -inf mask
    # sets are bit-identical (verified against a logits_filter_callback
    # dump from the reference binary; see round-4 commit log).  Confident
    # tokens (p>0.9, denominator dominated by one term) match tightly;
    # flat-background ones get a loose bound.
    for a, b in zip(our_p, ref_p):
        if b > 0.9:
            assert abs(a - b) < 5e-3, (a, b)
        else:
            assert abs(a - b) < 0.12, (a, b)
