"""Full-pipeline TEXT parity vs the reference whisper-cli binary.

The reference's correctness contract for its decoding state machine is
committed transcript diffs (tests/run-tests.sh:92-160, tests/en-{0,1,2}-ref.txt
and per-model whisper-cli ctest rows).  This is the network-free analogue:
committed transcripts in tests/data/text_parity/*.json were produced by the
REFERENCE binary (tools/make_text_refs.py) on deterministic DECISIVE mini
models (tools/make_test_model.py --decisive: argmax margins ~100x any
cross-implementation rounding noise — see whisper_tpu/evals/text_parity.py),
and whisper_tpu's full `transcribe()` must reproduce every segment's text
and t0/t1 EXACTLY — across greedy, beam-5, f16/q5_0/q8_0, a VAD-prefiltered
run, and a >30 s seek-loop run.

The fixtures are hermetic: the f16 model is regenerated from its seed, the
quantized models are produced by OUR whisper-quantize, and each file's
SHA-256 must equal the one recorded when the reference binary transcribed it
— simultaneously proving our quantizer writes byte-identical model files.

This caught a real divergence on first run: the reference forces
no_timestamps for ANY 2-text-layer model (first-release distil rule,
src/whisper.cpp:7005-7014) where our port had an extra n_audio_layer
condition.
"""

import hashlib
import json
import pathlib
import subprocess
import sys

import pytest

from whisper_tpu.evals import text_parity as TP

REPO = pathlib.Path(__file__).resolve().parents[1]
FIXTURES = REPO / ".fixtures"
REF_DIR = REPO / "tests" / "data" / "text_parity"
JFK = pathlib.Path("/root/reference/samples/jfk.wav")


def _sha(p: pathlib.Path) -> str:
    return hashlib.sha256(p.read_bytes()).hexdigest()


@pytest.fixture(scope="session")
def dec_models():
    """Build the decisive mini models exactly as the refs were made —
    f16 from seed, quantized files with OUR tool."""
    if not JFK.exists():
        pytest.skip("reference samples not available")
    models = {}
    for base in ("f16", "ml-f16", "tdrz-f16", "fd-f16", "fd-ml-f16",
                 "kq-f16", "race-f16"):
        path = FIXTURES / TP.model_filename(base)
        if not path.exists():
            FIXTURES.mkdir(exist_ok=True)
            donor, margs = TP.model_recipe(base)
            subprocess.run(
                [sys.executable, str(REPO / "tools" / "make_test_model.py"),
                 "--header-from", donor, "--out", str(path), *margs],
                check=True, env=None)
        models[base] = path
    from whisper_tpu.cli.quantize import quantize_model
    from whisper_tpu.formats import requant

    for q, src in (("q5_0", "f16"), ("q8_0", "f16"), ("fd-q5_0", "fd-f16"),
                   ("kq-q5_k", "kq-f16")):
        out = FIXTURES / TP.model_filename(q)
        if not out.exists():
            quantize_model(str(models[src]), str(out),
                           requant.parse_ftype(q.split("-")[-1]),
                           verbose=False)
        models[q] = out
    return models


@pytest.fixture(scope="session")
def parity_audio():
    from whisper_tpu.audio.io import load_audio

    jfk3 = TP.make_long_audio(str(JFK), FIXTURES / "jfk3.wav")
    jfk3st = TP.make_stereo_audio(str(JFK), FIXTURES / "jfk3-stereo.wav")
    return {"jfk": (load_audio(str(JFK))[0], JFK),
            "jfk3": (load_audio(str(jfk3))[0], jfk3),
            "jfk3st": (load_audio(str(jfk3st))[0], jfk3st)}


_CTX_CACHE = {}


def _ctx_for(model_path, dtw: str = "", precision: str = ""):
    """One WhisperContext per (model file, dtw preset, precision), shared
    across cases so the jit cache is reused (the contexts are stateless
    between transcribe calls with the default no_context=True).  DTW is a
    context-creation parameter in the reference (whisper_context_params
    .dtw_aheads_preset), hence part of the cache key."""
    from whisper_tpu.runtime.context import WhisperContext

    key = (str(model_path), dtw, precision)
    if key not in _CTX_CACHE:
        ctx = WhisperContext.from_file(str(model_path),
                                       precision=precision or None)
        if dtw:
            ctx.enable_dtw(preset=dtw)
        _CTX_CACHE[key] = ctx
    return _CTX_CACHE[key]


@pytest.mark.parametrize("case", TP.CASES, ids=lambda c: c.name)
def test_text_parity(case, dec_models, parity_audio):
    from whisper_tpu.decoding.full import transcribe

    ref_file = REF_DIR / f"{case.name}.json"
    assert ref_file.exists(), (
        f"missing committed reference {ref_file}; regenerate with "
        "tools/make_text_refs.py")
    ref = json.loads(ref_file.read_text())

    model = dec_models[case.model]
    samples, wav_path = parity_audio[case.audio]
    # the transcribed inputs must be byte-identical to what the reference
    # binary saw (also proves our quantize tool writes identical files)
    assert _sha(model) == ref["model_sha256"], (
        f"{model.name} differs from the file the reference transcribed")
    assert _sha(wav_path) == ref["audio_sha256"]
    if case.vad and not pathlib.Path(TP.SILERO_MODEL).exists():
        pytest.skip("silero test model not available")

    ctx = _ctx_for(model, case.dtw, case.precision)
    if case.processors > 1:
        from whisper_tpu.decoding.parallel import transcribe_parallel

        segs = transcribe_parallel(ctx, TP.transcribe_params(case), samples,
                                   case.processors)
    else:
        segs = transcribe(ctx, TP.transcribe_params(case), samples)
    stereo = None
    if case.diarize:
        from whisper_tpu.audio.io import load_audio

        stereo = load_audio(str(wav_path))[1]
        assert stereo is not None
    got = TP.segments_to_rows(segs, vocab=ctx.vocab if case.dtw else None,
                              tdrz=case.tdrz, stereo=stereo)

    if "result_language" in ref:
        # -l auto: the language whisper_lang_auto_detect chose must match the
        # reference's result.language (cli.cpp JSON "result" object)
        from whisper_tpu.decoding.languages import lang_str

        assert lang_str(ctx.lang_id) == ref["result_language"]

    stats = TP.compare(ref["segments"], got)
    assert got == ref["segments"], (
        f"{case.name}: segments differ from the reference binary "
        f"(similarity={stats['similarity']:.3f}, "
        f"exact prefix {stats['n_exact_prefix_segments']}/"
        f"{stats['n_ref_segments']})\nref: {ref['segments']}\ngot: {got}")


@pytest.mark.parametrize("tier,seed", [("stat", s) for s in TP.STAT_SEEDS]
                         + [("fd-stat", s) for s in TP.FD_STAT_SEEDS],
                         ids=lambda v: str(v))
def test_statistical_parity(tier, seed, parity_audio):
    """Statistical tier (VERDICT r3 weak #4): NON-decisive-margin minis
    (--boost 3: top-2 gaps near cross-implementation rounding noise — the
    regime real models decode in).  Gate = text similarity >= 0.95 + equal
    segment count (the reference's own en-ref tests and Parakeet's
    verification header are similarity gates, not exact diffs); tick-level
    timestamps MAY legitimately differ here, unlike the decisive tier."""
    from whisper_tpu.decoding.full import transcribe

    if tier == "fd-stat":
        mfile, margs = TP.fd_stat_model_filename(seed), TP.FD_STAT_MODEL_ARGS
    else:
        mfile, margs = TP.stat_model_filename(seed), TP.STAT_MODEL_ARGS
    ref_file = REF_DIR / f"{tier}-s{seed}.json"
    assert ref_file.exists(), (
        f"missing committed reference {ref_file}; regenerate with "
        "tools/make_text_refs.py")
    ref = json.loads(ref_file.read_text())

    model = FIXTURES / mfile
    if not model.exists():
        subprocess.run(
            [sys.executable, str(REPO / "tools" / "make_test_model.py"),
             "--header-from", TP.EN_DONOR, "--out", str(model),
             *margs, "--seed", str(seed)], check=True)
    assert _sha(model) == ref["model_sha256"], (
        f"{model.name} differs from the file the reference transcribed")
    samples, wav_path = parity_audio["jfk"]
    assert _sha(wav_path) == ref["audio_sha256"]

    from whisper_tpu.decoding.params import GreedyParams, TranscribeParams

    p = TranscribeParams(print_progress=False)
    p.greedy = GreedyParams(best_of=1)
    p.temperature_inc = 0.0
    got = TP.segments_to_rows(transcribe(_ctx_for(model), p, samples))

    stats = TP.compare(ref["segments"], got)
    assert stats["n_got_segments"] == stats["n_ref_segments"], stats
    assert stats["similarity"] >= TP.STAT_SIMILARITY_GATE, (
        f"{tier}-s{seed}: similarity {stats['similarity']:.3f} below "
        f"{TP.STAT_SIMILARITY_GATE} gate\nref: {ref['segments']}\ngot: {got}")


def test_decisive_margins(dec_models, parity_audio):
    """Document WHY the exact gate is safe: at every greedy step the
    top1-top2 gap of the filtered logits is far above the measured
    cross-implementation rounding noise (~1e-3 relative, i.e. ~0.03
    absolute at these logit scales — docs/VERIFICATION.md)."""
    import numpy as np

    from whisper_tpu.decoding import logits as LF

    ctx = _ctx_for(dec_models["f16"])
    ctx.pcm_to_mel(parity_audio["jfk"][0])
    ctx.encode_window(0)
    ctx.filter_tables = LF.LogitFilterTables(ctx.vocab, ctx.hp.n_audio_ctx)
    params = TP.transcribe_params(next(c for c in TP.CASES
                                       if c.name == "f16-greedy"))
    cache = ctx.new_cache(1)
    tok = ctx.vocab.token_sot
    toks = []
    gaps = []
    seek_delta, has_ts = 3000, False
    for step in range(12):
        raw, cache = ctx.decode(np.array([[tok]], np.int32), step, cache)
        lg, lp, pr = LF.process_logits(raw[0], ctx.filter_tables, params,
                                       0.0, toks, has_ts, seek_delta, None)
        top2 = np.sort(lg[np.isfinite(lg)])[-2:]
        gaps.append(float(top2[1] - top2[0]))
        tok = int(lg.argmax())
        if tok == ctx.vocab.token_eot:
            break
        if tok > ctx.vocab.token_beg:
            seek_delta, has_ts = 2 * (tok - ctx.vocab.token_beg), True
        from whisper_tpu.decoding.sampling import TokenData

        toks.append(TokenData(id=tok, tid=0, p=1.0, plog=0.0, pt=0.0,
                              ptsum=0.0))
    assert gaps and min(gaps) > 0.3, gaps


def test_beam_race_discriminates(dec_models, parity_audio):
    """The race-beam2-faithful case must DISCRIMINATE the two beam
    policies: on the race fixture, beam_sampling="topk" (deterministic
    top-k) must produce a transcript DIFFERENT from the committed oracle
    ref (which beam_sampling="reference" reproduces exactly in
    test_text_parity).  Guards the faithful case from going vacuous —
    e.g. if the race step's scripted mass split ever collapses."""
    from whisper_tpu.decoding.full import transcribe

    case = next(c for c in TP.CASES if c.name == "race-beam2-faithful")
    ref = json.loads((REF_DIR / "race-beam2-faithful.json").read_text())
    samples, _ = parity_audio["jfk"]
    p = TP.transcribe_params(case)
    p.beam_sampling = "topk"
    got = TP.segments_to_rows(
        transcribe(_ctx_for(dec_models["race-f16"]), p, samples))
    assert got != ref["segments"], (
        "top-k and reference beam draws agreed on the race fixture — the "
        "faithful-beam parity case no longer discriminates the policies")
