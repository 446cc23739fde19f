"""whisper.h-shaped C ABI shim (native/whisper_abi.cpp): build the shared
library + a pure-C host, then run the reference binding call sequence
(init -> full -> iterate segments -> free) end-to-end from C against the
deterministic mini model.  This is the door-opener for whisper.cpp-style
language bindings (reference bindings/go/whisper.go:12-29)."""

import json
import os
import pathlib
import subprocess
import sys
import sysconfig

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
BUILD = REPO / ".fixtures" / "abi"
MINI_MODEL = REPO / ".fixtures" / "mini-f16.bin"
JFK = pathlib.Path("/root/reference/samples/jfk.wav")


@pytest.fixture(scope="module")
def abi_build():
    BUILD.mkdir(parents=True, exist_ok=True)
    inc = sysconfig.get_paths()["include"]
    libdir = sysconfig.get_config_var("LIBDIR")
    pyver = f"python{sys.version_info.major}.{sys.version_info.minor}"
    so = BUILD / "libwhisper_tpu.so"
    exe = BUILD / "test_abi"
    src_so = REPO / "native" / "whisper_abi.cpp"
    src_c = REPO / "native" / "test_abi_main.c"
    if (not so.exists()
            or so.stat().st_mtime < src_so.stat().st_mtime):
        subprocess.run(
            ["g++", "-shared", "-fPIC", "-O2", str(src_so), "-o", str(so),
             f"-I{inc}", f"-L{libdir}", f"-l{pyver}",
             f"-Wl,-rpath,{libdir}"], check=True)
    if (not exe.exists()
            or exe.stat().st_mtime < src_c.stat().st_mtime
            or exe.stat().st_mtime < so.stat().st_mtime):
        subprocess.run(
            ["gcc", "-O2", str(src_c), "-o", str(exe),
             f"-L{BUILD}", "-lwhisper_tpu", f"-Wl,-rpath,{BUILD}"],
            check=True)
    # second host: the whisper.h-compatible STRUCT surface, compiled against
    # the real consumer header (also proves whisper_tpu.h parses as C)
    exe2 = BUILD / "test_abi_structs"
    src_c2 = REPO / "native" / "test_abi_structs.c"
    hdr = REPO / "native" / "whisper_tpu.h"
    if (not exe2.exists()
            or exe2.stat().st_mtime < src_c2.stat().st_mtime
            or exe2.stat().st_mtime < hdr.stat().st_mtime
            or exe2.stat().st_mtime < so.stat().st_mtime):
        subprocess.run(
            ["gcc", "-O2", "-Wall", "-Werror", f"-I{REPO / 'native'}",
             str(src_c2), "-o", str(exe2),
             f"-L{BUILD}", "-lwhisper_tpu", f"-Wl,-rpath,{BUILD}"],
            check=True)
    # third host: the five whisper_full_params C function-pointer callbacks
    # (whisper.h:455-478) driven live from pure C
    exe3 = BUILD / "test_abi_callbacks"
    src_c3 = REPO / "native" / "test_abi_callbacks.c"
    if (not exe3.exists()
            or exe3.stat().st_mtime < src_c3.stat().st_mtime
            or exe3.stat().st_mtime < hdr.stat().st_mtime
            or exe3.stat().st_mtime < so.stat().st_mtime):
        subprocess.run(
            ["gcc", "-O2", "-Wall", "-Werror", f"-I{REPO / 'native'}",
             str(src_c3), "-o", str(exe3),
             f"-L{BUILD}", "-lwhisper_tpu", f"-Wl,-rpath,{BUILD}"],
            check=True)
    return exe


def test_c_host_drives_engine(abi_build):
    if not JFK.exists():
        pytest.skip("jfk.wav not available")
    from whisper_tpu.audio.io import load_audio

    samples, _ = load_audio(str(JFK))
    pcm = BUILD / "jfk.pcm.f32"
    samples[: 16000 * 6].astype("<f4").tofile(pcm)

    env = dict(os.environ,
               PYTHONPATH=str(REPO),
               JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [str(abi_build), str(MINI_MODEL), str(pcm)],
        capture_output=True, text=True, timeout=900, env=env)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "C-ABI OK" in proc.stdout, proc.stdout
    assert "n_segments=" in proc.stdout
    # at least one segment with a timestamp line was printed
    n = int([ln for ln in proc.stdout.splitlines()
             if ln.startswith("n_segments=")][0].split("=")[1])
    assert n >= 1


def test_c_host_struct_surface(abi_build):
    """whisper.h-compatible struct path through the real consumer header:
    context_params init variants, whisper_init(model_loader), struct token
    data, whisper_get_timings, whisper_lang_str_full."""
    if not JFK.exists():
        pytest.skip("jfk.wav not available")
    from whisper_tpu.audio.io import load_audio

    samples, _ = load_audio(str(JFK))
    pcm = BUILD / "jfk.pcm.f32"
    if not pcm.exists():
        samples[: 16000 * 6].astype("<f4").tofile(pcm)

    env = dict(os.environ, PYTHONPATH=str(REPO), JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [str(BUILD / "test_abi_structs"), str(MINI_MODEL), str(pcm)],
        capture_output=True, text=True, timeout=900, env=env)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "STRUCT-ABI-OK" in proc.stdout, proc.stdout
    assert "token_data: id=" in proc.stdout
    assert "timings: sample=" in proc.stdout


def test_c_host_callbacks(abi_build):
    """The five whisper_full_params C callbacks (whisper.h:455-478): a pure-C
    host streams new_segment mid-run (with live accessor reads from inside
    the callback), counts progress/encoder_begin, aborts a run mid-window
    via abort_callback, vetoes a run via encoder_begin, and force-picks
    tokens through logits_filter's in-place rewrite."""
    if not JFK.exists():
        pytest.skip("jfk.wav not available")
    from whisper_tpu.audio.io import load_audio

    samples, _ = load_audio(str(JFK))
    pcm = BUILD / "jfk.pcm.f32"
    if not pcm.exists():
        samples[: 16000 * 6].astype("<f4").tofile(pcm)

    env = dict(os.environ, PYTHONPATH=str(REPO), JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [str(BUILD / "test_abi_callbacks"), str(MINI_MODEL), str(pcm)],
        capture_output=True, text=True, timeout=900, env=env)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "CALLBACKS-OK" in proc.stdout, proc.stdout
    assert "run A:" in proc.stdout
    assert "run B: aborted" in proc.stdout
    assert "run D: logits_filter forced" in proc.stdout


def test_capi_cparams_and_timings(mini_model_path):
    """Python-side halves of the new surface: cparams DTW application,
    packed timings/token-data marshalling, full language names."""
    import struct as _struct

    from whisper_tpu import capi

    assert capi.lang_str_full(0) == "english"
    assert capi.lang_str_full(1) == "chinese"

    # cparams with a DTW preset: 3-layer mini model has no named preset, so
    # use n_top_most which works for any depth (whisper.h preset enum 1)
    h = capi.init_from_file_with_cparams(
        str(mini_model_path),
        json.dumps({"dtw_token_timestamps": True, "dtw_aheads_preset": 1,
                    "dtw_n_top": 1}))
    assert h > 0
    from whisper_tpu.capi import _contexts

    assert _contexts[h].dtw_token_timestamps
    assert _contexts[h].dtw_aheads  # resolved (layer, head) pairs
    samples = np.zeros(16000, np.float32)
    assert capi.full(h, '{"temperature_inc": 0.0}', samples) == 0
    if capi.full_n_segments(h) > 0 and capi.full_n_tokens(h, 0) > 0:
        raw = capi.full_get_token_data_packed(h, 0, 0)
        assert len(raw) == 52
        vals = _struct.unpack("<2i4f3qf", raw)
        assert vals[0] == capi.full_get_token_id(h, 0, 0)
    t = _struct.unpack("<5f", capi.get_timings_packed(h))
    assert all(v >= 0.0 for v in t) and t[1] > 0.0  # encode_ms accrued
    capi.free(h)

    # an invalid CUSTOM head list must fail like aheads_masks_init -> NULL
    bad = capi.init_from_file_with_cparams(
        str(mini_model_path),
        json.dumps({"dtw_token_timestamps": True, "dtw_aheads_preset": 2,
                    "dtw_aheads": [[99, 0]]}))
    assert bad == 0


def test_capi_python_surface(mini_model_path):
    """The handle API itself (independent of the C build)."""
    from whisper_tpu import capi

    h = capi.init_from_file(str(mini_model_path))
    assert h > 0
    assert capi.init_from_file("/nonexistent.bin") == 0
    assert capi.lang_id("en") == 0
    assert capi.lang_str(0) == "en"
    assert capi.lang_max_id() > 90

    samples = np.zeros(16000, np.float32)  # 1 s silence
    rc = capi.full(h, '{"language": "en", "temperature_inc": 0.0}', samples)
    assert rc == 0
    n = capi.full_n_segments(h)
    for i in range(n):
        assert isinstance(capi.full_get_segment_text(h, i), str)
        assert capi.full_get_segment_t1(h, i) >= capi.full_get_segment_t0(h, i)
    capi.free(h)
    assert capi.full_n_segments(h) == 0


def test_capi_introspection_and_tokens(mini_model_path):
    """whisper.h:270-436 accessor parity over handles."""
    import json

    from whisper_tpu import capi

    h = capi.init_from_file(str(mini_model_path))
    assert h > 0
    hp_pairs = [
        (capi.n_vocab, capi.model_n_vocab),
        (capi.n_audio_ctx, capi.model_n_audio_ctx),
        (capi.n_text_ctx, capi.model_n_text_ctx),
    ]
    for fa, fb in hp_pairs:
        assert fa(h) > 0 and fa(h) >= fb(h) - 1  # vocab may be synthesized
    for f in (capi.model_n_audio_state, capi.model_n_audio_head,
              capi.model_n_audio_layer, capi.model_n_text_state,
              capi.model_n_text_head, capi.model_n_text_layer,
              capi.model_n_mels):
        assert f(h) > 0
    assert capi.model_type_readable(h) in (
        "tiny", "base", "small", "medium", "large", "unknown")
    assert isinstance(capi.version(), str) and capi.version()

    # special tokens ordered like the reference vocab
    assert capi.token_sot(h) == capi.token_eot(h) + 1
    assert capi.token_beg(h) > capi.token_sot(h)
    for f in (capi.token_prev, capi.token_solm, capi.token_nosp,
              capi.token_not, capi.token_translate, capi.token_transcribe):
        assert f(h) > 0

    # tokenizer round trip
    toks = capi.tokenize(h, " and")
    assert toks and capi.token_count(h, " and") == len(toks)
    assert isinstance(capi.token_to_str(h, toks[0]), str)

    # default params JSON is loadable and carries reference field names
    dp = json.loads(capi.full_default_params_json(1))
    assert dp["strategy"] == 1
    assert dp["beam_search.beam_size"] == 5
    assert "temperature_inc" in dp and "no_speech_thold" in dp
    capi.free(h)


def test_capi_lowlevel_drive_and_state(mini_model_path):
    """pcm_to_mel -> encode -> decode -> logits, plus the state API
    (whisper.h:262-345, 650)."""
    from whisper_tpu import capi

    h = capi.init_from_file(str(mini_model_path))
    samples = np.zeros(16000, np.float32)
    assert capi.pcm_to_mel(h, samples) == 0
    assert capi.n_len(h) > 0
    assert capi.encode(h, 0) == 0
    assert capi.decode(h, [capi.token_sot(h)], 0) == 0
    logits = capi.get_logits(h)
    assert logits.shape == (capi.n_vocab(h),)
    assert np.isfinite(logits).all()
    # a second step at n_past=1 reuses the handle's cache
    assert capi.decode(h, [int(logits.argmax())], 1) == 0

    lid = capi.lang_auto_detect(h, 0)
    assert lid >= 0
    probs = np.frombuffer(capi.get_lang_probs_bytes(h), "<f4")
    assert len(probs) == capi.lang_max_id() + 1
    assert abs(float(probs.sum()) - 1.0) < 1e-3

    # state API: results land on the state, not the context
    sh = capi.init_state(h)
    assert sh > 0
    rc = capi.full_with_state(
        h, sh, '{"language": "en", "temperature_inc": 0.0}', samples)
    assert rc == 0
    ns = capi.full_n_segments_from_state(sh)
    for i in range(ns):
        assert isinstance(capi.full_get_segment_text_from_state(sh, i), str)
        assert (capi.full_get_segment_t1_from_state(sh, i)
                >= capi.full_get_segment_t0_from_state(sh, i))
        for j in range(capi.full_n_tokens_from_state(sh, i)):
            assert capi.full_get_token_id_from_state(sh, i, j) >= 0
    capi.free_state(sh)
    assert capi.full_n_segments_from_state(sh) == 0
    capi.free(h)


def test_capi_init_from_buffer(mini_model_path):
    from whisper_tpu import capi

    data = mini_model_path.read_bytes()
    h = capi.init_from_buffer(data)
    assert h > 0
    assert capi.n_vocab(h) > 0
    capi.free(h)
    assert capi.init_from_buffer(b"not a model") == 0


def test_capi_vad_surface():
    """whisper_vad_* handle API (whisper.h:699-756)."""
    from whisper_tpu import capi

    silero = pathlib.Path(
        "/root/reference/models/for-tests-silero-v6.2.0-ggml.bin")
    if not silero.exists():
        pytest.skip("silero test model not available")
    h = capi.vad_init_from_file(str(silero))
    assert h > 0
    t = np.arange(16000 * 2, dtype=np.float32) / 16000.0
    voice = (np.sin(2 * np.pi * 220 * t) * np.hanning(len(t))).astype(
        np.float32)
    segs = capi.vad_segments_from_samples(h, None, voice)
    assert segs > 0  # a whisper_vad_segments handle, freed below
    n = capi.vad_segments_n_segments(segs)
    assert n >= 0
    for i in range(n):
        assert (capi.vad_segments_get_segment_t1(segs, i)
                >= capi.vad_segments_get_segment_t0(segs, i))
    capi.vad_free_segments(segs)
    capi.vad_free(h)
    assert capi.vad_init_from_file("/nonexistent.bin") == 0


def test_capi_state_step_by_step(mini_model_path):
    """State-variant step API (whisper.h:265-341, 417): mel/encode/decode
    land on the state, leaving the parent context untouched."""
    from whisper_tpu import capi

    h = capi.init_from_file(str(mini_model_path))
    sh = capi.init_state(h)
    samples = np.zeros(16000, np.float32)
    assert capi.pcm_to_mel_with_state(h, sh, samples) == 0
    assert capi.n_len_from_state(sh) > 0
    assert capi.n_len(h) == 0  # parent context has no mel
    assert capi.encode_with_state(h, sh, 0) == 0
    assert capi.decode_with_state(h, sh, [capi.token_sot(h)], 0) == 0
    logits = np.frombuffer(capi.get_logits_bytes_from_state(sh), "<f4")
    assert logits.shape == (capi.n_vocab(h),)
    assert np.isfinite(logits).all()
    lid = capi.lang_auto_detect_with_state(h, sh, 0)
    assert lid >= 0
    capi.free_state(sh)
    capi.free(h)


def test_capi_token_accessors_from_state(mini_model_path):
    from whisper_tpu import capi

    h = capi.init_from_file(str(mini_model_path))
    sh = capi.init_state(h)
    samples = np.zeros(16000, np.float32)
    assert capi.full_with_state(h, sh, '{"temperature_inc": 0.0}',
                                samples) == 0
    if capi.full_n_segments_from_state(sh) > 0:
        txt = capi.full_get_token_text_from_state(h, sh, 0, 0)
        assert isinstance(txt, str)
        data = json.loads(capi.full_get_token_data_json_from_state(sh, 0, 0))
        assert {"id", "p", "t0", "t1"} <= set(data)
        assert capi.full_get_token_t0_from_state(sh, 0, 0) == data["t0"]
        assert capi.full_get_token_t1_from_state(sh, 0, 0) == data["t1"]
    capi.free_state(sh)
    capi.free(h)


def test_capi_full_vad_segments(mini_model_path):
    """whisper_full with params.vad records the kept speech segments
    (whisper.h:686-698; state->vad_segments, src/whisper.cpp:6759-6776)."""
    from whisper_tpu import capi

    silero = pathlib.Path(
        "/root/reference/models/for-tests-silero-v6.2.0-ggml.bin")
    if not silero.exists():
        pytest.skip("silero test model not available")
    import wave

    with wave.open("/root/reference/samples/jfk.wav") as r:
        pcm = (np.frombuffer(r.readframes(r.getnframes()), np.int16)
               .astype(np.float32) / 32768.0)
    h = capi.init_from_file(str(mini_model_path))
    params = json.dumps({"vad": True, "vad_model_path": str(silero),
                         "temperature_inc": 0.0})
    assert capi.full(h, params, pcm) == 0
    n = capi.full_n_vad_segments(h)
    assert n > 0
    for i in range(n):
        assert (0 <= capi.full_get_vad_segment_t0(h, i)
                < capi.full_get_vad_segment_t1(h, i))
    # a non-VAD run clears them
    assert capi.full(h, '{"temperature_inc": 0.0}', pcm[:16000]) == 0
    assert capi.full_n_vad_segments(h) == 0
    capi.free(h)


def test_capi_vad_probs_lowlevel():
    """detect_speech / n_probs / probs / segments_from_probs / reset
    (whisper.h:717-742)."""
    from whisper_tpu import capi

    silero = pathlib.Path(
        "/root/reference/models/for-tests-silero-v6.2.0-ggml.bin")
    if not silero.exists():
        pytest.skip("silero test model not available")
    import wave

    with wave.open("/root/reference/samples/jfk.wav") as r:
        pcm = (np.frombuffer(r.readframes(r.getnframes()), np.int16)
               .astype(np.float32) / 32768.0)
    h = capi.vad_init_from_file(str(silero))
    assert capi.vad_detect_speech(h, pcm) == 1
    n = capi.vad_n_probs(h)
    assert n > 0
    probs = np.frombuffer(capi.vad_probs_bytes(h), "<f4")
    assert len(probs) == n and (probs >= 0).all() and (probs <= 1).all()
    seg1 = capi.vad_segments_from_probs(h, None)
    assert seg1 > 0
    n_seg = capi.vad_segments_n_segments(seg1)
    assert n_seg > 0
    # the probs path and the samples path segment identically
    seg2 = capi.vad_segments_from_samples(h, None, pcm)
    assert capi.vad_segments_n_segments(seg2) == n_seg
    assert [(capi.vad_segments_get_segment_t0(seg2, i),
             capi.vad_segments_get_segment_t1(seg2, i))
            for i in range(n_seg)] == \
           [(capi.vad_segments_get_segment_t0(seg1, i),
             capi.vad_segments_get_segment_t1(seg1, i))
            for i in range(n_seg)]
    capi.vad_free_segments(seg1)
    capi.vad_free_segments(seg2)
    # streaming variant carries LSTM state without touching correctness here
    assert capi.vad_detect_speech(h, pcm[:16000], reset=False) == 1
    capi.vad_reset_state(h)
    capi.vad_free(h)


def test_capi_log_sink_roundtrip():
    """whisper_log_set: C-callback sink receives framework log lines."""
    import ctypes

    from whisper_tpu import capi
    from whisper_tpu.runtime.logging import log_info

    lines = []
    CB = ctypes.CFUNCTYPE(None, ctypes.c_int, ctypes.c_char_p,
                          ctypes.c_void_p)
    cb = CB(lambda lvl, txt, ud: lines.append((lvl, txt)))
    capi.log_set_c_sink(ctypes.cast(cb, ctypes.c_void_p).value, 0)
    try:
        log_info("log sink test\n")
    finally:
        capi.log_set_c_sink(0, 0)
    assert lines == [(2, b"log sink test\n")]  # INFO == ggml level 2
    log_info("")  # default sink restored, must not raise


PARAKEET_MODEL = pathlib.Path(
    "/root/reference/models/for-tests-ggml-parakeet-tdt.bin")


def test_c_host_parakeet(abi_build):
    """Parakeet C ABI (native/parakeet_tpu.h; reference
    include/parakeet.h:1-342): a pure-C host inits from file/buffer/loader,
    runs parakeet_full with the struct params + all five callbacks
    (new_segment with live accessor reads, new_token with token_data
    structs, progress, encoder_begin veto -> -6, abort -> -6), the state
    API, chunk streaming, tokenizer, logits, and timings — and its
    transcript must equal the Python path's text."""
    if not PARAKEET_MODEL.exists():
        pytest.skip("parakeet test model not available")
    if not JFK.exists():
        pytest.skip("jfk.wav not available")
    from whisper_tpu.audio.io import load_audio

    exe = BUILD / "test_abi_parakeet"
    src = REPO / "native" / "test_abi_parakeet.c"
    hdr = REPO / "native" / "parakeet_tpu.h"
    so = BUILD / "libwhisper_tpu.so"
    if (not exe.exists()
            or exe.stat().st_mtime < src.stat().st_mtime
            or exe.stat().st_mtime < hdr.stat().st_mtime
            or exe.stat().st_mtime < so.stat().st_mtime):
        subprocess.run(
            ["gcc", "-O2", "-Wall", "-Werror", f"-I{REPO / 'native'}",
             str(src), "-o", str(exe),
             f"-L{BUILD}", "-lwhisper_tpu", f"-Wl,-rpath,{BUILD}"],
            check=True)

    samples, _ = load_audio(str(JFK))
    pcm = BUILD / "jfk_full.pcm.f32"
    samples.astype("<f4").tofile(pcm)

    # Python-path transcript for the equality gate
    from whisper_tpu.models.parakeet.context import ParakeetContext

    ctx = ParakeetContext.from_file(str(PARAKEET_MODEL))
    assert ctx.full(samples) == 0
    py_text = ctx.full_text()
    assert py_text

    env = dict(os.environ, PYTHONPATH=str(REPO), JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [str(exe), str(PARAKEET_MODEL), str(pcm)],
        capture_output=True, text=True, timeout=900, env=env)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PARAKEET-ABI-OK" in proc.stdout, proc.stdout
    c_text = [ln for ln in proc.stdout.splitlines()
              if ln.startswith("TEXT=")][0][len("TEXT="):]
    assert c_text == py_text  # C ABI == Python path, token for token
    assert "run B: veto rc=-6" in proc.stdout
    assert "run C: abort rc=-6" in proc.stdout
    assert "run D: state text match=1" in proc.stdout


def test_capi_parakeet_python_surface():
    """Python half of the parakeet handle API (capi_parakeet.py),
    independent of the C build."""
    if not PARAKEET_MODEL.exists():
        pytest.skip("parakeet test model not available")
    import struct as _struct

    from whisper_tpu import capi

    h = capi.pk_init_from_file(str(PARAKEET_MODEL))
    assert h > 0
    assert capi.pk_init_from_file("/nonexistent.bin") == 0
    assert capi.pk_n_vocab(h) == 10
    assert capi.pk_model_n_mels(h) == 16
    assert capi.pk_token_blank(h) == 10

    t = np.arange(16000, dtype=np.float32) / 16000.0
    voice = (np.sin(2 * np.pi * 220 * t) * 0.3).astype(np.float32)
    assert capi.pk_full(h, 0, None, None, voice) == 0
    n = capi.pk_full_n_segments(h)
    for i in range(n):
        assert isinstance(capi.pk_full_get_segment_text(h, 0, i), str)
        for j in range(capi.pk_full_n_tokens(h, 0, i)):
            raw = capi.pk_full_get_token_data_packed(h, 0, i, j)
            assert len(raw) == 48
            vals = _struct.unpack("<4i2f2q?7x", raw)
            assert vals[0] == capi.pk_full_get_token_id(h, 0, i, j)
    # logits of the last decode: one full joint row per emitted token
    rows = capi.pk_n_logits_rows(h, 0)
    cols = capi.pk_n_logits_cols(h, 0)
    if rows:
        buf = np.frombuffer(capi.pk_get_logits_bytes(h, 0), "<f4")
        assert buf.shape == (rows * cols,)
        assert np.isfinite(buf).all()
    # set_mel with the wrong n_mel fails like the reference
    assert capi.pk_set_mel(h, 0, np.zeros(100 * 4, np.float32), 100, 4) == -1
    assert capi.pk_set_mel(
        h, 0, np.zeros(100 * 16, np.float32), 100, 16) == 0
    assert capi.pk_n_len(h) == 100
    assert capi.pk_encode(h, 0, 0) == 0
    # timings pack as 3 f32
    tms = _struct.unpack("<3f", capi.pk_get_timings_packed(h))
    assert all(v >= 0.0 for v in tms)
    # tokenizer + display transform
    toks = capi.pk_tokenize(h, "bee")
    assert toks and capi.pk_token_count(h, "bee") == len(toks)
    assert capi.pk_token_to_text("▁bee", True) == "bee"
    assert capi.pk_token_to_text("▁bee", False) == " bee"
    capi.pk_free(h)
    assert capi.pk_full_n_segments(h) == 0
