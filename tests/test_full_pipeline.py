"""Structural tests of the full transcribe state machine."""

import numpy as np
import pytest

import whisper_tpu as wt


def test_header_only_pipeline(jfk_pcm):
    """The reference's ctest trick: a header-only model exercises the whole
    mel→decode-loop→seek machinery without weights (src/whisper.cpp:1947-1949,
    7428-7433)."""
    ctx = wt.WhisperContext.from_file(
        "/root/reference/models/for-tests-ggml-tiny.en.bin")
    p = wt.TranscribeParams.default()
    p.print_progress = False
    segs = wt.transcribe(ctx, p, jfk_pcm)
    assert segs == []  # empty model emits no segments but must not crash


def test_transcribe_first_window(mini_model_path, jfk_pcm):
    ctx = wt.WhisperContext.from_file(str(mini_model_path))
    p = wt.TranscribeParams.default()
    p.print_progress = False
    p.max_tokens = 12  # bound the token loop for CI speed
    segs = wt.transcribe(ctx, p, jfk_pcm[: 16000 * 4])
    # structural invariants
    last_t = 0
    for s in segs:
        assert s.t0 >= 0 and s.t1 >= s.t0
        assert s.t0 >= last_t - 1
        last_t = s.t0
        assert isinstance(s.text, str)
    assert ctx.timings.n_encode >= 1


def test_transcribe_too_short(mini_model_path):
    ctx = wt.WhisperContext.from_file(str(mini_model_path))
    p = wt.TranscribeParams.default()
    p.print_progress = False
    segs = wt.transcribe(ctx, p, np.zeros(800, np.float32))  # 50 ms
    assert segs == []


def test_detect_language_flag(mini_model_path, jfk_pcm):
    """tiny.en is not multilingual; auto-detect on it still runs the decode
    (reference would warn); here we exercise the detect_language early-return."""
    ctx = wt.WhisperContext.from_file(str(mini_model_path))
    p = wt.TranscribeParams.default()
    p.print_progress = False
    p.detect_language = True
    segs = wt.transcribe(ctx, p, jfk_pcm[: 16000 * 2])
    assert segs == []
    assert 0 <= ctx.lang_id <= 99


def test_device_loop_matches_host_loop(mini_model_path, jfk_pcm):
    """The on-device while_loop decoder (decoding/device_loop.py) must produce
    exactly the host reference loop's tokens at t=0 greedy."""
    pcm = jfk_pcm[: 16000 * 4]

    def run(force_host):
        ctx = wt.WhisperContext.from_file(str(mini_model_path))
        p = wt.TranscribeParams.default()
        p.print_progress = False
        p.temperature_inc = 0.0  # deterministic: no fallback ladder
        if force_host:
            p.logits_filter_callback = lambda toks, logits: None  # no-op
        segs = wt.transcribe(ctx, p, pcm)
        return [(s.t0, s.t1, tuple(t.id for t in s.tokens)) for s in segs]

    assert run(True) == run(False)


def test_abort_callback(mini_model_path, jfk_pcm):
    """abort_callback must end the transcription early (the reference checks
    it around every graph compute, src/whisper.cpp:2461,2983).  An
    immediately-aborting callback yields no segments; a never-aborting one
    leaves the output unchanged."""
    calls = []

    def run(abort_after):
        calls.clear()
        ctx = wt.WhisperContext.from_file(str(mini_model_path))
        p = wt.TranscribeParams.default()
        p.print_progress = False
        p.temperature_inc = 0.0

        def cb(_ctx):
            calls.append(1)
            return len(calls) > abort_after
        p.abort_callback = cb
        return wt.transcribe(ctx, p, jfk_pcm[: 16000 * 4])

    assert run(0) == []          # abort before the first window
    assert len(calls) >= 1       # and the callback was actually polled
    full = run(10**9)            # never aborts -> normal output
    assert len(calls) >= 2
    # unaffected by a non-firing callback
    ctx = wt.WhisperContext.from_file(str(mini_model_path))
    p = wt.TranscribeParams.default()
    p.print_progress = False
    p.temperature_inc = 0.0
    ref = wt.transcribe(ctx, p, jfk_pcm[: 16000 * 4])
    assert [(s.t0, s.t1, s.text) for s in full] == \
        [(s.t0, s.t1, s.text) for s in ref]
