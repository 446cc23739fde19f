"""DTW token-level timestamp tests (reference: src/whisper.cpp:8878-9165)."""

import pathlib

import numpy as np
import pytest

from whisper_tpu.decoding.dtw import (AHEADS_PRESETS, dtw_and_backtrace,
                                      median_filter_reflect, resolve_aheads)
from whisper_tpu.models.whisper.hparams import WhisperHParams

JFK = pathlib.Path("/root/reference/samples/jfk.wav")


def test_resolve_aheads_presets():
    hp = WhisperHParams(n_vocab=51864, n_audio_ctx=1500, n_audio_state=384,
                        n_audio_head=6, n_audio_layer=4, n_text_ctx=448,
                        n_text_state=384, n_text_head=6, n_text_layer=4,
                        n_mels=80)
    assert resolve_aheads(hp, "tiny.en") == list(AHEADS_PRESETS["tiny.en"])
    hp_large = WhisperHParams(
        n_vocab=51866, n_audio_ctx=1500, n_audio_state=1280, n_audio_head=20,
        n_audio_layer=32, n_text_ctx=448, n_text_state=1280, n_text_head=20,
        n_text_layer=32, n_mels=128)
    assert resolve_aheads(hp_large, "large-v3") == list(AHEADS_PRESETS["large-v3"])
    # preset heads out of range for a small model are rejected
    with pytest.raises(ValueError):
        resolve_aheads(hp, "large-v3")
    # N_TOP_MOST: all heads of the top n layers (src/whisper.cpp:1173-1177)
    top = resolve_aheads(hp, n_top_most=2)
    assert top == [(l, h) for l in (2, 3) for h in range(6)]
    with pytest.raises(ValueError):
        resolve_aheads(hp, "nonexistent-model")


def test_median_filter_reflect():
    x = np.array([[1.0, 5.0, 2.0, 8.0, 3.0]], np.float32)
    got = median_filter_reflect(x, 3)
    # reflect padding: [5,1,5,2,8,3,8] windows of 3
    expect = np.array([[5.0, 2.0, 5.0, 3.0, 8.0]], np.float32)
    np.testing.assert_array_equal(got, expect)


def test_dtw_diagonal():
    """A cost matrix cheap on the diagonal aligns diagonally."""
    N = 5
    x = np.full((N, N), 10.0, np.float32)
    np.fill_diagonal(x, 0.0)
    r = dtw_and_backtrace(x)
    assert r.shape == (2, N)
    np.testing.assert_array_equal(r[0], np.arange(N))
    np.testing.assert_array_equal(r[1], np.arange(N))


def test_dtw_monotonic_nonsquare():
    rng = np.random.default_rng(0)
    x = rng.random((4, 9)).astype(np.float32)
    r = dtw_and_backtrace(x)
    # path covers corners and is monotone non-decreasing in both axes
    assert (r[0][0], r[1][0]) == (0, 0)
    assert (r[0][-1], r[1][-1]) == (3, 8)
    assert np.all(np.diff(r[0]) >= 0) and np.all(np.diff(r[1]) >= 0)
    # every step advances at least one axis by exactly one
    steps = np.diff(r[0]) + np.diff(r[1])
    assert np.all(steps >= 1) and np.all(np.diff(r[0]) <= 1)


def test_dtw_end_to_end(mini_model_path):
    """Transcribe with DTW enabled; t_dtw must be set, in-range and
    non-decreasing over text tokens."""
    if not JFK.exists():
        pytest.skip("jfk.wav not available")
    from whisper_tpu.audio.io import load_audio
    from whisper_tpu.decoding.full import transcribe
    from whisper_tpu.decoding.params import TranscribeParams
    from whisper_tpu.runtime.context import WhisperContext

    ctx = WhisperContext.from_file(str(mini_model_path))
    # mini model has non-standard dims -> N_TOP_MOST (the reference's
    # WHISPER_AHEADS_N_TOP_MOST path) instead of a named preset
    ctx.enable_dtw(n_top_most=1)
    assert ctx.dtw_aheads == [(1, 0), (1, 1)]

    samples, _ = load_audio(str(JFK))
    params = TranscribeParams(language="en", print_progress=False,
                              temperature_inc=0.0)
    segments = transcribe(ctx, params, samples)
    stamped = [t.t_dtw for s in segments for t in s.tokens
               if t.id < ctx.vocab.token_eot and t.t_dtw >= 0]
    assert stamped, "no DTW timestamps were assigned"
    assert all(t <= 3000 for t in stamped)  # within 30 s window (10 ms ticks)
    assert all(b >= a for a, b in zip(stamped, stamped[1:]))
