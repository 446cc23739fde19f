"""Continuous-batching (lockstep parallel transcription) tests."""

import pathlib

import numpy as np
import pytest

JFK = pathlib.Path("/root/reference/samples/jfk.wav")


@pytest.fixture(scope="module")
def jfk(mini_model_path):
    if not JFK.exists():
        pytest.skip("jfk.wav not available")
    from whisper_tpu.audio.io import load_audio

    samples, _ = load_audio(str(JFK))
    return samples


def _params():
    from whisper_tpu.decoding.params import TranscribeParams

    return TranscribeParams(language="en", print_progress=False,
                            temperature_inc=0.0)


def test_batched_matches_sequential(mini_model_path, jfk):
    from whisper_tpu.decoding.parallel import transcribe_parallel
    from whisper_tpu.runtime.context import WhisperContext

    ctx = WhisperContext.from_file(str(mini_model_path))
    seq = transcribe_parallel(ctx, _params(), jfk, 2, batched=False)

    ctx2 = WhisperContext.from_file(str(mini_model_path))
    bat = transcribe_parallel(ctx2, _params(), jfk, 2, batched=True)

    assert [s.text for s in bat] == [s.text for s in seq]
    assert [(s.t0, s.t1) for s in bat] == [(s.t0, s.t1) for s in seq]


def test_batched_three_chunks(mini_model_path, jfk):
    from whisper_tpu.decoding.parallel import transcribe_parallel
    from whisper_tpu.runtime.context import WhisperContext

    ctx = WhisperContext.from_file(str(mini_model_path))
    segs = transcribe_parallel(ctx, _params(), jfk, 3, batched=True)
    # timestamps monotone after merge clamp
    ts = [(s.t0, s.t1) for s in segs]
    assert all(b[0] >= a[0] for a, b in zip(ts, ts[1:]))


def test_batched_falls_back_for_beam(mini_model_path, jfk):
    """Beam search isn't device-loop eligible; parallel must route to the
    sequential path without error."""
    from whisper_tpu.decoding.params import (SamplingStrategy,
                                             TranscribeParams)
    from whisper_tpu.decoding.parallel import transcribe_parallel
    from whisper_tpu.runtime.context import WhisperContext

    ctx = WhisperContext.from_file(str(mini_model_path))
    p = TranscribeParams.default(SamplingStrategy.BEAM_SEARCH)
    p.language = "en"
    p.print_progress = False
    p.temperature_inc = 0.0
    p.beam_search.beam_size = 2
    segs = transcribe_parallel(ctx, p, jfk[:16000 * 6], 2)
    assert isinstance(segs, list)
