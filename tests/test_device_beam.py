"""On-device beam search tests."""

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
    return samples[:16000 * 6]


def _beam_params(beam_size, **kw):
    from whisper_tpu.decoding.params import (SamplingStrategy,
                                             TranscribeParams)

    p = TranscribeParams.default(SamplingStrategy.BEAM_SEARCH)
    p.beam_search.beam_size = beam_size
    p.language = "en"
    p.print_progress = False
    p.temperature_inc = 0.0
    for k, v in kw.items():
        setattr(p, k, v)
    return p


def _greedy_params():
    from whisper_tpu.decoding.params import (SamplingStrategy,
                                             TranscribeParams)

    p = TranscribeParams.default(SamplingStrategy.GREEDY)
    p.greedy.best_of = 1
    p.language = "en"
    p.print_progress = False
    p.temperature_inc = 0.0
    return p


def test_beam1_matches_greedy(mini_model_path, jfk):
    """A 1-beam device beam search must equal greedy argmax exactly."""
    from whisper_tpu.decoding.full import transcribe
    from whisper_tpu.runtime.context import WhisperContext

    ctx = WhisperContext.from_file(str(mini_model_path))
    g = transcribe(ctx, _greedy_params(), jfk)
    ctx2 = WhisperContext.from_file(str(mini_model_path))
    b = transcribe(ctx2, _beam_params(1), jfk)
    assert [s.text for s in b] == [s.text for s in g]
    assert [(s.t0, s.t1) for s in b] == [(s.t0, s.t1) for s in g]


def test_beam_deterministic(mini_model_path, jfk):
    from whisper_tpu.decoding.full import transcribe
    from whisper_tpu.runtime.context import WhisperContext

    texts = []
    for _ in range(2):
        ctx = WhisperContext.from_file(str(mini_model_path))
        segs = transcribe(ctx, _beam_params(3), jfk)
        texts.append([(s.t0, s.t1, s.text) for s in segs])
    assert texts[0] == texts[1]


def test_beam_window_result_structure(mini_model_path):
    """Beams diverge (dedup works) and scores are coherent."""
    import jax.numpy as jnp

    from whisper_tpu.runtime.context import WhisperContext

    ctx = WhisperContext.from_file(str(mini_model_path))
    rng = np.random.default_rng(0)
    mel = np.zeros((ctx.hp.n_mels, 2 * ctx.hp.n_audio_ctx), np.float32)
    mel[:, :400] = rng.standard_normal((ctx.hp.n_mels, 400)) * 0.5
    ctx.set_mel(mel)
    ctx.encode_window(0)

    from whisper_tpu.decoding.params import TranscribeParams

    params = TranscribeParams(language="en")
    prompt = [ctx.vocab.token_sot]
    res = ctx.decode_window_device(prompt, 3, 0.0, 0, 3000, params,
                                   False, rng_seed=0, strategy="beam")
    n = int(res.n_tok.max())
    assert n > 0
    seqs = [tuple(res.tok_id[j, :int(res.n_tok[j])]) for j in range(3)]
    # after a couple of steps the dedup must have forced divergence
    if n >= 3:
        assert len(set(seqs)) > 1, seqs
    # cumulative logprobs are finite and sorted-ish (beam 0 best or equal)
    assert np.all(np.isfinite(res.sum_logprobs))
