"""INT8 KV-cache tests (reference's quantized kv_self itype)."""

import pathlib

import numpy as np
import pytest

JFK = pathlib.Path("/root/reference/samples/jfk.wav")


def test_q8_cache_decode_close_to_dense(mini_model_path):
    import jax.numpy as jnp

    from whisper_tpu.models.whisper import model as M
    from whisper_tpu.runtime.context import WhisperContext

    ctx = WhisperContext.from_file(str(mini_model_path))
    hp = ctx.hp
    rng = np.random.default_rng(0)
    mel = np.zeros((hp.n_mels, 2 * hp.n_audio_ctx), np.float32)
    mel[:, :100] = rng.standard_normal((hp.n_mels, 100)) * 0.5
    ctx.set_mel(mel)
    ctx.encode_window(0)

    toks = np.asarray([[ctx.vocab.token_sot, ctx.vocab.token_not, 100, 200]],
                      np.int32)
    pos = np.arange(4, dtype=np.int32)[None]

    outs = {}
    for itype in ("f16", "q8"):
        cache = M.new_cache(hp, 1, jnp.float32, itype=itype)
        logits, cache2 = M.decode_step(
            ctx.params, jnp.asarray(toks), jnp.asarray(pos), jnp.int32(0),
            cache, ctx.xk, ctx.xv, hp, dtype=jnp.float32)
        outs[itype] = np.asarray(logits, np.float32)
        if itype == "q8":
            assert cache2.kv.dtype == np.int8
            assert cache2.scale.shape == (hp.n_text_layer, 1, 2,
                                          hp.n_text_ctx)

    rel = (np.abs(outs["q8"] - outs["f16"]).max()
           / (np.abs(outs["f16"]).max() + 1e-9))
    assert rel < 0.02, rel  # int8 rows round-trip within ~1%


def test_q8_cache_transcription(mini_model_path):
    """End-to-end greedy transcription with the q8 cache matches the dense
    cache on the mini model (well-separated logits)."""
    if not JFK.exists():
        pytest.skip("jfk.wav not available")
    from whisper_tpu.audio.io import load_audio
    from whisper_tpu.decoding.full import transcribe
    from whisper_tpu.decoding.params import TranscribeParams
    from whisper_tpu.runtime.context import WhisperContext

    samples, _ = load_audio(str(JFK))
    texts = {}
    for itype in ("f16", "q8"):
        ctx = WhisperContext.from_file(str(mini_model_path), kv_itype=itype)
        p = TranscribeParams(language="en", print_progress=False,
                             temperature_inc=0.0)
        segs = transcribe(ctx, p, samples[:16000 * 5])
        texts[itype] = "".join(s.text for s in segs)
    # random-weight logits can sit near ties; require high similarity
    import difflib

    sim = difflib.SequenceMatcher(None, texts["f16"], texts["q8"]).ratio()
    assert sim >= 0.8, texts


def test_q8_beam_reorder(mini_model_path):
    import jax.numpy as jnp

    from whisper_tpu.models.whisper import model as M
    from whisper_tpu.runtime.context import WhisperContext

    ctx = WhisperContext.from_file(str(mini_model_path))
    cache = M.KVCache8.zeros(ctx.hp, 3, jnp.float32)
    idx = jnp.asarray([2, 0, 1])
    re = cache.reorder(idx)
    assert re.kv.shape == cache.kv.shape
    assert re.scale.shape == cache.scale.shape


def test_q8_cross_kv_close_to_dense(mini_model_path):
    """XK8 int8 cross-KV: per-(head,position) scales factor out of both
    cross-attention matmuls, so decode logits stay within int8 rounding of
    the dense-cross path."""
    import jax.numpy as jnp

    from whisper_tpu.models.whisper import model as M
    from whisper_tpu.runtime.context import WhisperContext

    outs = {}
    for itype in ("f16", "q8"):
        ctx = WhisperContext.from_file(str(mini_model_path),
                                       cross_itype=itype)
        hp = ctx.hp
        rng = np.random.default_rng(0)
        mel = np.zeros((hp.n_mels, 2 * hp.n_audio_ctx), np.float32)
        mel[:, :100] = rng.standard_normal((hp.n_mels, 100)) * 0.5
        ctx.set_mel(mel)
        ctx.encode_window(0)
        if itype == "q8":
            assert isinstance(ctx.xk, M.XK8)
            assert ctx.xk.codes.dtype == np.int8
        toks = np.asarray([[ctx.vocab.token_sot, ctx.vocab.token_not]],
                          np.int32)
        pos = np.arange(2, dtype=np.int32)[None]
        cache = M.new_cache(hp, 1, jnp.float32)
        logits, _ = M.decode_step(
            ctx.params, jnp.asarray(toks), jnp.asarray(pos), jnp.int32(0),
            cache, ctx.xk, ctx.xv, hp, dtype=jnp.float32)
        outs[itype] = np.asarray(logits, np.float32)
    rel = (np.abs(outs["q8"] - outs["f16"]).max()
           / (np.abs(outs["f16"]).max() + 1e-9))
    assert rel < 0.02, rel


def test_q8_cross_kv_transcription(mini_model_path):
    """Full pipeline smoke with int8 cross-KV (+ parallel batched path,
    which exercises XK8 through the native window batcher)."""
    if not JFK.exists():
        pytest.skip("jfk.wav not available")
    from whisper_tpu.audio.io import load_audio
    from whisper_tpu.decoding.parallel import transcribe_parallel
    from whisper_tpu.decoding.params import TranscribeParams
    from whisper_tpu.runtime.context import WhisperContext

    samples, _ = load_audio(str(JFK))
    ctx = WhisperContext.from_file(str(mini_model_path), cross_itype="q8")
    params = TranscribeParams(language="en", print_progress=False,
                              temperature_inc=0.0)
    segs = transcribe_parallel(ctx, params, samples, 2, batched=True)
    assert isinstance(segs, list)
