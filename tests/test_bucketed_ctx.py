"""Bucketed self-attention context (model.decode_step_bucketed).

The bucketed step must be numerically identical to the full-context
step: cache cells at or beyond the occupancy are -inf masked, so
slicing them away changes nothing but the work done.  Covered here
across bucket boundaries for both cache itypes and both sampling
layouts (single row, multi-row window batch with left-pad masks).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_tpu.models.whisper import model as M
from whisper_tpu.models.whisper.hparams import WhisperHParams
from whisper_tpu.utils.synth import synth_params

HP = WhisperHParams(n_vocab=128, n_audio_ctx=16, n_audio_state=32,
                    n_audio_head=4, n_audio_layer=2, n_text_ctx=64,
                    n_text_state=32, n_text_head=4, n_text_layer=2,
                    n_mels=80)


def test_attn_ctx_buckets_shapes():
    assert M.attn_ctx_buckets(448) == (128, 256, 384, 448)
    assert M.attn_ctx_buckets(64) == (16, 32, 48, 64)
    # single bucket degenerates to the plain step
    assert M.attn_ctx_buckets(448, n_buckets=1) == (448,)


@pytest.mark.parametrize("itype", ["f16", "q8"])
def test_bucketed_equals_full(itype):
    params = synth_params(HP, jnp.float32)
    key = jax.random.PRNGKey(0)
    d = HP.n_text_state // HP.n_text_head
    xk = jax.random.normal(key, (HP.n_text_layer, HP.n_text_head,
                                 HP.n_audio_ctx, d), jnp.float32)
    xv = xk * 0.3

    def run(step_fn):
        cache = M.new_cache(HP, 1, jnp.float32, itype=itype)
        tok = jnp.zeros((1, 1), jnp.int32)
        outs = []
        # cross every bucket boundary of the 64-cell cache (16/32/48/64)
        for i in range(50):
            pos = jnp.full((1, 1), i, jnp.int32)
            logits, cache = step_fn(params, tok, pos, jnp.int32(i), cache,
                                    xk, xv, HP, dtype=jnp.float32)
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            outs.append(np.asarray(logits[:, 0]))
        return np.stack(outs)

    full = run(jax.jit(M.decode_step, static_argnums=(7,),
                       static_argnames=("dtype",)))
    bucketed = run(jax.jit(M.decode_step_bucketed, static_argnums=(7,),
                           static_argnames=("dtype",)))
    np.testing.assert_allclose(bucketed, full, rtol=2e-5, atol=2e-5)
    assert (bucketed.argmax(-1) == full.argmax(-1)).all()


def test_bucketed_window_batch_with_pad_mask():
    """Native window batching path: multi-row step, left-pad attn_mask,
    grouped cross-KV — bucketed must match full at every step."""
    W, G = 3, 2
    R = W * G
    params = synth_params(HP, jnp.float32)
    key = jax.random.PRNGKey(1)
    d = HP.n_text_state // HP.n_text_head
    xk = jax.random.normal(key, (HP.n_text_layer, W, HP.n_text_head,
                                 HP.n_audio_ctx, d), jnp.float32)
    xv = xk * 0.5

    # rows carry different left-pad shifts, as decode_windows_native builds
    shift = np.array([0, 0, 3, 3, 7, 7], np.int32)
    cells = np.arange(HP.n_text_ctx)
    attn_mask = jnp.asarray(
        np.where(cells[None, :] < shift[:, None], -np.inf,
                 0.0)[:, None, None, :].astype(np.float32))

    def run(step_fn):
        cache = M.new_cache(HP, R, jnp.float32, itype="q8")
        tok = jnp.zeros((R, 1), jnp.int32)
        outs = []
        for i in range(40):
            pos = jnp.clip(8 - shift[:, None] + i, 0, HP.n_text_ctx - 1)
            logits, cache = step_fn(
                params, tok, jnp.asarray(pos), jnp.int32(8 + i), cache,
                xk, xv, HP, dtype=jnp.float32, attn_mask=attn_mask,
                xkv_group=G)
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            outs.append(np.asarray(logits[:, 0]))
        return np.stack(outs)

    full = run(jax.jit(M.decode_step, static_argnums=(7,),
                       static_argnames=("dtype", "xkv_group")))
    bucketed = run(jax.jit(M.decode_step_bucketed, static_argnums=(7,),
                           static_argnames=("dtype", "xkv_group")))
    np.testing.assert_allclose(bucketed, full, rtol=2e-5, atol=2e-5)
    assert (bucketed.argmax(-1) == full.argmax(-1)).all()
