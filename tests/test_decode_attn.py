"""Fused decode self-attention kernel (ops/decode_attn.py) numerics.

The Pallas kernel must reproduce decode_step's XLA q8 attention formula
exactly (same int8 codes, same scale factoring, f32 softmax).  Runs in
interpret mode on CPU; on TPU the same code compiles for real.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_tpu.models.whisper import model as M
from whisper_tpu.models.whisper.hparams import WhisperHParams
from whisper_tpu.ops.decode_attn import self_attend_q8
from whisper_tpu.utils.synth import synth_params

HP = WhisperHParams(n_vocab=128, n_audio_ctx=16, n_audio_state=32,
                    n_audio_head=4, n_audio_layer=2, n_text_ctx=64,
                    n_text_state=32, n_text_head=4, n_text_layer=2,
                    n_mels=80)


def _xla_ref(kv, sc, qh, mask, l, A, dtype):
    kv_l, s_l = kv[l], sc[l]
    kh = kv_l[:, :, 0, :A].astype(dtype)
    vh = kv_l[:, :, 1, :A].astype(dtype)
    d = qh.shape[-1]
    scores = jnp.matmul(qh.astype(dtype), jnp.swapaxes(kh, -1, -2),
                        preferred_element_type=jnp.float32)
    scores = (scores * s_l[:, None, None, 0, :A]
              / jnp.sqrt(jnp.float32(d)) + mask[:, None])
    probs = jax.nn.softmax(scores, axis=-1)
    probs = probs * s_l[:, None, None, 1, :A]
    return jnp.matmul(probs.astype(dtype), vh,
                      preferred_element_type=jnp.float32)


@pytest.mark.parametrize("A", [32, 64])
@pytest.mark.parametrize("G", [1, 3])
def test_kernel_matches_xla_formula(A, G):
    L, B, H, C, d = 3, 4, 2, 64, 16
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    kv = jax.random.randint(k1, (L, B, H, 2, C, d), -127, 127, jnp.int8)
    sc = jnp.abs(jax.random.normal(k2, (L, B, 2, C))) * 0.05
    qh = jax.random.normal(k3, (B, H, G, d), jnp.float32)
    # causal-ish mask with some fully-visible and some partial rows
    occ = 10
    j = jnp.arange(A)[None, None, :]
    i = jnp.arange(G)[None, :, None]
    mask = jnp.where(j < occ + i + 1, 0.0, -jnp.inf).astype(jnp.float32)
    mask = jnp.broadcast_to(mask, (B, G, A))
    for l in range(L):
        got = np.asarray(self_attend_q8(kv, sc, qh, mask, l=l, attn_ctx=A,
                                        dtype=jnp.float32))
        ref = np.asarray(_xla_ref(kv, sc, qh.astype(jnp.float32), mask, l,
                                  A, jnp.float32))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_decode_step_wiring_kernel_vs_xla():
    """decode_step with WTPU_DECODE_ATTN=pallas (interpret) must equal the
    XLA path bit-for-bit on a mini model with a q8 cache."""
    params = synth_params(HP, jnp.float32)
    B, G = 2, 1
    key = jax.random.PRNGKey(1)
    d = HP.n_text_state // HP.n_text_head
    xk = jax.random.normal(key, (HP.n_text_layer, HP.n_text_head,
                                 HP.n_audio_ctx, d), jnp.float32)
    xv = xk * 0.5

    def run():
        cache = M.new_cache(HP, B, jnp.float32, itype="q8")
        toks = []
        tok = jnp.zeros((B, G), jnp.int32)
        for i in range(4):
            pos = jnp.full((B, G), i, jnp.int32)
            logits, cache = M.decode_step(params, tok, pos, jnp.int32(i),
                                          cache, xk, xv, HP,
                                          dtype=jnp.float32)
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            toks.append(np.asarray(logits))
        return toks

    old = os.environ.get("WTPU_DECODE_ATTN")
    try:
        os.environ["WTPU_DECODE_ATTN"] = "xla"
        ref = run()
        os.environ["WTPU_DECODE_ATTN"] = "pallas"
        got = run()
    finally:
        if old is None:
            os.environ.pop("WTPU_DECODE_ATTN", None)
        else:
            os.environ["WTPU_DECODE_ATTN"] = old
    for a, b in zip(ref, got):
        np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-6)
