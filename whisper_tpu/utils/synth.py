"""Synthetic on-device parameter pytrees for benchmarks and sharding dry-runs
(random weights at real model dims; no disk I/O)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.whisper.hparams import WhisperHParams


def synth_params(hp: WhisperHParams, dtype=jnp.bfloat16, seed: int = 0):
    """Build a whisper param pytree with random weights at `hp` dims.
    Matches the layout produced by models/whisper/load.py."""
    key = jax.random.PRNGKey(seed)
    counter = [0]

    def nxt():
        counter[0] += 1
        return jax.random.fold_in(key, counter[0])

    def w(*shape, std=0.02):
        return (jax.random.normal(nxt(), shape, jnp.float32) * std).astype(dtype)

    ns, nm, L = hp.n_audio_state, hp.n_mels, hp.n_audio_layer
    nt, Lt, V = hp.n_text_state, hp.n_text_layer, hp.n_vocab

    def blocks(n, layers, cross):
        b = {
            "attn_ln_w": jnp.ones((layers, n), dtype), "attn_ln_b": w(layers, n),
            "o_w": w(layers, n, n), "o_b": w(layers, n),
            "mlp_ln_w": jnp.ones((layers, n), dtype), "mlp_ln_b": w(layers, n),
            "mlp0_w": w(layers, n, 4 * n), "mlp0_b": w(layers, 4 * n),
            "mlp1_w": w(layers, 4 * n, n), "mlp1_b": w(layers, n),
        }
        # fused qkv for BOTH stacks (load.py concatenates q/k/v at load time)
        b.update({
            "qkv_w": w(layers, n, 3 * n), "qkv_b": w(layers, 3 * n),
        })
        if cross:
            b.update({
                "xattn_ln_w": jnp.ones((layers, n), dtype),
                "xattn_ln_b": w(layers, n),
                "xq_w": w(layers, n, n), "xq_b": w(layers, n),
                "xk_w": w(layers, n, n),
                "xv_w": w(layers, n, n), "xv_b": w(layers, n),
                "xo_w": w(layers, n, n), "xo_b": w(layers, n),
            })
        return b

    return {
        "enc": {
            "pos_embd": w(hp.n_audio_ctx, ns),
            "conv1_w": w(ns, nm, 3, std=0.1), "conv1_b": w(ns),
            "conv2_w": w(ns, ns, 3, std=0.1), "conv2_b": w(ns),
            "ln_post_w": jnp.ones((ns,), dtype), "ln_post_b": w(ns),
            "blocks": blocks(ns, L, cross=False),
        },
        "dec": {
            "pos_embd": w(hp.n_text_ctx, nt),
            "tok_embd": w(V, nt),
            "ln_w": jnp.ones((nt,), dtype), "ln_b": w(nt),
            "blocks": blocks(nt, Lt, cross=True),
        },
    }
