#!/usr/bin/env python
"""Experiment: padded-resident encoder.

Hypothesis: keeping the encoder residual stream at T=1536 (multiple of
the 512 flash block and the 8x128 MXU tile) for the whole 32-block stack
beats the current design, which runs matmuls at the odd M=1500 and
pads/slices 1500<->1536 inside flash_self_attention EVERY layer
(64 copies of the (20,1536,64) bf16 tensor per encode).

Measures (chain-timed, tunnel RTT cancels):
  a) one (1500,1280)x(1280,5120) matmul vs (1536,...) -- alignment cost
  b) one encoder block: current vs padded-resident
  c) full encode: current vs padded-resident
"""

from __future__ import annotations

import functools
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from whisper_tpu.models.whisper import hparams as H
from whisper_tpu.models.whisper import model as M
from whisper_tpu.utils.synth import synth_params

hp = H.LARGE_V3
DT = jnp.bfloat16
S = hp.n_audio_state
Hh = hp.n_audio_head
T = hp.n_audio_ctx          # 1500
TP = 1536


def _timed(fn, *args, reps=3):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def per_op_us(chain, k1, k2, args, reps=3):
    t1 = _timed(chain, jnp.int32(k1), *args, reps=reps)
    t2 = _timed(chain, jnp.int32(k2), *args, reps=reps)
    return max(0.0, (t2 - t1) / (k2 - k1)) * 1e6


def chain_of(fn):
    @jax.jit
    def chain(K, x, *rest):
        def body(i, c):
            y = fn(c, *rest)
            return c + (y.sum() * 1e-12).astype(c.dtype)
        return jax.lax.fori_loop(0, K, body, x).sum()
    return chain


def flash_1536(qh, kh, vh, seg):
    """Flash attention on already-padded (H,1536,D) bf16 inputs."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention)
    from whisper_tpu.ops.attention import _block_sizes

    out = flash_attention(
        qh[None], kh[None], vh[None],
        segment_ids=SegmentIds(q=seg, kv=seg), causal=False,
        sm_scale=1.0 / math.sqrt(qh.shape[-1]),
        block_sizes=_block_sizes(TP))
    return out[0]


def block_padded(x, blk, seg):
    """Encoder block on a (1536, S) f32 residual; pad rows are junk."""
    h = M.layer_norm(x, blk["attn_ln_w"], blk["attn_ln_b"], hp.eps)
    S = x.shape[-1]
    qkv = M._mm(h, blk["qkv_w"], DT) + blk["qkv_b"]
    qh, kh, vh = (M._split_heads(qkv[..., i * S:(i + 1) * S], Hh).astype(DT)
                  for i in range(3))
    out = flash_1536(qh, kh, vh, seg).astype(jnp.float32)
    x = x + M._mm(M._merge_heads(out), blk["o_w"], DT) + blk["o_b"]
    h = M.layer_norm(x, blk["mlp_ln_w"], blk["mlp_ln_b"], hp.eps)
    h = M._gelu(M._mm(h, blk["mlp0_w"], DT) + blk["mlp0_b"])
    return x + M._mm(h, blk["mlp1_w"], DT) + blk["mlp1_b"]


def encode_padded(params, mel):
    enc = params["enc"]
    x = M.conv_stem(enc, mel, DT)
    x = x + enc["pos_embd"][:T]
    x = jnp.pad(x, ((0, TP - T), (0, 0)))
    seg = jnp.where(jnp.arange(TP) < T, 1, 2).astype(jnp.int32)[None]

    def body(carry, blk):
        return block_padded(carry, blk, seg), None

    x, _ = M.scan_layers(body, x, enc["blocks"], True)
    x = x[:T]
    return M.layer_norm(x, enc["ln_post_w"], enc["ln_post_b"], hp.eps)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    params = synth_params(hp, DT)
    enc = params["enc"]
    blk = jax.tree.map(lambda a: a[0], enc["blocks"])
    mel = jax.random.normal(jax.random.PRNGKey(0),
                            (hp.n_mels, 2 * T), jnp.float32)

    # a) matmul alignment: M=1500 vs 1536
    w = jax.random.normal(jax.random.PRNGKey(3), (S, 4 * S), DT)
    for m in (1500, 1536):
        xm = jax.random.normal(jax.random.PRNGKey(4), (m, S), jnp.float32)
        us = per_op_us(chain_of(lambda c, w=w: M._mm(c, w, DT)), 4, 16, (xm, w))
        fl = 2 * m * S * 4 * S
        print(f"mlp0 matmul M={m}: {us:7.1f} us  {fl/us/1e6:6.1f} TFLOPS",
              flush=True)

    # b) one block each way
    x = jax.random.normal(jax.random.PRNGKey(1), (T, S), jnp.float32)
    xp = jnp.pad(x, ((0, TP - T), (0, 0)))
    seg = jnp.where(jnp.arange(TP) < T, 1, 2).astype(jnp.int32)[None]
    us_cur = per_op_us(chain_of(
        lambda c: M._encoder_block(c, blk, Hh, hp.eps, DT)), 4, 16, (x,))
    us_pad = per_op_us(chain_of(
        lambda c: block_padded(c, blk, seg)), 4, 16, (xp,))
    print(f"block current {us_cur:7.1f} us | padded {us_pad:7.1f} us "
          f"(x32 = {us_cur*32/1000:.2f} vs {us_pad*32/1000:.2f} ms)",
          flush=True)

    # c) full encode each way
    us_cur = per_op_us(chain_of(
        lambda m: M.encode(params, m, hp, dtype=DT)), 2, 6, (mel,))
    us_pad = per_op_us(chain_of(
        lambda m: encode_padded(params, m)), 2, 6, (mel,))
    print(f"encode current {us_cur/1000:7.2f} ms | padded {us_pad/1000:7.2f} ms",
          flush=True)

    # parity
    a = np.asarray(M.encode(params, mel, hp, dtype=DT))
    b = np.asarray(encode_padded(params, mel))
    d = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    print(f"max rel diff current vs padded: {d:.2e}", flush=True)


if __name__ == "__main__":
    main()
