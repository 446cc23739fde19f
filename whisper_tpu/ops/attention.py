"""Flash attention wrapper for the whisper encoder (Pallas TPU kernel).

XLA's attention at T=1500 materializes the (H, T, T) score matrix in HBM
(~180 MB f32 per large-v3 layer), costing ~0.6 ms/layer on v5e; the Pallas
flash kernel streams K/V blocks through VMEM and runs ~3x faster with block
sizes tuned for whisper's sequence lengths (block_q=256, block_k=padded T).
Sequence lengths pad to a 512 multiple with segment-id masking (exact — the
padded keys live in a different segment), so no dense bias is materialized.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp


def _round_up(a: int, b: int) -> int:
    return -(-a // b) * b


@lru_cache(maxsize=None)
def _block_sizes(tp: int):
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

    # square (768, 768) tiling: best of a 20-config long-chain sweep at
    # whisper's T=1536/D=64 (tools/perf_flash_sweep.py, 96-iter chains,
    # 137.5 us vs 176.2 for the previous (768, 512) — 88 TFLOPS; the
    # kernel is softmax/VPU-bound past that, not MXU-bound).  The kernel
    # requires block sizes that divide the padded length, so fall back to
    # the largest of 768/512/256 that does (tp=1024 -> 512, etc.).
    def pick(cap):
        for b in (768, 512, 256):
            if b <= cap and tp % b == 0:
                return b
        return min(cap, tp)

    bq = pick(min(768, tp))
    bk = pick(min(768, tp))
    return BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
        block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq)


def flash_self_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                         true_len: int | None = None) -> jax.Array:
    """Full (non-causal) self-attention, (H, T, D) -> (H, T, D) f32.

    Equivalent to softmax(q k^T / sqrt(D)) v with exact masking of the
    length padding.  Only valid on TPU.

    `true_len`: when the caller keeps a padded-resident stream (rows
    true_len..T are junk that must not mix with real rows — the encoder
    pads T to a 512 multiple ONCE for the whole block stack so every
    matmul runs at an MXU-aligned M), pass the real length; rows past it
    go to a separate attention segment and no pad/slice copy happens here.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention)

    H, T, D = q.shape
    tp = _round_up(max(T, 512), 512)
    pad = tp - T
    n_real = T if true_len is None else true_len

    def p(x):
        x = x.astype(jnp.bfloat16)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        return x[None]

    seg = jnp.where(jnp.arange(tp) < n_real, 1, 2).astype(jnp.int32)[None]
    out = flash_attention(
        p(q), p(k), p(v), segment_ids=SegmentIds(q=seg, kv=seg),
        causal=False, sm_scale=1.0 / math.sqrt(D),
        block_sizes=_block_sizes(tp))
    out = out[0]
    if pad:
        out = out[:, :T, :]
    return out.astype(jnp.float32)


_flash_enabled = True  # CLI -nfa / whisper-cli's --no-flash-attn analogue


def set_flash_enabled(enable: bool) -> None:
    """Global kill-switch for the flash kernels (whisper-cli -nfa).  The
    non-flash graphs are the ones `precision=\"ggml_cpu_f16\"` emulates, so
    this also gives a CLI path onto the reference's -nfa numerics."""
    global _flash_enabled
    _flash_enabled = bool(enable)


def use_flash(t: int, dtype=jnp.bfloat16) -> bool:
    """Flash pays off when the score matrix is the bottleneck.

    The kernel computes in bf16, so it is only selected when the requested
    compute dtype is bf16 — encode(dtype=float32) (the bit-accuracy mode)
    must keep the exact XLA path."""
    return (_flash_enabled and jax.default_backend() == "tpu" and t >= 256
            and dtype == jnp.bfloat16)
