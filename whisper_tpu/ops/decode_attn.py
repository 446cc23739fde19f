"""Fused decode-step self-attention over the int8 KV cache (Pallas TPU).

Why this kernel exists: the decode step's XLA self-attention path slices
layer `l` from the stacked cache and upcasts the int8 codes to bf16 for
the two attention matmuls.  Inside the real serving graph XLA
materializes that bf16 expansion to HBM (the same pathology measured for
packed weights, docs/PERF.md), so the per-step self-attention stream
costs ~3x its int8 byte floor — ~5.3 ms of the 10.1 ms W=16 large-v3
step reading what should be 0.7 ms of cache bytes
(tools/perf_serving.py ctx112 ablation).

This kernel fuses QK^T -> scale -> mask -> softmax -> PV per (row, head)
grid instance, reading the (2, A, d) int8 cache block straight into VMEM
(57 KB, fully contiguous in HBM) and never writing any dequantized form
back.  The per-position scales factor out of both matmuls exactly
(scores = (q @ codes^T) * scale_j, out = (probs * scale_j) @ codes), so
the result is bit-comparable to the XLA path — tests/test_decode_attn.py
asserts equality on CPU via interpret mode.

The layer index is a Python int (the decode layer loop is unrolled:
packed weights already require that, model.py) closed over by the
BlockSpec index maps, so the whole stacked (L, B, H, 2, C, d) cache is
passed every call and only layer l's blocks are ever DMA'd.  The static
context bound A (decode_step_bucketed's bucket) slices the leading A
cache cells per block — the grid never touches cells past the bucket.

Reference role: ggml's flash-decoding path fuses the same chain on CUDA
(ggml/src/ggml-cuda/fattn*.cu); this is the TPU-native equivalent shaped
by VMEM blocking instead of warp tiling.

TP note: GSPMD cannot partition a custom call, so a head-sharded q8
cache (parallel/sharding.kv_cache_spec) reaching this kernel under pjit
would be all-gathered.  Today no TP path uses a q8 cache (the TP
harnesses run dense f16 caches, and single-chip serving is the
production layout); if one is added, either wrap this call in
shard_map over the head axis (the grid/blocks are already head-local)
or set WTPU_DECODE_ATTN=xla for that path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def use_kernel() -> bool:
    """Route decode_step's q8 self-attention through this kernel?

    Default: only on real TPU (interpret mode would crawl on CPU).
    WTPU_DECODE_ATTN=pallas forces it anywhere (tests exercise the
    decode_step wiring via interpret mode); =xla disables it.
    """
    import os

    mode = os.environ.get("WTPU_DECODE_ATTN", "auto")
    if mode == "pallas":
        return True
    if mode == "xla":
        return False
    return jax.default_backend() == "tpu"


def _kernel(kv_ref, sc_ref, q_ref, m_ref, o_ref, *, dtype):
    k = kv_ref[0, 0, :, 0]                    # (H, A, d) int8
    v = kv_ref[0, 0, :, 1]                    # (H, A, d) int8
    q = q_ref[0]                              # (H, G, d) bf16
    sk = sc_ref[0, 0, 0]                      # (A,) f32
    sv = sc_ref[0, 0, 1]                      # (A,) f32
    m = m_ref[0]                              # (G, A) f32 additive
    d = q.shape[-1]
    scores = jax.lax.dot_general(
        q.astype(dtype), k.astype(dtype),
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)   # (H, G, A)
    scores = scores * sk[None, None, :] * (1.0 / math.sqrt(d)) + m[None]
    # exact masked softmax in f32 (mask guarantees >=1 visible cell/row)
    mx = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - mx)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    p = (p * sv[None, None, :]).astype(dtype)
    o_ref[0] = jax.lax.dot_general(
        p, v.astype(dtype), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)   # (H, G, d)


@functools.partial(jax.jit, static_argnames=("l", "attn_ctx", "dtype"))
def self_attend_q8(kv: jax.Array, scale: jax.Array, qh: jax.Array,
                   mask: jax.Array, *, l: int, attn_ctx: int,
                   dtype=jnp.bfloat16) -> jax.Array:
    """Decode-step self-attention for layer `l` against the stacked int8
    cache.

    kv    (L, B, H, 2, C, d) int8   — KVCache8.kv (K at [..., 0, :, :])
    scale (L, B, 2, C) f32          — KVCache8.scale
    qh    (B, H, G, d)              — this step's queries
    mask  (B, G, A) f32             — additive (causal + any row mask),
                                      already truncated to A = attn_ctx
    Returns (B, H, G, d) f32.
    """
    L, B, H, two, C, d = kv.shape
    _, _, G, _ = qh.shape
    A = attn_ctx
    assert mask.shape == (B, G, A), (mask.shape, (B, G, A))

    # Grid over rows only: each instance DMAs its whole (H, 2, A, d) int8
    # cache block (~1.1 MB at large-v3) and computes every head with
    # H-batched dots.  A (B, H) grid measured ~0.5 us fixed cost per
    # instance — 320 instances/layer swamped the 23 us/layer byte floor.
    return pl.pallas_call(
        functools.partial(_kernel, dtype=dtype),
        out_shape=jax.ShapeDtypeStruct((B, H, G, d), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, 1, H, 2, A, d),
                             lambda b: (l, b, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 2, A), lambda b: (l, b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, H, G, d), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, G, A), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, H, G, d), lambda b: (b, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=_interpret(),
    )(kv, scale, qh.astype(dtype), mask)
