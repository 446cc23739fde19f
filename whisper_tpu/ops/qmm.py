"""Fused dequantize x matmul Pallas TPU kernel.

Replaces ggml's quantized `vec_dot` kernels (ggml/src/ggml-cpu/quants.c,
ggml-cuda mmq) with a TPU-native path: block-quantized weights live in HBM
as struct-of-arrays planes — int8 codes [R, K] + f32 per-32-block scales
[R, K/32] (formats/quants.py QTensor) — and are dequantized in VMEM tiles
right before hitting the MXU.  HBM weight traffic is 1.125 B/elem instead of
bf16's 2 B/elem, which is the whole game for the bandwidth-bound decode
matmuls (batch of a few tokens x large weight matrices).

y = x @ W^T with W = codes * expand(scales):
  x:      (T, K)   activation (any float dtype)
  codes:  (R, K)   int8, centered codes (zero-point-free formats
                   Q4_0/Q5_0/Q8_0; affine formats take the dense path)
  scales: (R, K/QK) f32
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QK = 32  # block size of the *_0 formats (ggml-common.h:180)


class QWeight(NamedTuple):
    """Packed quantized weight living on device; logical shape (R, K)."""

    codes: jax.Array   # (R, K) int8
    scales: jax.Array  # (R, K // QK) f32

    @property
    def shape(self) -> Tuple[int, int]:
        return self.codes.shape

    @property
    def ndim(self) -> int:
        return self.codes.ndim


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


def _qmm_kernel(x_ref, codes_ref, scales_ref, out_ref, *, dtype):
    """One (BT, BR) output tile over the full K extent.

    x_ref:      (BT, K)
    codes_ref:  (BR, K) int8
    scales_ref: (BR, K // QK) f32
    out_ref:    (BT, BR)

    Per-block scales must expand elementwise along K, but Mosaic cannot
    shape-cast the lane dim ((nb, qk) -> nb*qk).  Expand on the MXU instead:
    scales_full = scales @ E with E[b, k] = [k // qk == b], in the compute
    dtype (an f32 expansion matmul would dominate the kernel; bf16
    weight-side rounding is far below the quantization error).  The extra
    MXU FLOPs are free — this kernel is HBM-bandwidth-bound.

    The block grain qk is derived from the shapes (32 for the *_0 formats,
    16 for NVFP4 sub-blocks).
    """
    K = codes_ref.shape[1]
    nb = scales_ref.shape[1]
    qk = K // nb
    blk_of_k = jax.lax.broadcasted_iota(jnp.int32, (nb, K), 1) // qk
    b_ids = jax.lax.broadcasted_iota(jnp.int32, (nb, K), 0)
    expand = jnp.where(blk_of_k == b_ids, 1.0, 0.0).astype(dtype)

    scales_full = jnp.dot(scales_ref[:].astype(dtype), expand,
                          preferred_element_type=jnp.float32).astype(dtype)
    w = codes_ref[:].astype(dtype) * scales_full  # (BR, K)
    out_ref[:] = jax.lax.dot_general(
        x_ref[:].astype(dtype), w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("block_t", "block_r", "dtype",
                                    "interpret"))
def qmm(x: jax.Array, codes: jax.Array, scales: jax.Array,
        block_t: int = 256, block_r: int = 512,
        dtype=jnp.bfloat16, interpret: bool = False) -> jax.Array:
    """y[T, R] = x[T, K] @ dequant(codes, scales)[R, K]^T.

    Shapes need not be tile-aligned; inputs are padded here (zero rows/cols
    contribute zeros) and the output is sliced back.
    """
    T, K = x.shape
    R, Kc = codes.shape
    nb = scales.shape[1]
    assert K == Kc and nb > 0 and K % nb == 0, (x.shape, codes.shape,
                                               scales.shape)

    block_t = min(block_t, _round_up(T, 8))

    # keep the per-tile VMEM footprint under ~12 MB: x tile + codes +
    # dequantized weights + expanded scales + expansion matrix + out tile
    def vmem(bt, br):
        return (bt * K * 4 + br * K * 5 + nb * K * 2 + bt * br * 4)

    while block_r > 128 and vmem(block_t, block_r) > 12 * 2**20:
        block_r //= 2
    while block_t > 8 and vmem(block_t, block_r) > 12 * 2**20:
        block_t //= 2

    Tp, Rp = _round_up(T, block_t), _round_up(R, block_r)
    if Tp != T:
        x = jnp.pad(x, ((0, Tp - T), (0, 0)))
    if Rp != R:
        codes = jnp.pad(codes, ((0, Rp - R), (0, 0)))
        scales = jnp.pad(scales, ((0, Rp - R), (0, 0)))

    grid = (Tp // block_t, Rp // block_r)
    out = pl.pallas_call(
        functools.partial(_qmm_kernel, dtype=dtype),
        out_shape=jax.ShapeDtypeStruct((Tp, Rp), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_t, K), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_r, K), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_r, nb), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_t, block_r), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Tp * Rp * K,
            bytes_accessed=Rp * K + Rp * nb * 4 + Tp * K * 2 + Tp * Rp * 4,
            transcendentals=0),
        interpret=interpret,
    )(x, codes, scales)
    return out[:T, :R]


def embed_lookup(qw: QWeight, tokens: jax.Array,
                 dtype=jnp.float32) -> jax.Array:
    """Embedding-row gather + dequant for a packed token-embedding matrix
    (replaces `tok_embd[tokens]`).  Plain XLA ops — the gathered rows are a
    few tokens, dequant cost is negligible."""
    rows = qw.codes[tokens].astype(jnp.float32)          # (..., K)
    s = qw.scales[tokens]                                # (..., K // qk)
    qk = qw.codes.shape[-1] // qw.scales.shape[-1]
    s_full = jnp.repeat(s, qk, axis=-1)
    return (rows * s_full).astype(dtype)


def qmm_auto(x: jax.Array, qw: QWeight, dtype=jnp.bfloat16) -> jax.Array:
    """x @ dequant(qw)^T for arbitrary leading dims of x; auto-selects
    interpreter mode off-TPU (Pallas TPU kernels only compile on TPU)."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    interp = jax.default_backend() != "tpu"
    if interp:
        # off-TPU (tests): dense matmul against the expanded weight is far
        # faster than the Pallas interpreter and numerically equivalent
        y = jnp.matmul(x2.astype(dtype), dequantize_qweight(qw, dtype).T,
                       preferred_element_type=jnp.float32)
    else:
        y = qmm(x2, qw.codes, qw.scales, dtype=dtype)
    return y.reshape(*lead, y.shape[-1])


def dequantize_qweight(qw: QWeight, dtype=jnp.float32) -> jax.Array:
    """Dense fallback: expand to (R, K)."""
    qk = qw.codes.shape[-1] // qw.scales.shape[-1]
    scales = jnp.repeat(qw.scales, qk, axis=1)
    return (qw.codes.astype(jnp.float32) * scales).astype(dtype)


def from_qtensor(qt, device=None) -> QWeight:
    """Build a device QWeight from formats.quants.QTensor (symmetric formats
    only — affine formats carry `mins` and must use the dense path)."""
    if qt.mins is not None:
        raise ValueError("affine quant formats use the dense path")
    return QWeight(jnp.asarray(qt.codes, jnp.int8),
                   jnp.asarray(qt.scales, jnp.float32))
