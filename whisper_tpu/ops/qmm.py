"""Fused dequantize x matmul Pallas TPU kernel.

Replaces ggml's quantized `vec_dot` kernels (ggml/src/ggml-cpu/quants.c,
ggml-cuda mmq) with a TPU-native path: block-quantized weights live in HBM
as struct-of-arrays planes — int8 codes [R, K] + f32 per-32-block scales
[R, K/32] (formats/quants.py QTensor) — and are dequantized in VMEM tiles
right before hitting the MXU.  HBM weight traffic is 1.125 B/elem instead of
bf16's 2 B/elem, which is the whole game for the bandwidth-bound decode
matmuls (batch of a few tokens x large weight matrices).

y = x @ W^T with W = codes * expand(scales) [+ expand(mins)]:
  x:      (T, K)   activation (any float dtype)
  codes:  (R, K)   int8 codes (centered for the zero-point-free formats
                   Q4_0/Q5_0/Q8_0; raw unsigned for affine formats)
  scales: (R, K/QK) f32
  mins:   (R, K/QK) f32 per-block offsets (affine q4_1/q5_1 + K-quants);
                   the streaming kernels factor the offset out of the dot
                   as sum(x_blk) * min per block
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
    """Packed quantized weight living on device; logical shape (R, K).

    `mins` (same shape as scales) carries the per-block offset of AFFINE
    formats (q4_1/q5_1 and the K-quants' d*sc / -dmin*m decomposition,
    formats/quants.py unpack_to_planes): dequant = codes*scale (+ min).
    None for the symmetric *_0/IQ/MXFP4 formats."""

    codes: jax.Array   # (R, K) int8
    scales: jax.Array  # (R, K // QK) f32
    mins: Optional[jax.Array] = None   # (R, K // QK) f32 | None

    @property
    def shape(self) -> Tuple[int, int]:
        return self.codes.shape

    @property
    def ndim(self) -> int:
        return self.codes.ndim


class QWeightT(NamedTuple):
    """Transposed packed planes — the layout the Pallas streaming kernel
    wants for the LARGE matmuls (the logits head): codes stored (K, R) so a
    VMEM tile DMA is contiguous along the output-column lane dim and the dot
    is x[T,K] @ codes[K,BR] with no in-kernel transpose."""

    codes_t: jax.Array   # (K, R) int8
    scales_t: jax.Array  # (K // qk, R) f32
    mins_t: Optional[jax.Array] = None  # (K // qk, R) f32 | None (affine)

    @property
    def shape(self) -> Tuple[int, int]:
        # logical (R, K), matching QWeight's convention
        return (self.codes_t.shape[1], self.codes_t.shape[0])


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


def _qmmt_kernel(*refs, dtype, has_mins):
    """One (T, BR) output tile, streaming codes per 32-block.

    x_ref:      (T, K)
    codes_ref:  (K, BR) int8
    scales_ref: (nb, BR) f32
    mins_ref:   (nb, BR) f32 (affine formats only)
    out_ref:    (T, BR) f32

    int8 codes convert to `dtype` one block at a time and each block's
    partial product is scaled in f32 AFTER its dot — exact per-block
    dequantization with no (K, BR) bf16 weight materialization in VMEM, so
    tiles can be ~4x larger than the expand-first kernel and the grid loop
    stays DMA-bound (measured: the MXU scale-expansion matmul of the v1
    kernel cost +12us/tile; this per-block form costs ~+1us against the
    scale-free convert+dot floor — tools/perf_ablate.py).

    Affine formats factor the per-block offset OUT of the dot:
    x @ (q*s + m*1)^T per block == (x_blk @ q)*s + sum(x_blk)*m, so the
    mins plane costs one row-sum per block instead of a second matmul."""
    if has_mins:
        x_ref, codes_ref, scales_ref, mins_ref, out_ref = refs
    else:
        x_ref, codes_ref, scales_ref, out_ref = refs
    nb = scales_ref.shape[0]
    K = codes_ref.shape[0]
    qk = K // nb
    xb = x_ref[:].astype(dtype)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for b in range(nb):
        xblk = xb[:, b * qk:(b + 1) * qk]
        cb = codes_ref[b * qk:(b + 1) * qk, :].astype(dtype)
        part = jnp.dot(xblk, cb, preferred_element_type=jnp.float32)
        acc = acc + part * scales_ref[b, :][None, :]
        if has_mins:
            xsum = jnp.sum(xblk.astype(jnp.float32), axis=1, keepdims=True)
            acc = acc + xsum * mins_ref[b, :][None, :]
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("block_r", "dtype", "interpret"))
def qmmt(x: jax.Array, codes_t: jax.Array, scales_t: jax.Array,
         mins_t: Optional[jax.Array] = None,
         block_r: int = 4096, dtype=jnp.bfloat16,
         interpret: bool = False) -> jax.Array:
    """y[T, R] = x[T, K] @ dequant(codes_t, scales_t[, mins_t]) for
    TRANSPOSED planes (codes_t (K, R), scales_t/mins_t (nb, R)).  The
    serving path for the logits head: R ~ n_vocab, weight traffic
    1.125 B/elem (1.25 with an affine mins plane)."""
    T, K = x.shape
    Kc, R = codes_t.shape
    nb = scales_t.shape[0]
    assert K == Kc and nb > 0 and K % nb == 0, (x.shape, codes_t.shape,
                                                scales_t.shape)
    qk = K // nb

    # VMEM budget (~13 MB): double-buffered int8 codes tile + x + f32 acc +
    # one block's converted columns
    def vmem(br):
        return 2 * K * br + T * K * 4 + T * br * 4 + qk * br * 2

    while block_r > 512 and vmem(block_r) > 13 * 2**20:
        block_r //= 2
    block_r = min(block_r, _round_up(R, 256))

    Rp = _round_up(R, block_r)
    if Rp != R:
        codes_t = jnp.pad(codes_t, ((0, 0), (0, Rp - R)))
        scales_t = jnp.pad(scales_t, ((0, 0), (0, Rp - R)))
        if mins_t is not None:
            mins_t = jnp.pad(mins_t, ((0, 0), (0, Rp - R)))

    plane_spec = pl.BlockSpec((nb, block_r), lambda j: (0, j),
                              memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((T, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, block_r), lambda j: (0, j),
                     memory_space=pltpu.VMEM),
        plane_spec,
    ]
    operands = [x, codes_t, scales_t]
    if mins_t is not None:
        in_specs.append(plane_spec)
        operands.append(mins_t)
    out = pl.pallas_call(
        functools.partial(_qmmt_kernel, dtype=dtype,
                          has_mins=mins_t is not None),
        out_shape=jax.ShapeDtypeStruct((T, Rp), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(Rp // block_r,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((T, block_r), lambda j: (0, j),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * Rp * K,
            bytes_accessed=K * Rp + nb * Rp * 4 + T * K * 4 + T * Rp * 4
            + (nb * Rp * 4 if mins_t is not None else 0),
            transcendentals=0),
        interpret=interpret,
    )(*operands)
    return out[:, :R]


def _qmmt_fused_kernel(*refs, dtype, nopt, has_mins, has_ln, has_bias, act,
                       has_res, eps):
    """qmmt with the surrounding elementwise ops folded in:

        out = act(LN(x) @ dequant(codes_t, scales_t) + bias) + residual

    Every Pallas call is an opaque custom-call boundary to XLA, so in the
    unfused form each bias add / GELU / residual / layer-norm around a
    packed matmul becomes its own tiny kernel launch; at decode shapes the
    step is op-LATENCY-bound (~3-5 us per launch, ~12 launches per decoder
    layer — tools/perf_serving.py) and folding them here removes ~10
    launches per layer.  All elementwise math is f32, matching the exact
    unfused formulas (model.layer_norm / jax.nn.gelu(approximate=True));
    only the dot operands round to `dtype`, as in the unfused path."""
    x_ref, codes_ref, scales_ref = refs[:3]
    opt = list(refs[3:3 + nopt])
    out_ref = refs[3 + nopt]
    mins_ref = opt.pop(0) if has_mins else None
    ln_w = opt.pop(0) if has_ln else None
    ln_b = opt.pop(0) if has_ln else None
    bias = opt.pop(0) if has_bias else None
    res = opt.pop(0) if has_res else None

    xb = x_ref[:].astype(jnp.float32)
    if has_ln:
        mean = jnp.mean(xb, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xb - mean), axis=-1, keepdims=True)
        xb = (xb - mean) * jax.lax.rsqrt(var + eps)
        xb = xb * ln_w[:].astype(jnp.float32) + ln_b[:].astype(jnp.float32)
    xb = xb.astype(dtype)

    nb = scales_ref.shape[0]
    K = codes_ref.shape[0]
    qk = K // nb
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for b in range(nb):
        xblk = xb[:, b * qk:(b + 1) * qk]
        cb = codes_ref[b * qk:(b + 1) * qk, :].astype(dtype)
        part = jnp.dot(xblk, cb, preferred_element_type=jnp.float32)
        acc = acc + part * scales_ref[b, :][None, :]
        if has_mins:
            xsum = jnp.sum(xblk.astype(jnp.float32), axis=1, keepdims=True)
            acc = acc + xsum * mins_ref[b, :][None, :]
    if has_bias:
        acc = acc + bias[:].astype(jnp.float32)
    if act == "gelu":
        acc = jax.nn.gelu(acc, approximate=True)
    if has_res:
        acc = acc + res[:].astype(jnp.float32)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("block_r", "dtype", "act",
                                             "eps", "interpret"))
def qmmt_fused(x: jax.Array, codes_t: jax.Array, scales_t: jax.Array,
               mins_t: Optional[jax.Array] = None,
               ln_w=None, ln_b=None, bias=None, residual=None,
               act: Optional[str] = None, eps: float = 1e-5,
               block_r: int = 4096, dtype=jnp.bfloat16,
               interpret: bool = False) -> jax.Array:
    """act(LN(x) @ dequant + bias) + residual as ONE Pallas call.

    ln_w/ln_b: (K,) layer-norm affine applied to x rows first (or None).
    bias: (R,).  residual: (T, R).  act: None | "gelu" (applied before the
    residual, matching `x + gelu(h @ W + b)` never being used — the model's
    orders are gelu(h@W+b) and x + (h@W+b)).  Output f32."""
    T, K = x.shape
    Kc, R = codes_t.shape
    nb = scales_t.shape[0]
    assert K == Kc and nb > 0 and K % nb == 0, (x.shape, codes_t.shape,
                                                scales_t.shape)
    assert (ln_w is None) == (ln_b is None)
    qk = K // nb

    def vmem(br):
        return (2 * K * br + T * K * 4 + T * br * 4 + qk * br * 2
                + (T * br * 4 if residual is not None else 0))

    while block_r > 512 and vmem(block_r) > 13 * 2**20:
        block_r //= 2
    block_r = min(block_r, _round_up(R, 256))

    Rp = _round_up(R, block_r)
    if Rp != R:
        codes_t = jnp.pad(codes_t, ((0, 0), (0, Rp - R)))
        scales_t = jnp.pad(scales_t, ((0, 0), (0, Rp - R)))
        if mins_t is not None:
            mins_t = jnp.pad(mins_t, ((0, 0), (0, Rp - R)))
        if bias is not None:
            bias = jnp.pad(bias, (0, Rp - R))
        if residual is not None:
            residual = jnp.pad(residual, ((0, 0), (0, Rp - R)))

    in_specs = [
        pl.BlockSpec((T, K), lambda j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, block_r), lambda j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, block_r), lambda j: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x, codes_t, scales_t]
    if mins_t is not None:
        in_specs.append(pl.BlockSpec((nb, block_r), lambda j: (0, j),
                                     memory_space=pltpu.VMEM))
        operands.append(mins_t)
    if ln_w is not None:
        in_specs += [pl.BlockSpec((1, K), lambda j: (0, 0),
                                  memory_space=pltpu.VMEM)] * 2
        operands += [ln_w.reshape(1, K), ln_b.reshape(1, K)]
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, block_r), lambda j: (0, j),
                                     memory_space=pltpu.VMEM))
        operands.append(bias.reshape(1, Rp))
    if residual is not None:
        in_specs.append(pl.BlockSpec((T, block_r), lambda j: (0, j),
                                     memory_space=pltpu.VMEM))
        operands.append(residual)

    out = pl.pallas_call(
        functools.partial(
            _qmmt_fused_kernel, dtype=dtype, nopt=len(operands) - 3,
            has_mins=mins_t is not None, has_ln=ln_w is not None,
            has_bias=bias is not None, act=act,
            has_res=residual is not None, eps=eps),
        out_shape=jax.ShapeDtypeStruct((T, Rp), jnp.float32),
        grid_spec=pl.GridSpec(grid=(Rp // block_r,), in_specs=in_specs,
                              out_specs=pl.BlockSpec(
                                  (T, block_r), lambda j: (0, j),
                                  memory_space=pltpu.VMEM)),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * Rp * K,
            bytes_accessed=K * Rp + nb * Rp * 4 + T * K * 4 + T * Rp * 4
            + (nb * Rp * 4 if mins_t is not None else 0),
            transcendentals=T * Rp if act else 0),
        interpret=interpret,
    )(*operands)
    return out[:, :R]


def qmmt_fused_auto(x: jax.Array, qw: QWeightT, dtype=jnp.bfloat16, *,
                    ln=None, bias=None, residual=None,
                    act: Optional[str] = None, eps: float = 1e-5,
                    interpret: bool = False) -> jax.Array:
    """Fused LN->matmul->bias->act->residual for arbitrary leading dims.

    Off-TPU falls back to the exact unfused op sequence (the fused kernel
    is numerically the same formulas; tests/test_qmm.py checks both)."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    r2 = residual.reshape(-1, residual.shape[-1]) \
        if residual is not None else None
    if jax.default_backend() == "tpu" or interpret:
        y = qmmt_fused(x2, qw.codes_t, qw.scales_t, mins_t=qw.mins_t,
                       ln_w=ln[0] if ln else None,
                       ln_b=ln[1] if ln else None,
                       bias=bias, residual=r2, act=act, eps=eps,
                       dtype=dtype, interpret=interpret)
    else:
        h = x2.astype(jnp.float32)
        if ln is not None:
            mean = jnp.mean(h, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(h - mean), axis=-1, keepdims=True)
            h = (h - mean) * jax.lax.rsqrt(var + eps) * ln[0] + ln[1]
        y = qmmt_auto(h, qw, dtype)
        if bias is not None:
            y = y + bias
        if act == "gelu":
            y = jax.nn.gelu(y, approximate=True)
        if r2 is not None:
            y = y + r2
    return y.reshape(*lead, y.shape[-1])


def qmmt_auto(x: jax.Array, qw: QWeightT, dtype=jnp.bfloat16) -> jax.Array:
    """x @ dequant(qw) for arbitrary leading dims; dense fallback off-TPU."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if jax.default_backend() != "tpu":
        K, R = qw.codes_t.shape
        nb = qw.scales_t.shape[0]
        qk = K // nb
        s_full = jnp.broadcast_to(
            qw.scales_t[:, None, :], (nb, qk, R)).reshape(K, R)
        w = qw.codes_t.astype(jnp.float32) * s_full
        if qw.mins_t is not None:
            w = w + jnp.broadcast_to(
                qw.mins_t[:, None, :], (nb, qk, R)).reshape(K, R)
        y = jnp.matmul(x2.astype(dtype), w.astype(dtype),
                       preferred_element_type=jnp.float32)
    else:
        y = qmmt(x2, qw.codes_t, qw.scales_t, mins_t=qw.mins_t, dtype=dtype)
    return y.reshape(*lead, y.shape[-1])


def embed_lookup(qw: QWeight, tokens: jax.Array,
                 dtype=jnp.float32) -> jax.Array:
    """Embedding-row gather + dequant for a packed token-embedding matrix
    (replaces `tok_embd[tokens]`).  Plain XLA ops — the gathered rows are a
    few tokens, dequant cost is negligible."""
    rows = qw.codes[tokens].astype(jnp.float32)          # (..., K)
    s = qw.scales[tokens]                                # (..., K // qk)
    qk = qw.codes.shape[-1] // qw.scales.shape[-1]
    s_full = jnp.repeat(s, qk, axis=-1)
    out = rows * s_full
    if qw.mins is not None:
        out = out + jnp.repeat(qw.mins[tokens], qk, axis=-1)
    return out.astype(dtype)


def qmm_auto(x: jax.Array, qw: QWeight, dtype=jnp.bfloat16) -> jax.Array:
    """x @ dequant(qw)^T for arbitrary leading dims of x.

    Layer-weight path: plain XLA with the dequant expressed as a fusable
    convert+broadcast-multiply producer of the dot.  Measured on v5e
    (tools/perf_ablate.py): at decoder layer shapes (K,R <= 5120) XLA fuses
    the dequant into the dot's operand read — int8 HBM traffic, 16.5us vs
    16.1 for the hand-written Pallas kernel and 21 for dense bf16 — so the
    kernel buys nothing there.  The Pallas streaming kernel (qmmt) is
    reserved for the logits head, where XLA materializes the dequantized
    (K, V) weight and loses 3x."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    R, K = qw.codes.shape
    nb = qw.scales.shape[1]
    qk = K // nb
    s_full = jnp.broadcast_to(
        qw.scales[:, :, None].astype(dtype), (R, nb, qk)).reshape(R, K)
    w = qw.codes.astype(dtype) * s_full
    if qw.mins is not None:
        w = w + jnp.broadcast_to(
            qw.mins[:, :, None].astype(dtype), (R, nb, qk)).reshape(R, K)
    y = jax.lax.dot_general(
        x2.astype(dtype), w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    return y.reshape(*lead, y.shape[-1])


def dequantize_qweight(qw: QWeight, dtype=jnp.float32) -> jax.Array:
    """Dense fallback: expand to (R, K)."""
    qk = qw.codes.shape[-1] // qw.scales.shape[-1]
    scales = jnp.repeat(qw.scales, qk, axis=1)
    out = qw.codes.astype(jnp.float32) * scales
    if qw.mins is not None:
        out = out + jnp.repeat(qw.mins, qk, axis=1)
    return out.astype(dtype)


def from_qtensor(qt, device=None) -> QWeight:
    """Build a device QWeight from formats.quants.QTensor.  Affine formats
    (q4_1/q5_1, K-quants) keep their mins plane; dequant = codes*scale+min."""
    return QWeight(jnp.asarray(qt.codes, jnp.int8),
                   jnp.asarray(qt.scales, jnp.float32),
                   None if qt.mins is None
                   else jnp.asarray(qt.mins, jnp.float32))
