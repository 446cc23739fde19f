"""Encoder self-attention Pallas kernel over the fused QKV buffer.

Motivation (tools/perf_encoder.py, v5e, large-v3 T=1536/S=1280/H=20):
the encoder block's attention costs ~465 us while its matmuls+flash
roofline is ~240 us — the gap is the THREE head-split transposes
((T, S) -> (H, T, d)), the merge transpose back, and (on the fused-QKV
layout) the lane slices of the (T, 3S) projection, each a separate HBM
pass that XLA does not fuse into the upstream flash kernel's operands.

This kernel removes all of them: it reads q/k/v for one head DIRECTLY
from the fused (T, 3S) projection output via BlockSpec index maps (the
same buffer is passed three times; blocks are lane-column windows at
offsets h*d, S + h*d, 2S + h*d), computes one head's full non-causal
attention in a single pass, and writes the (T, S) merged output block
in residual layout — zero physical transposes outside or inside.

Whisper's encoder T is small (1500 -> padded 1536), so one (bq, T)
score tile fits VMEM and no streaming softmax (flash) is needed: this
is a SINGLE-PASS softmax — max/exp/sum over the full row in registers,
numerically identical to XLA's attention up to bf16 rounding.

Padding: the encoder keeps a padded-resident stream (model.encode);
rows/cols past `true_len` are junk.  Junk COLUMNS are masked to -inf so
real rows never attend to them (exact); junk ROWS attend to real
columns and produce finite junk — they are sliced away after ln_post,
and keeping them unmasked avoids a fully-masked softmax row (NaN).

Reference role: whisper.cpp encoder self-attention
(src/whisper.cpp:2150-2232, ggml flash_attn_ext path).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def use_kernel() -> bool:
    """Route encoder self-attention through this kernel?

    Default: only on a SINGLE real TPU chip.  Under a multi-device mesh
    the pallas_call is opaque to GSPMD — the qkv operand would be
    all-gathered and every chip would compute all heads — while the
    flash/XLA fallback partitions by head, so multichip runs keep the
    fallback.  WTPU_ENC_ATTN=pallas forces the kernel anywhere (tests
    exercise it via interpret mode); =xla / =flash disables it.
    """
    mode = os.environ.get("WTPU_ENC_ATTN", "auto")
    if mode == "pallas":
        return True
    if mode in ("xla", "flash"):
        return False
    return jax.default_backend() == "tpu" and len(jax.devices()) == 1


def _kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale: float, true_len: int,
            d: int, sm_dtype):
    """One head-PAIR per grid step: Pallas TPU blocks must be 128-lane
    multiples, so each block carries two adjacent d=64 heads; the split
    happens in-register (static lane slices), never in HBM.

    `sm_dtype`: softmax element type.  The MXU always accumulates the
    score dot in f32; bfloat16 here casts the scores once and runs the
    VPU max/exp passes at 2x rate on half the buffer.  exp after
    max-subtraction lands in [0, 1] where bf16 keeps ~2-3 significant
    digits — the row SUM still accumulates in f32 (dot with a ones
    vector on the MXU), so the normalizer does not lose mass."""
    t = k_ref.shape[0]
    mask = None
    if true_len < t:  # mask junk key columns (exact for real rows)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
        mask = jnp.where(col < true_len, 0.0, -1e30).astype(sm_dtype)

    for a in range(o_ref.shape[-1] // d):  # heads in this block (2)
        # sm_scale folds into q (tiny (bq, d) pass, saves a (bq, T) mul)
        q = q_ref[:, a * d:(a + 1) * d] * jnp.bfloat16(sm_scale)
        k = k_ref[:, a * d:(a + 1) * d]             # (T, d) bf16
        v = v_ref[:, a * d:(a + 1) * d]             # (T, d) bf16
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s.astype(sm_dtype)                      # (bq, T)
        if mask is not None:
            s = s + mask
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        pb = p.astype(jnp.bfloat16)
        ones = jnp.ones((t, 1), jnp.bfloat16)
        denom = jax.lax.dot_general(pb, ones, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        o = jax.lax.dot_general(pb, v, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[:, a * d:(a + 1) * d] = (o / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_head", "true_len", "block_q",
                                              "softmax_dtype"))
def self_attention_qkv(qkv: jax.Array, n_head: int,
                       true_len: int | None = None,
                       block_q: int = 768,
                       softmax_dtype=jnp.float32) -> jax.Array:
    """softmax(q k^T / sqrt(d)) v for all heads, straight off the fused
    projection.

    qkv: (T, 3*S) — [q | k | v] lane-concatenated (load.py qkv_w layout).
    Returns (T, S) bf16 in residual (merged-head) layout.
    T must be a multiple of block_q (the encoder pads to 512 multiples);
    rows/cols at true_len.. are treated as junk padding (see module doc).
    """
    t, s3 = qkv.shape
    s = s3 // 3
    d = s // n_head
    n_real = t if true_len is None else true_len
    bq = min(block_q, t)
    assert t % bq == 0, (t, bq)
    # blocks must span 128 lanes -> pair up d=64 heads (d>=128: 1 head/blk)
    hb = max(1, 128 // d)
    assert n_head % hb == 0, (n_head, hb)
    bl = hb * d  # block lane width
    qkv = qkv.astype(jnp.bfloat16)

    kern = functools.partial(_kernel, sm_scale=1.0 / math.sqrt(d),
                             true_len=n_real, d=d, sm_dtype=softmax_dtype)
    ng = n_head // hb  # head-pair groups; lane offsets in block units of bl
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((t, s), jnp.bfloat16),
        grid_spec=pl.GridSpec(
            # i inner so each group's k/v blocks stay resident across its
            # q tiles (pallas skips the re-fetch when the block index is
            # unchanged between consecutive steps)
            grid=(ng, t // bq),
            in_specs=[
                pl.BlockSpec((bq, bl), lambda g, i: (i, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, bl), lambda g, i: (0, ng + g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, bl), lambda g, i: (0, 2 * ng + g),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bq, bl), lambda g, i: (i, g),
                                   memory_space=pltpu.VMEM),
        ),
        # every grid step writes a disjoint output block -> fully parallel,
        # letting Mosaic overlap the next blocks' DMA with compute
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=_interpret(),
    )(qkv, qkv, qkv)
