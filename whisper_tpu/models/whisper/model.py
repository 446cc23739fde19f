"""Whisper encoder/decoder as pure JAX functions (TPU-first design).

Functional re-design of the reference graph builders
(src/whisper.cpp:1982-2842).  Differences from the C++ graphs are deliberate
TPU idioms, not semantic changes:

  * one `lax.scan` over stacked layer weights instead of L unrolled blocks
    (single compiled body, small HLO, good for 32-layer large-v3);
  * attention runs with the standard 1/sqrt(d_head) scale in one place; the
    reference splits the scale as (d^-0.25 on Q) * (d^-0.25 on K) purely for
    f16-range reasons (src/whisper.cpp:2556-2565, 2309) — mathematically
    identical, and unnecessary with f32/bf16 accumulation on the MXU;
  * the decoder KV cache is a dense [layer, beam, n_text_ctx, n_state] array
    with `dynamic_update_slice` writes — beam reshuffling is a gather over the
    beam axis (vs. the reference's per-cell seq_id bookkeeping,
    src/whisper.cpp:692-1157) — everything stays static-shape for XLA;
  * masks are additive f32, always over the full static cache; no dynamic
    `n_kv` trimming (the reference pads to 256 for the same reason,
    src/whisper.cpp:2061).

All matmuls take `preferred_element_type=f32`; `dtype` selects the MXU input
precision (bf16 on TPU, f32 for bit-accuracy tests).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .hparams import WhisperHParams


def _gelu(x: jax.Array, parity: bool = False) -> jax.Array:
    # ggml_gelu is the tanh approximation (ggml/src/ggml-cpu/ops.cpp GELU LUT)
    if parity:
        # GGML_GELU_FP16 table emulation (ggml/src/ggml-cpu/vec.h:987-1001):
        # y = f16(gelu(f32(f16(x)))) with hard 0/x clamps outside [-10, 10]
        xr = x.astype(jnp.float16).astype(jnp.float32)
        y = jax.nn.gelu(xr, approximate=True).astype(
            jnp.float16).astype(jnp.float32)
        return jnp.where(x <= -10.0, 0.0, jnp.where(x >= 10.0, x, y))
    return jax.nn.gelu(x, approximate=True)


def scan_layers(body, carry, xs, unroll: bool = True):
    """Iterate `body` over the leading (layer) axis of the `xs` pytree.

    unroll=True emits a Python loop (XLA sees L inlined blocks — faster at
    runtime, especially on CPU where `lax.scan` bodies don't fuse); False uses
    `lax.scan` (smaller HLO, faster compiles for very deep models)."""
    if not unroll:
        return lax.scan(body, carry, xs)
    leaves = jax.tree.leaves(xs)
    n = leaves[0].shape[0]
    ys = []
    for i in range(n):
        xi = jax.tree.map(lambda a: a[i], xs)
        carry, y = body(carry, xi)
        ys.append(y)
    if ys and ys[0] is not None:
        stacked = jax.tree.map(lambda *a: jnp.stack(a), *ys)
    else:
        stacked = None
    return carry, stacked


def layer_norm(x: jax.Array, w: jax.Array, b: jax.Array, eps: float = 1e-5) -> jax.Array:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    normed = (x32 - mean) * lax.rsqrt(var + eps)
    return normed * w + b


class QWGGML(NamedTuple):
    """ggml-CPU-parity quantized weight: centered integer codes in FILE
    orientation (out, in) held as exact f32 ints, plus per-32-block f32
    scales (f16-exact values).  `_mm` reproduces ggml's quantized mul_mat
    bit-for-bit from these (see `_mm_ggml_q`)."""

    codes: jax.Array   # (out, in) f32 integer codes
    scales: jax.Array  # (out, in//32) f32


def _round_half_away(v: jax.Array) -> jax.Array:
    # C roundf(): halves round away from zero (jnp.round is half-to-even)
    return jnp.sign(v) * jnp.floor(jnp.abs(v) + 0.5)


def _mm_ggml_q(x: jax.Array, w: QWGGML) -> jax.Array:
    """ggml CPU quantized mul_mat, bit-faithfully: activation rows quantize
    to Q8_0 (quantize_row_q8_0_ref semantics — d=amax/127, id=1/d before the
    f16 rounding of d, roundf codes), then per-32-block INTEGER dots scaled
    by f32(f16(d_w))*f32(f16(d_x)) accumulate in f32
    (ggml/src/ggml-cpu/quants.c ggml_vec_dot_q5_0_q8_0_generic).  The
    integer block dots are exact in f32 (|sumi| < 2^24)."""
    out_dim, in_dim = w.codes.shape
    nb = in_dim // 32
    xb = x.astype(jnp.float32).reshape(x.shape[:-1] + (nb, 32))
    amax = jnp.max(jnp.abs(xb), axis=-1)
    d = amax / 127.0
    idd = jnp.where(d > 0, 1.0 / jnp.where(d == 0, 1.0, d), 0.0)
    q = _round_half_away(xb * idd[..., None])
    dx = d.astype(jnp.float16).astype(jnp.float32)
    part = jnp.einsum("...bk,obk->...ob", q,
                      w.codes.reshape(out_dim, nb, 32),
                      preferred_element_type=jnp.float32)
    return jnp.sum(part * w.scales * dx[..., None, :], axis=-1)


class CapturedWeight:
    """Imatrix-capture wrapper (formats/imatrix.py): records the matmul
    input's per-column activation statistics under the weight's file
    tensor name(s), then computes normally.  EAGER-mode only — the
    collector is a host-side side effect that a jit trace would drop."""

    def __init__(self, names, w, collector):
        self.names = names
        self.w = w
        self.collector = collector

    def __getitem__(self, l):
        """Stacked (L, ...) weights slice per layer inside the unrolled
        loops; `names` is then a per-layer list."""
        return CapturedWeight(self.names[l], self.w[l], self.collector)

    @property
    def T(self):  # the logits head transposes the token embedding
        return CapturedWeight(self.names, self.w.T, self.collector)


def _mm(x: jax.Array, w, dtype) -> jax.Array:
    """x @ w with f32 accumulation; inputs cast to `dtype` for the MXU.

    `w` may be a packed QWeight ((out, in) file orientation; XLA-fused
    dequant) or QWeightT (transposed planes; Pallas streaming kernel for
    the logits head) — either way x @ W^T reads 1.125 B/elem of weights
    from HBM instead of bf16's 2 (ops/qmm.py) — or a QWGGML (ggml-CPU
    parity emulation).
    """
    from ...ops.qmm import QWeight, QWeightT, qmm_auto, qmmt_auto

    if isinstance(w, CapturedWeight):
        w.collector.add(w.names, x)
        return _mm(x, w.w, dtype)
    if isinstance(w, QWGGML):
        return _mm_ggml_q(x, w)
    if isinstance(w, QWeightT):
        return qmmt_auto(x, w, dtype)
    if isinstance(w, QWeight):
        return qmm_auto(x, w, dtype)
    return jnp.matmul(x.astype(dtype), w.astype(dtype),
                      preferred_element_type=jnp.float32)


def _mm_fused(x: jax.Array, w, dtype, *, ln=None, bias=None, res=None,
              act=None, eps: float = 1e-5, parity: bool = False) -> jax.Array:
    """act(LN(x) @ w + bias) + res — ONE Pallas call for packed QWeightT on
    TPU (ops/qmm.py qmmt_fused); otherwise the reference op sequence.

    Decode steps are op-latency-bound: each packed matmul's surrounding
    bias/GELU/residual/layer-norm ops cannot fuse across the Pallas
    custom-call boundary and cost a kernel launch each (~10 launches per
    decoder layer removed by this — tools/perf_serving.py)."""
    from ...ops.qmm import QWeightT, qmmt_fused_auto

    if isinstance(w, QWeightT) and jax.default_backend() == "tpu":
        return qmmt_fused_auto(x, w, dtype, ln=ln, bias=bias, residual=res,
                               act=act, eps=eps)
    h = layer_norm(x, ln[0], ln[1], eps) if ln is not None else x
    y = _mm(h, w, dtype)
    if bias is not None:
        y = y + bias
    if act == "gelu":
        y = _gelu(y, parity)
    if res is not None:
        y = y + res
    return y


def _split_heads(x: jax.Array, n_head: int) -> jax.Array:
    """(..., T, n_state) -> (..., n_head, T, d_head)"""
    *lead, t, n_state = x.shape
    x = x.reshape(*lead, t, n_head, n_state // n_head)
    return jnp.swapaxes(x, -2, -3)


def _merge_heads(x: jax.Array) -> jax.Array:
    """(..., n_head, T, d_head) -> (..., T, n_state)"""
    x = jnp.swapaxes(x, -2, -3)
    *lead, t, h, d = x.shape
    return x.reshape(*lead, t, h * d)


def attention(q: jax.Array, k: jax.Array, v: jax.Array,
              mask: Optional[jax.Array], dtype,
              scale: Optional[float] = None) -> jax.Array:
    """q:(...,H,Tq,d) k,v:(...,H,Tk,d) mask additive f32 (...,1,Tq,Tk) or None.

    `scale` overrides the default 1/sqrt(d) score scale (the ggml-parity
    decode path pre-scales q and k by d^-0.25 each and passes 1.0)."""
    d = q.shape[-1]
    if scale is None:
        scale = jnp.float32(1.0) / jnp.sqrt(jnp.float32(d))
    scores = jnp.matmul(q.astype(dtype), jnp.swapaxes(k, -1, -2).astype(dtype),
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    out = jnp.matmul(probs.astype(dtype), v.astype(dtype),
                     preferred_element_type=jnp.float32)
    return out


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def conv_stem(enc_params: Dict[str, Any], mel: jax.Array, dtype,
              parity: bool = False) -> jax.Array:
    """2x conv1d + GELU (whisper_build_graph_conv, src/whisper.cpp:2009-2021).

    mel: (n_mels, 2*n_ctx) -> (n_ctx, n_state)

    parity: emulate the ggml CPU precision exactly — conv inputs round to
    f16 (im2col emits the weight's vec_dot type) and GELU goes through the
    f16 table (see `_gelu`); dtype must be float16.
    """
    x = mel[None, :, :]  # (N=1, C=n_mels, W)
    w1 = enc_params["conv1_w"]  # (n_state, n_mels, 3)
    x = lax.conv_general_dilated(
        x.astype(dtype), w1.astype(dtype), window_strides=(1,), padding=[(1, 1)],
        dimension_numbers=("NCW", "OIW", "NCW"),
        preferred_element_type=jnp.float32,
    )
    x = _gelu(x + enc_params["conv1_b"][None, :, None], parity)
    w2 = enc_params["conv2_w"]  # (n_state, n_state, 3)
    x = lax.conv_general_dilated(
        x.astype(dtype), w2.astype(dtype), window_strides=(2,), padding=[(1, 1)],
        dimension_numbers=("NCW", "OIW", "NCW"),
        preferred_element_type=jnp.float32,
    )
    x = _gelu(x + enc_params["conv2_b"][None, :, None], parity)
    return x[0].T  # (n_ctx, n_state)


def _segment_mask(t_pad: int, true_len: int) -> jax.Array:
    """Additive (1, T, T) mask splitting rows [0,true_len) and the junk
    pad rows into two attention segments (the pad block attends itself so
    no softmax row is fully masked -> no NaN)."""
    real = jnp.arange(t_pad) < true_len
    allow = real[:, None] == real[None, :]
    return jnp.where(allow, 0.0, -1e9).astype(jnp.float32)[None]


def _encoder_block(x: jax.Array, blk: Dict[str, jax.Array], n_head: int,
                   eps: float, dtype, true_len: Optional[int] = None,
                   parity: bool = False) -> jax.Array:
    """One pre-LN transformer block.  `true_len`: set when the residual
    stream is padded-resident (rows true_len.. are junk kept only so every
    matmul runs at an MXU-aligned M — see `encode`); attention then keeps
    the junk rows in a separate segment."""
    # self-attention (pre-LN); q/k/v ride one load-time-fused (S -> 3S)
    # projection (the zero K-bias slot in qkv_b keeps K bias-free)
    h = layer_norm(x, blk["attn_ln_w"], blk["attn_ln_b"], eps)
    n_state = x.shape[-1]
    qkv = _mm(h, blk["qkv_w"], dtype) + blk["qkv_b"]
    from ...ops.attention import flash_self_attention, use_flash
    from ...ops.enc_attn import self_attention_qkv, use_kernel

    t_pad = qkv.shape[-2]
    d_head = n_state // n_head
    if parity:
        # ggml parity: the reference's non-flash encoder attention CASTS
        # K and V to f16 (ggml_cast to wctx.itype, src/whisper.cpp:2170-2193),
        # which also rounds Q and the softmax probs to f16 at the two
        # mul_mats (vec_dot_type f16); the d^-0.5 scale rides inside
        # soft_max_ext in f32 — exactly `attention` with dtype=f16
        qh, kh, vh = (_split_heads(qkv[..., i * n_state:(i + 1) * n_state],
                                   n_head) for i in range(3))
        m = _segment_mask(qh.shape[-2], true_len) if true_len is not None else None
        merged = _merge_heads(attention(qh, kh, vh, m, jnp.float16))
    elif (use_kernel() and dtype == jnp.bfloat16 and t_pad % 512 == 0
            and d_head in (64, 128)
            # d=64 heads ride the kernel in PAIRS (128-lane blocks) — an
            # odd head count must keep the flash/XLA fallback
            and n_head % max(1, 128 // d_head) == 0):
        # fused-buffer Pallas attention: reads q/k/v per head-pair straight
        # from the projection output — no head transposes, no lane slices
        # (ops/enc_attn.py; 303 vs 350 us/block on v5e), merged (T, S) out
        merged = self_attention_qkv(
            qkv, n_head,
            true_len=true_len if true_len is not None else t_pad,
            block_q=512 if t_pad % 768 else 768)
    else:
        qh, kh, vh = (_split_heads(qkv[..., i * n_state:(i + 1) * n_state],
                                   n_head) for i in range(3))
        if use_flash(qh.shape[-2], dtype):
            out = flash_self_attention(qh, kh, vh, true_len=true_len)
        elif true_len is not None:
            out = attention(qh, kh, vh, _segment_mask(qh.shape[-2], true_len),
                            dtype)
        else:
            out = attention(qh, kh, vh, None, dtype)
        merged = _merge_heads(out)
    x = x + _mm(merged, blk["o_w"], dtype) + blk["o_b"]
    # MLP (pre-LN)
    h = layer_norm(x, blk["mlp_ln_w"], blk["mlp_ln_b"], eps)
    h = _gelu(_mm(h, blk["mlp0_w"], dtype) + blk["mlp0_b"], parity)
    x = x + _mm(h, blk["mlp1_w"], dtype) + blk["mlp1_b"]
    return x


def encode(params: Dict[str, Any], mel: jax.Array, hp: WhisperHParams,
           dtype=jnp.bfloat16, n_audio_ctx: Optional[int] = None,
           unroll: bool = True, pad_to: Optional[int] = None,
           parity: bool = False) -> jax.Array:
    """mel (n_mels, 2*n_ctx) -> encoder embeddings (n_ctx, n_state).

    Mirrors whisper_build_graph_encoder (src/whisper.cpp:2044-2275); position
    embedding uses the *first* n_ctx rows when audio_ctx is truncated
    (src/whisper.cpp:2088-2095).

    Padded residency: on the flash path the residual stream is padded ONCE
    to a 512 multiple (1500 -> 1536) for the whole block stack and sliced
    back before ln_post.  M=1536 is MXU-tile aligned: the dominant
    (T,1280)x(1280,5120) matmul measures 231 vs 146 TFLOPS at M=1500
    (tools/perf_enc_pad.py), and the per-layer pad/slice copies inside
    flash disappear.  Junk pad rows are masked into their own attention
    segment, so real rows are numerically unaffected.  `pad_to` forces a
    padded length (used by tests to exercise this path on CPU).
    """
    from ...ops.attention import _round_up, use_flash

    enc = params["enc"]
    x = conv_stem(enc, mel, dtype, parity)
    n_ctx = x.shape[0]
    x = x + enc["pos_embd"][:n_ctx]

    tp = pad_to
    if tp is None and not parity and use_flash(n_ctx, dtype):
        tp = _round_up(max(n_ctx, 512), 512)
    true_len = None
    if tp is not None and tp > n_ctx:
        x = jnp.pad(x, ((0, tp - n_ctx), (0, 0)))
        true_len = n_ctx

    def body(carry, blk):
        return _encoder_block(carry, blk, hp.n_audio_head, hp.eps, dtype,
                              true_len=true_len, parity=parity), None

    x, _ = scan_layers(body, x, enc["blocks"], unroll)
    if true_len is not None:
        x = x[:n_ctx]
    x = layer_norm(x, enc["ln_post_w"], enc["ln_post_b"], hp.eps)
    return x


class XK8(NamedTuple):
    """INT8 cross-attention K or V plane: codes (..., H, Tc, d) int8 with a
    per-(head, position) scale (..., H, Tc) f32.  The scale factors out of
    both cross-attention matmuls exactly (scores = (q @ codes^T) * scale,
    out = (probs * scale) @ codes), so nothing dequantizes to a dense plane.
    Halves the dominant HBM stream of batched decode (the reference keeps
    cross KV in the compute dtype, src/whisper.cpp:2278-2352) and halves
    per-window serving memory."""

    codes: jax.Array
    scale: jax.Array


def compute_cross_kv(params: Dict[str, Any], enc_out: jax.Array,
                     hp: WhisperHParams, dtype=jnp.bfloat16,
                     unroll: bool = True, itype: str = "f16",
                     parity: bool = False):
    """Precompute cross-attention K/V for every decoder layer
    (whisper_build_graph_cross, src/whisper.cpp:2278-2352).

    Returns (xk, xv) with shape (n_text_layer, n_head, n_audio_ctx, d_head)
    — as dense arrays (itype='f16') or XK8 int8 planes (itype='q8').
    K is *unscaled* here; the 1/sqrt(d) lives in `attention`.

    parity: ggml-CPU emulation — K is pre-scaled by d^-0.25 (the reference
    scales BEFORE the f16 kv_cross store, src/whisper.cpp:2304-2314) and
    both planes round to f16 exactly like the kv_cross cpy.
    """
    blocks = params["dec"]["blocks"]

    def body(_, blk):
        k = _mm(enc_out, blk["xk_w"], dtype)               # no bias
        v = _mm(enc_out, blk["xv_w"], dtype) + blk["xv_b"]
        return None, (_split_heads(k, hp.n_text_head), _split_heads(v, hp.n_text_head))

    _, (xk, xv) = scan_layers(body, None, blocks, unroll)
    if parity:
        d_head = hp.n_text_state // hp.n_text_head
        kq_scale = jnp.float32(float(d_head) ** -0.25)
        return ((xk * kq_scale).astype(jnp.float16),
                xv.astype(jnp.float16))
    if itype == "q8":
        kq, ks = _quantize_rows(xk)
        vq, vs = _quantize_rows(xv)
        return XK8(kq, ks), XK8(vq, vs)
    return xk, xv


def cross_attend(qh: jax.Array, ck, cv, dtype, return_probs: bool = False,
                 scale: Optional[float] = None):
    """Cross-attention against dense (H, Tc, d) or XK8 int8 planes; qh is
    (..., H, Tq, d).  No mask — all encoder positions are visible.

    `scale` overrides 1/sqrt(d): the ggml-parity path stores K pre-scaled
    by d^-0.25 and applies the second d^-0.25 inside the softmax
    (soft_max_ext's scale arg, src/whisper.cpp:2723)."""
    d = qh.shape[-1]
    if scale is None:
        scale = jnp.float32(1.0) / jnp.sqrt(jnp.float32(d))
    if isinstance(ck, XK8):
        scores = jnp.matmul(
            qh.astype(dtype), jnp.swapaxes(ck.codes, -1, -2).astype(dtype),
            preferred_element_type=jnp.float32)
        scores = scores * jnp.expand_dims(ck.scale, -2) * scale
        probs = jax.nn.softmax(scores, axis=-1)
        pv = probs * jnp.expand_dims(cv.scale, -2)
        out = jnp.matmul(pv.astype(dtype), cv.codes.astype(dtype),
                         preferred_element_type=jnp.float32)
    else:
        scores = jnp.matmul(qh.astype(dtype),
                            jnp.swapaxes(ck, -1, -2).astype(dtype),
                            preferred_element_type=jnp.float32) * scale
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.matmul(probs.astype(dtype), cv.astype(dtype),
                         preferred_element_type=jnp.float32)
    return (out, probs) if return_probs else out


# ---------------------------------------------------------------------------
# Decoder with static-shape beam KV cache
# ---------------------------------------------------------------------------

class KVCache(NamedTuple):
    """Self-attention cache, HEAD-MAJOR:
    kv (n_layer, n_beam, n_head, 2, n_text_ctx, d_head) with K at
    [..., 0, :, :] and V at [..., 1, :, :].

    Why head-major: the decode step reads the WHOLE cache every token to
    feed the attention matmuls, which want (B, H, C, d) operands.  The
    earlier context-major layout (L, B, C, 2, S) needed a _split_heads
    transpose of the full cache read per layer, which XLA materializes in
    HBM — measured ~160 us/layer of pure relayout traffic at W=16
    large-v3, the single largest cost in the serving step
    (tools/perf_layer_mm.py vs perf_serving.py attribution).  Head-major
    makes K and V contiguous (C, d) blocks per head that fuse directly
    into the dots; the per-step write transposes only the NEW column
    (B, n_tok, 2S — trivial), and the cache update stays ONE in-place
    `dynamic_update_slice` per layer.

    Tensor parallelism shards axis 2 (heads) — cache writes and the whole
    self-attention stay device-local under TP, the analogue of the
    reference meta backend's by-head KV splits (ggml-backend.h:369-401)."""

    kv: jax.Array

    @staticmethod
    def zeros(hp: WhisperHParams, n_beam: int, dtype=jnp.float32,
              n_cells: int = 0) -> "KVCache":
        h = hp.n_text_head
        shape = (hp.n_text_layer, n_beam, h, 2,
                 n_cells or hp.n_text_ctx, hp.n_text_state // h)
        return KVCache(jnp.zeros(shape, dtype))

    def reorder(self, beam_idx: jax.Array) -> "KVCache":
        """Beam-search reshuffle: gather along the beam axis (replaces the
        reference's kv_seq_cp cell copies, src/whisper.cpp:7338-7353)."""
        return KVCache(self.kv[:, beam_idx])


class KVCache8(NamedTuple):
    """INT8 self-attention cache (the reference's quantized-`itype` kv_self).

    Rows quantize per position: code = round(127 x / amax), scale = amax/127
    with K/V codes sharing one head-major buffer
    kv (L, B, H, 2, C, d) int8 (K at [..., 0, :, :] — see KVCache for why
    head-major) and per-position scales (L, B, 2, C) f32 ([..., 0, :]=K,
    [..., 1, :]=V).  Attention stays exact-factorable — scores =
    (q @ codes^T) * scale_j and out = (probs * scale_j) @ codes — so nothing
    is dequantized to a dense f16 cache; HBM cache traffic and memory halve.
    TP shards the head axis (2); the per-position scales are
    head-independent so sharded codes with replicated scales stay exact.
    """

    kv: jax.Array      # int8 codes, (L, B, H, 2, C, d), K then V
    scale: jax.Array   # (L, B, 2, C) f32

    @staticmethod
    def zeros(hp: WhisperHParams, n_beam: int, dtype=jnp.float32,
              n_cells: int = 0) -> "KVCache8":
        h = hp.n_text_head
        c = n_cells or hp.n_text_ctx
        shape = (hp.n_text_layer, n_beam, h, 2, c,
                 hp.n_text_state // h)
        return KVCache8(jnp.zeros(shape, jnp.int8),
                        jnp.zeros((hp.n_text_layer, n_beam, 2, c),
                                  jnp.float32))

    def reorder(self, beam_idx: jax.Array) -> "KVCache8":
        return KVCache8(self.kv[:, beam_idx], self.scale[:, beam_idx])


def _quantize_rows(x: jax.Array):
    """(B, T, S) -> (codes int8, scale (B, T) f32); per-position symmetric."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = amax / 127.0
    inv = jnp.where(scale > 0, 1.0 / jnp.where(scale == 0, 1, scale), 0.0)
    codes = jnp.clip(jnp.round(x.astype(jnp.float32) * inv[..., None]),
                     -127, 127).astype(jnp.int8)
    return codes, scale


def new_cache(hp: WhisperHParams, n_beam: int, dtype=jnp.float32,
              itype: str = "f16", n_cells: int = 0):
    """kv_self allocation; itype 'f16' (dense, `dtype` storage) or 'q8'.
    n_cells overrides the cell count (0 -> hp.n_text_ctx); the native
    window batcher passes prompt_bucket + n_max."""
    if itype == "q8":
        return KVCache8.zeros(hp, n_beam, dtype, n_cells)
    return KVCache.zeros(hp, n_beam, dtype, n_cells)


def decode_step(params: Dict[str, Any],
                tokens: jax.Array,       # (n_beam, n_tok) int32
                positions: jax.Array,    # (n_beam, n_tok) int32
                kv_head: jax.Array,      # scalar int32: cache write offset
                cache: KVCache,
                xk: jax.Array, xv: jax.Array,  # cross KV
                hp: WhisperHParams,
                dtype=jnp.bfloat16,
                unroll: bool = True,
                attn_mask=None,
                xkv_group: int = 1,
                attn_ctx: Optional[int] = None,
                parity: bool = False) -> Tuple[jax.Array, KVCache]:
    """One batched decoder forward over all live beams.

    Mirrors whisper_build_graph_decoder (src/whisper.cpp:2464-2842): token+pos
    embedding lookup, causal masked self-attention writing K/V into the cache
    at `kv_head`, cross-attention against precomputed xk/xv, final LN, logits
    against the token-embedding matrix for all rows.

    TPU-native structure: the decode step is op-LATENCY-bound, not
    bandwidth-bound, so the layer loop minimizes op count — q/k/v run as ONE
    fused matmul against the load-time-concatenated `qkv_w`, K and V land in
    the cache with ONE `dynamic_update_slice` per layer (K/V share a buffer;
    the fused projection already emits them adjacent), and the stacked cache
    threads through the unrolled loop so XLA aliases the updates in place
    instead of restacking per-layer leaves (which silently copied the whole
    multi-GB cache every step).

    Returns (logits (n_beam, n_tok, n_vocab) f32, updated cache).

    parity: ggml-CPU f16 emulation (dtype must be float16, cache dtype
    float16): q and the new K column are pre-scaled by d^-0.25 *before*
    their f16 roundings — matching ggml_scale-then-cpy into the f16
    kv_self (src/whisper.cpp:2549-2565) — so self-attention runs with
    scale=1; cross-attention K arrives pre-scaled from compute_cross_kv
    and the second d^-0.25 is applied on the scores; GELU goes through
    the f16 table.
    """
    dec = params["dec"]
    n_beam, n_tok = tokens.shape
    n_head = hp.n_text_head
    # cell count comes from the CACHE, not hparams: the natively batched
    # window decoder allocates prompt_bucket + n_max cells (> n_text_ctx)
    # so its left-pad shift can never overflow the write head
    n_ctx = (cache.kv.shape[-2] if hasattr(cache, "kv")
             else hp.n_text_ctx)
    n_state = hp.n_text_state
    n_layer = hp.n_text_layer
    eps = hp.eps

    from ...ops.qmm import QWeight, embed_lookup

    tok_embd = dec["tok_embd"]
    if isinstance(tok_embd, CapturedWeight):
        # imatrix capture wraps the LOGITS-head use; the embedding lookup
        # reads the inner array
        emb = tok_embd.w[tokens]
    elif isinstance(tok_embd, QWGGML):
        # ggml get_rows dequantizes the quantized embedding rows exactly:
        # value = code * f32(f16(d)) per 32-block
        rows = tok_embd.codes[tokens]
        scl = tok_embd.scales[tokens]
        emb = (rows.reshape(rows.shape[:-1] + (scl.shape[-1], 32))
               * scl[..., None]).reshape(rows.shape)
    elif isinstance(tok_embd, QWeight):
        emb = embed_lookup(tok_embd, tokens)
    else:
        emb = tok_embd[tokens]
    # f32 residual stream (matches the carry dtype the block bodies return)
    x = (emb + dec["pos_embd"][positions]).astype(jnp.float32)

    # Self-attention context bound: cells >= kv_head + n_tok are ALWAYS
    # -inf masked (never written yet), so when the caller promises
    # kv_head + n_tok <= attn_ctx the attention can read just the first
    # `attn_ctx` cache cells — bit-identical output (masked cells
    # contribute exact zeros) at a fraction of the read/softmax cost.
    # decode_step_bucketed picks attn_ctx dynamically per step; the
    # static 448-cell cache otherwise costs ~40% of the W=16 serving
    # step (tools/perf_serving.py ctx112 ablation).
    A = n_ctx if attn_ctx is None else min(attn_ctx, n_ctx)

    # causal mask over the static cache: cell j visible to new token i iff
    # j < kv_head + i + 1  (cells are written in position order per beam)
    j = jnp.arange(A)[None, None, :]
    i = jnp.arange(n_tok)[None, :, None]
    visible = j < (kv_head + i + 1)
    mask = jnp.where(visible, 0.0, -jnp.inf).astype(jnp.float32)[:, None]  # (1,1,T,A)
    if attn_mask is not None:
        # extra per-row additive mask (B,1,1,n_ctx): e.g. left-pad cells of a
        # natively window-batched prompt (decoding/device_loop.py)
        mask = mask + attn_mask[..., :A]

    is_q8 = isinstance(cache, KVCache8)
    # fused Pallas decode attention (ops/decode_attn.py): reads the int8
    # cache directly in VMEM — XLA's path materializes a bf16 expansion of
    # every layer's cache slice to HBM (~3x the byte floor; serving-step
    # ablation in tools/perf_serving.py).  The kernel wants one combined
    # additive (B, G, A) mask, identical for every layer — build it once.
    from ...ops.decode_attn import use_kernel as _use_dattn

    use_dattn = is_q8 and unroll and _use_dattn()
    if use_dattn:
        kmask = jnp.broadcast_to(mask[:, 0], (n_beam, n_tok, A))

    def layer_body(x, kvf, sf, blk, cxk, cxv, l):
        # self-attention; qkv fused: q = [..., :S], k/v = [..., S:] (adjacent
        # so the cache column writes without a concat).  All matmuls go
        # through _mm_fused: for packed weights the layer-norm prologue and
        # bias/GELU/residual epilogues ride inside the Pallas call
        qkv = _mm_fused(x, blk["qkv_w"], dtype,
                        ln=(blk["attn_ln_w"], blk["attn_ln_b"]),
                        bias=blk["qkv_b"], eps=eps)
        kq_scale = jnp.float32(float(n_state // n_head) ** -0.25)
        q = qkv[..., :n_state]
        if parity:
            q = q * kq_scale
        qh = _split_heads(q, n_head)
        # new K/V column, head-major to match the cache layout: the fused
        # QKV projection emits K|V adjacent, so (..., 2, S) reshapes to
        # (B, T, 2, H, d) and relayouts to (B, H, 2, T, d) — a trivial
        # transpose of ONE column (vs. transposing the whole cache on read,
        # which the head-major layout exists to avoid)
        def to_col(kv2d):                            # (B, T, 2, S) ->
            return jnp.moveaxis(                     # (B, H, 2, T, d)
                kv2d.reshape((n_beam, n_tok, 2, n_head,
                              n_state // n_head)), (3, 2), (1, 2))

        kv2 = qkv[..., n_state:].reshape(qkv.shape[:-1] + (2, n_state))
        if parity:
            # scale the K half before the f16 cache store (ggml scales Kcur
            # then cpys into the f16 kv_self)
            kv2 = kv2 * jnp.array([kq_scale, 1.0],
                                  jnp.float32)[None, None, :, None]
        if is_q8:
            # int8 KV cache: per-position scales factor out of both matmuls,
            # so the attention is exact against the quantized rows.  Scales
            # are per (position, K/V) — head-independent — and K/V quantize
            # in ONE _quantize_rows pass over the (..., 2, S) view
            kvq0, kvsn = _quantize_rows(kv2)         # (B,T,2,S), (B,T,2)
            kvf = lax.dynamic_update_slice(
                kvf, to_col(kvq0)[None], (l, 0, 0, 0, kv_head, 0))
            sf = lax.dynamic_update_slice(
                sf, kvsn.transpose(0, 2, 1)[None], (l, 0, 0, kv_head))
            if use_dattn:
                from ...ops.decode_attn import self_attend_q8

                out = self_attend_q8(kvf, sf, qh, kmask, l=l, attn_ctx=A,
                                     dtype=dtype)
            else:
                kv_l = lax.dynamic_index_in_dim(kvf, l, 0, keepdims=False)
                s_l = lax.dynamic_index_in_dim(sf, l, 0, keepdims=False)
                kh = kv_l[:, :, 0, :A].astype(dtype)   # (B, H, A, d) — fuses
                vh = kv_l[:, :, 1, :A].astype(dtype)   # into the dots, no
                d = qh.shape[-1]                       # cache-wide transpose
                scores = jnp.matmul(qh.astype(dtype),
                                    jnp.swapaxes(kh, -1, -2),
                                    preferred_element_type=jnp.float32)
                scores = (scores * s_l[:, None, None, 0, :A]
                          / jnp.sqrt(jnp.float32(d)) + mask)
                probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
                probs = probs * s_l[:, None, None, 1, :A]
                out = jnp.matmul(probs.astype(dtype), vh,
                                 preferred_element_type=jnp.float32)
        else:
            kvf = lax.dynamic_update_slice(
                kvf, to_col(kv2.astype(kvf.dtype))[None],
                (l, 0, 0, 0, kv_head, 0))
            kv_l = lax.dynamic_index_in_dim(kvf, l, 0, keepdims=False)
            out = attention(qh, kv_l[:, :, 0, :A], kv_l[:, :, 1, :A], mask,
                            dtype, scale=jnp.float32(1.0) if parity else None)
        x = _mm_fused(_merge_heads(out), blk["o_w"], dtype,
                      bias=blk["o_b"], res=x)
        # cross-attention (dense or XK8 int8 planes).  When rows are
        # window-groups of xkv_group lanes (native windowxbeam batching,
        # decoding/device_loop.py), each group shares ONE per-window cross-KV
        # — queries reshape to (W, G, H, T, d) and xk/xv broadcast over the
        # lane axis instead of being materialized per lane (cross-KV is the
        # largest decode-time buffer; G-fold duplication would swamp HBM).
        q = _mm_fused(x, blk["xq_w"], dtype,
                      ln=(blk["xattn_ln_w"], blk["xattn_ln_b"]),
                      bias=blk["xq_b"], eps=eps)
        qh = _split_heads(q, n_head)
        if xkv_group > 1:
            n_rows = qh.shape[0]
            qh_g = qh.reshape((n_rows // xkv_group, xkv_group) + qh.shape[1:])
            cxk_g, cxv_g = jax.tree_util.tree_map(
                lambda a: a[:, None], (cxk, cxv))
            out = cross_attend(qh_g, cxk_g, cxv_g, dtype,
                               scale=kq_scale if parity else None)
            out = out.reshape((n_rows,) + out.shape[2:])
        else:
            out = cross_attend(qh, cxk, cxv, dtype,
                               scale=kq_scale if parity else None)
        x = _mm_fused(_merge_heads(out), blk["xo_w"], dtype,
                      bias=blk["xo_b"], res=x)
        # MLP
        h = _mm_fused(x, blk["mlp0_w"], dtype,
                      ln=(blk["mlp_ln_w"], blk["mlp_ln_b"]),
                      bias=blk["mlp0_b"], act="gelu", eps=eps, parity=parity)
        x = _mm_fused(h, blk["mlp1_w"], dtype, bias=blk["mlp1_b"], res=x)
        return x, kvf, sf

    kvf = cache.kv
    sf = cache.scale if is_q8 else jnp.zeros((), jnp.float32)
    # packed weights live as PER-LAYER buffers (a python list of dicts of
    # QWeightT), not stacked (L, ...) arrays: a Pallas custom call cannot
    # alias a slice of a stacked parameter, so stacking forces a full int8
    # copy of every weight every step (+28us/layer measured,
    # tools/perf_decode_ctx.py); whole-parameter operands alias for free
    blocks_packed = dec.get("blocks_packed")
    if unroll:
        for l in range(n_layer):
            blk, cxk, cxv = jax.tree_util.tree_map(
                lambda a: a[l], (dec["blocks"], xk, xv))
            if blocks_packed is not None:
                blk = {**blk, **blocks_packed[l]}
            x, kvf, sf = layer_body(x, kvf, sf, blk, cxk, cxv, l)
    else:
        assert blocks_packed is None, (
            "packed per-layer weights require unroll=True")
        def sbody(carry, inp):
            x, kvf, sf = carry
            blk, cxk, cxv, l = inp
            return layer_body(x, kvf, sf, blk, cxk, cxv, l), None
        (x, kvf, sf), _ = lax.scan(
            sbody, (x, kvf, sf),
            (dec["blocks"], xk, xv, jnp.arange(n_layer)))
    x = _replicate_if_meshed(x)
    if isinstance(tok_embd, QWGGML):
        x = layer_norm(x, dec["ln_w"], dec["ln_b"], eps)
        logits = _mm(x, tok_embd, dtype)
    elif isinstance(tok_embd, QWeight):
        # logits head: prefer the transposed planes (Pallas streaming
        # kernel) — the one matmul big enough that XLA would materialize
        # the dequantized weight.  The final layer-norm rides inside the
        # call as its prologue
        te_t = dec.get("tok_embd_t")
        if te_t is not None:
            logits = _mm_fused(x, te_t, dtype,
                               ln=(dec["ln_w"], dec["ln_b"]), eps=eps)
        else:
            x = layer_norm(x, dec["ln_w"], dec["ln_b"], eps)
            logits = _mm(x, tok_embd, dtype)
    else:
        x = layer_norm(x, dec["ln_w"], dec["ln_b"], eps)
        logits = _mm(x, tok_embd.T, dtype)     # (B, T, n_vocab)
    new_cache = KVCache8(kvf, sf) if is_q8 else KVCache(kvf)
    return logits.astype(jnp.float32), new_cache


def _replicate_if_meshed(x: jax.Array) -> jax.Array:
    """Constrain `x` to a replicated layout when tracing under a mesh.

    Under TP the final residual comes out of a row-parallel mlp1 as a
    PARTIAL value; without a constraint GSPMD sinks the psum past the
    logits matmul and allreduces the (B, T, n_vocab) LOGITS instead — 50x
    the bytes (1.66 MB vs 32 KB per step at S=1024/tp=4,
    tools/collective_audit.py).  Forcing replication here makes the psum
    happen on the small hidden state and the vocab matmul run redundantly
    per chip — redundant FLOPs are free at decode shapes, ICI bytes are
    not.  No-op without a mesh."""
    try:
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            from jax.interpreters import pxla

            mesh = pxla.thread_resources.env.physical_mesh
        if mesh.empty:
            return x
        from jax.sharding import PartitionSpec

        return jax.lax.with_sharding_constraint(
            x, PartitionSpec(*(None,) * x.ndim))
    except Exception:  # pragma: no cover — mesh API drift safety
        return x


def attn_ctx_buckets(n_ctx: int, n_buckets: int = 4) -> Tuple[int, ...]:
    """Static self-attention context sizes for decode_step_bucketed:
    quarters of n_ctx rounded up to the TPU lane width (128; a smaller
    granule below 256 so tiny test contexts still bucket), deduped,
    always ending at n_ctx.  For the whisper family (n_ctx=448):
    (128, 256, 384, 448)."""
    g = 128 if n_ctx >= 256 else 8
    sizes = sorted({min(-(-(n_ctx * (k + 1) // n_buckets) // g) * g,
                        n_ctx) for k in range(n_buckets)})
    return tuple(sizes)


def decode_step_bucketed(params: Dict[str, Any],
                         tokens: jax.Array,
                         positions: jax.Array,
                         kv_head: jax.Array,
                         cache,
                         xk, xv,
                         hp: WhisperHParams,
                         dtype=jnp.bfloat16,
                         unroll: bool = True,
                         attn_mask=None,
                         xkv_group: int = 1,
                         n_buckets: int = 4):
    """decode_step with a per-step BUCKETED self-attention context.

    Cache cells at or beyond kv_head + n_tok are unwritten and -inf
    masked, so the step only needs the first `occupancy` cells; a
    `lax.switch` picks the smallest static bucket >= occupancy and runs
    decode_step with that attn_ctx.  Output is numerically identical to
    the full-context step (sliced-away cells contribute exact zeros
    through the softmax).

    WARNING — do NOT call this inside a decode loop: a conditional's
    results cannot alias its operands in place, so every switch step
    pays a full cache copy at the branch merge (measured +6 ms/step at
    W=16 large-v3 vs the plain full-context step, tools/perf_bucket.py
    — MORE than bucketing saves).  The production paths bucket without
    a switch: host-driven steps pick a static attn_ctx in Python
    (runtime/context.py _get_decode) and the on-device window loops run
    one while_loop per bucket segment (device_loop.segmented_loop),
    where loop carries alias for free.  This function remains for
    single-shot calls with a traced occupancy and as the numeric
    reference for the bucketing tests (tests/test_bucketed_ctx.py)."""
    sizes = attn_ctx_buckets(hp.n_text_ctx, n_buckets)
    if len(sizes) == 1:
        return decode_step(params, tokens, positions, kv_head, cache, xk,
                           xv, hp, dtype=dtype, unroll=unroll,
                           attn_mask=attn_mask, xkv_group=xkv_group)
    occ = kv_head + tokens.shape[1]
    idx = jnp.searchsorted(jnp.asarray(sizes, jnp.int32),
                           jnp.asarray(occ, jnp.int32), side="left")
    idx = jnp.clip(idx, 0, len(sizes) - 1)

    def make_branch(a):
        def branch(tokens, positions, kv_head, cache):
            return decode_step(params, tokens, positions, kv_head, cache,
                               xk, xv, hp, dtype=dtype, unroll=unroll,
                               attn_mask=attn_mask, xkv_group=xkv_group,
                               attn_ctx=a)
        return branch

    return lax.switch(idx, [make_branch(a) for a in sizes],
                      tokens, positions, kv_head, cache)
