"""Parakeet FastConformer-TDT forward passes in JAX.

Reference graphs: parakeet_build_graph_encode (src/parakeet.cpp:1525-1972),
parakeet_build_graph_lstm_layer (:2144-2240), parakeet_build_graph_prediction
(:2242-2300), parakeet_build_graph_joint (:2302-2358).

TPU-first mapping:
  * the conv-subsampling stem and conformer blocks run as one jitted function
    over the whole utterance (big MXU matmuls, XLA-fused elementwise);
  * relative-position attention uses a gather-based Transformer-XL shift
    instead of ggml's pad/roll/view stride tricks;
  * long audio (> LOCAL_ATTN_THRESHOLD frames) switches to the chunked banded
    local attention (window +-128), computed with dense chunk matmuls plus a
    band gather/scatter — O(T * window) like the reference's strided-view
    scheme (src/parakeet.cpp:1694-1806), no O(T^2) blowup;
  * layers fold into a lax.scan over a stacked parameter pytree.
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .hparams import LOCAL_ATTN_THRESHOLD, LOCAL_ATTN_WINDOW, ParakeetHParams

MASK_VALUE = -1e30


class PQW(NamedTuple):
    """Packed conformer weight (load.build_packed_overlay): int8/uint8 codes
    in file orientation (out, in), per-block scales (out, in//B) and, for
    affine K-quant formats, per-block mins.  The dequant
    (codes * scale [+ min]) runs fused into the matmul — quantized parakeet
    files keep their weights block-quantized in HBM instead of load-time
    dequantizing (the reference quantizes parakeet incl. K-quants,
    examples/parakeet-quantize, tests/run-tests.sh:25)."""

    codes: jax.Array
    scales: jax.Array
    mins: Optional[jax.Array] = None


def _pmm(x, w, dtype):
    """x @ W^T for a dense (out, in) weight or a PQW packed plane."""
    if isinstance(w, PQW):
        out, nb = w.scales.shape
        grain = w.codes.shape[-1] // nb
        wd = (w.codes.astype(dtype).reshape(out, nb, grain)
              * w.scales.astype(dtype)[..., None])
        if w.mins is not None:
            wd = wd + w.mins.astype(dtype)[..., None]
        return x @ wd.reshape(out, -1).T
    return x @ w.astype(dtype).T


def _ln(x, w, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * w + b


def _silu(x):
    return x * jax.nn.sigmoid(x)


# --------------------------------------------------------------------------
# conv subsampling stem (src/parakeet.cpp:1545-1599)
# --------------------------------------------------------------------------

def pre_encode(pre: Dict[str, jax.Array], mel: jax.Array, hp: ParakeetHParams,
               dtype=jnp.float32) -> jax.Array:
    """mel: (n_time, n_mels) -> (n_frames, n_state).

    NCHW with H=time, W=freq; three stride-2 stages: full 3x3 conv,
    then two (depthwise 3x3 stride 2 -> pointwise 1x1) pairs, relu after
    each stage; flatten (C, F) with F innermost; linear to n_state.
    """
    x = mel.astype(dtype)[None, None, :, :]  # [1, 1, T, F]

    def conv(x, w, b, stride, pad, groups=1):
        y = jax.lax.conv_general_dilated(
            x, w.astype(dtype), window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=groups)
        return y + b.astype(dtype)[None, :, None, None]

    ch = hp.n_subsampling_channels
    x = jax.nn.relu(conv(x, pre["conv0_w"], pre["conv0_b"], 2, 1))
    x = conv(x, pre["conv2_w"], pre["conv2_b"], 2, 1, groups=ch)
    x = jax.nn.relu(conv(x, pre["conv3_w"], pre["conv3_b"], 1, 0))
    x = conv(x, pre["conv5_w"], pre["conv5_b"], 2, 1, groups=ch)
    x = jax.nn.relu(conv(x, pre["conv6_w"], pre["conv6_b"], 1, 0))

    # [1, C, T', F'] -> [T', C*F'] with F' innermost (ggml permute+reshape,
    # src/parakeet.cpp:1586-1596)
    x = x[0].transpose(1, 0, 2)  # [T', C, F']
    x = x.reshape(x.shape[0], -1)
    return _pmm(x, pre["out_w"], dtype) + pre["out_b"].astype(dtype)


# --------------------------------------------------------------------------
# relative positional encoding (src/parakeet.cpp:2063-2092, 1629-1645)
# --------------------------------------------------------------------------

def _pos_embedding(window_size: int, max_rel: int, n_state: int, dtype):
    """pos_emb[w] for relative positions max_rel, max_rel-1, ..., -(max_rel);
    interleaved (sin, cos) pairs along the state dim."""
    d_half = n_state // 2
    k = jnp.arange(d_half, dtype=jnp.float32)
    freqs = jnp.exp(-(2.0 * k) * math.log(10000.0) / n_state)
    rel = (max_rel - jnp.arange(window_size, dtype=jnp.float32))
    theta = rel[:, None] * freqs[None, :]  # [w, d_half]
    emb = jnp.stack([jnp.sin(theta), jnp.cos(theta)], axis=-1)
    return emb.reshape(window_size, n_state).astype(dtype)


def _rel_attention_global(x, layer, n_head: int, mask_1d, dtype):
    """Full rel-pos MHA (src/parakeet.cpp:1808-1900).

    x: [T, S]; mask_1d: [T] additive key mask (0 valid / -1e30 pad).
    """
    T, S = x.shape
    d_head = S // n_head
    scale = 1.0 / math.sqrt(d_head)

    q = _pmm(x, layer["attn_q_w"], dtype).reshape(T, n_head, d_head)
    k = _pmm(x, layer["attn_k_w"], dtype).reshape(T, n_head, d_head)
    v = _pmm(x, layer["attn_v_w"], dtype).reshape(T, n_head, d_head)

    window = 2 * T - 1
    pos_emb = _pos_embedding(window, T - 1, S, dtype)  # [w, S]
    pos = _pmm(pos_emb, layer["attn_pos_w"], dtype)
    pos = pos.reshape(window, n_head, d_head)

    q_u = q + layer["pos_bias_u"].astype(dtype)[None]  # [T, h, d]
    q_v = q + layer["pos_bias_v"].astype(dtype)[None]

    content = jnp.einsum("qhd,khd->hqk", q_u, k)
    rel = jnp.einsum("qhd,whd->hqw", q_v, pos)  # [h, T, 2T-1]

    # Transformer-XL shift: score[q, k] = rel[q, T-1 - q + k], via the
    # classic pad/reshape skew — pure data movement XLA lowers to cheap
    # copies.  (A take_along_axis gather here lowered to a generic TPU
    # gather costing ~13.5 ms/layer — 325 ms of the round-3 332 ms encode;
    # tools/perf_parakeet.py 'noshift' ablation.)
    rel_shifted = jnp.pad(rel, ((0, 0), (0, 0), (1, 0)))   # [h, T, 2T]
    rel_shifted = rel_shifted.reshape(n_head, 2 * T, T)[:, 1:, :]
    rel_shifted = rel_shifted.reshape(n_head, T, 2 * T - 1)[:, :, :T]

    scores = (content + rel_shifted) * scale + mask_1d[None, None, :]
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("hqk,khd->qhd", probs, v).reshape(T, S)
    return _pmm(out, layer["attn_out_w"], dtype)


def _rel_attention_local(x, layer, n_head: int, valid_1d, dtype):
    """Banded local attention, window +-LOCAL_ATTN_WINDOW
    (src/parakeet.cpp:1694-1806).

    valid_1d: [T] boolean key validity. Chunked scheme: queries in groups of
    C = 2W; each group's keys span [g*C - W, g*C + C + W) (C + 2W keys); the
    band (q's window) is extracted from the dense chunk scores by a diagonal
    gather, softmaxed over the window, and scattered back with the classic
    flatten-skew for the value matmul.
    """
    T, S = x.shape
    d_head = S // n_head
    W = LOCAL_ATTN_WINDOW
    C = 2 * W                      # chunk (att_left + att_right)
    win = 2 * W + 1                # window_size
    n_kv = C + win - 1             # keys per chunk (= C + 2W)
    scale = 1.0 / math.sqrt(d_head)

    n_group = (T + C - 1) // C
    Tp = n_group * C

    q = _pmm(x, layer["attn_q_w"], dtype).reshape(T, n_head, d_head)
    k = _pmm(x, layer["attn_k_w"], dtype).reshape(T, n_head, d_head)
    v = _pmm(x, layer["attn_v_w"], dtype).reshape(T, n_head, d_head)

    pos_emb = _pos_embedding(win, W, S, dtype)
    pos = _pmm(pos_emb, layer["attn_pos_w"], dtype)
    pos = pos.reshape(win, n_head, d_head)

    q_u = q + layer["pos_bias_u"].astype(dtype)[None]
    q_v = q + layer["pos_bias_v"].astype(dtype)[None]

    # rel-pos scores: [h, T, win]
    rel = jnp.einsum("qhd,whd->hqw", q_v, pos)

    # pad queries to groups, pad keys by W on both sides
    q_u = jnp.pad(q_u, ((0, Tp - T), (0, 0), (0, 0)))
    kp = jnp.pad(k, ((W, W + (Tp - T)), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((W, W + (Tp - T)), (0, 0), (0, 0)))

    # gather per-group key/value chunks: [g, n_kv, h, d]
    gidx = jnp.arange(n_group)[:, None] * C + jnp.arange(n_kv)[None, :]
    k_chunk = kp[gidx]
    v_chunk = vp[gidx]
    q_g = q_u.reshape(n_group, C, n_head, d_head)

    dense = jnp.einsum("gqhd,gkhd->hgqk", q_g, k_chunk)  # [h, g, C, n_kv]

    # band extraction: band[q, w] = dense[q, q + w], w in [0, win), via the
    # flatten-skew trick (row q starts at q*(n_kv+1) in the padded flat
    # view) — the take_along_axis form of this diagonal gather is the op
    # that cost the global path 325 ms/encode (tools/perf_parakeet.py)
    band = dense.reshape(n_head, n_group, C * n_kv)
    band = jnp.pad(band, ((0, 0), (0, 0), (0, C)))
    band = band.reshape(n_head, n_group, C, n_kv + 1)[..., :win]
    band = band.reshape(n_head, Tp, win)[:, :T, :]

    scores = (band + rel) * scale

    # key validity mask: key = q - W + w
    keys = jnp.arange(T)[:, None] - W + jnp.arange(win)[None, :]
    ok = (keys >= 0) & (keys < T) & jnp.where(
        (keys >= 0) & (keys < T), valid_1d[jnp.clip(keys, 0, T - 1)], False)
    scores = jnp.where(ok[None], scores, MASK_VALUE)
    probs = jax.nn.softmax(scores, axis=-1)

    # scatter band back to dense chunk layout via the flatten-skew trick:
    # pad rows to win + C, flatten, trim, reshape -> row q shifted right by q
    pb = jnp.pad(probs, ((0, 0), (0, Tp - T), (0, 0)))
    pb = pb.reshape(n_head, n_group, C, win)
    pb = jnp.pad(pb, ((0, 0), (0, 0), (0, 0), (0, n_kv + 1 - win)))
    pb = pb.reshape(n_head, n_group, C * (n_kv + 1))[:, :, :C * n_kv]
    pdense = pb.reshape(n_head, n_group, C, n_kv)

    out = jnp.einsum("hgqk,gkhd->gqhd", pdense, v_chunk)
    out = out.reshape(Tp, S)[:T]
    return _pmm(out, layer["attn_out_w"], dtype)


# --------------------------------------------------------------------------
# conformer block (src/parakeet.cpp:1647-1965)
# --------------------------------------------------------------------------

def _conv_module(x, layer, hp: ParakeetHParams, dtype):
    T, S = x.shape
    cur = _ln(x, layer["norm_conv_w"].astype(dtype),
              layer["norm_conv_b"].astype(dtype), hp.eps)
    cur = _pmm(cur, layer["conv_pw1_w"], dtype)  # [T, 2S]
    signal, gate = cur[:, :S], cur[:, S:]
    cur = signal * jax.nn.sigmoid(gate)

    # depthwise 1d conv, 'same' symmetric padding (ggml pad/roll/pad + ssm_conv)
    pad = (hp.n_conv_kernel - 1) // 2
    padded = jnp.pad(cur, ((pad, pad), (0, 0)))
    k = layer["conv_dw_w"].astype(dtype)  # [S, kernel]
    taps = [padded[j:j + T, :] * k[:, j][None, :]
            for j in range(hp.n_conv_kernel)]
    cur = sum(taps)

    # batch-norm inference: (x - mean) / sqrt(var) * w + b — no eps
    # (src/parakeet.cpp:1940-1945)
    cur = (cur - layer["conv_bn_mean"].astype(dtype)) / jnp.sqrt(
        layer["conv_bn_var"].astype(dtype))
    cur = cur * layer["conv_bn_w"].astype(dtype) + layer["conv_bn_b"].astype(dtype)
    cur = _silu(cur)
    return _pmm(cur, layer["conv_pw2_w"], dtype)


def _ffn(x, norm_w, norm_b, lin1, lin2, eps, dtype):
    cur = _ln(x, norm_w.astype(dtype), norm_b.astype(dtype), eps)
    cur = _silu(_pmm(cur, lin1, dtype))
    return _pmm(cur, lin2, dtype)


def conformer_block(x, layer, hp: ParakeetHParams, mask_or_valid, local: bool,
                    dtype):
    fc = 0.5
    x = x + fc * _ffn(x, layer["norm_ff1_w"], layer["norm_ff1_b"],
                      layer["ff1_lin1_w"], layer["ff1_lin2_w"], hp.eps, dtype)
    cur = _ln(x, layer["norm_attn_w"].astype(dtype),
              layer["norm_attn_b"].astype(dtype), hp.eps)
    if local:
        attn = _rel_attention_local(cur, layer, hp.n_audio_head,
                                    mask_or_valid, dtype)
    else:
        attn = _rel_attention_global(cur, layer, hp.n_audio_head,
                                     mask_or_valid, dtype)
    x = x + attn
    x = x + _conv_module(x, layer, hp, dtype)
    x = x + fc * _ffn(x, layer["norm_ff2_w"], layer["norm_ff2_b"],
                      layer["ff2_lin1_w"], layer["ff2_lin2_w"], hp.eps, dtype)
    return _ln(x, layer["norm_out_w"].astype(dtype),
               layer["norm_out_b"].astype(dtype), hp.eps)


def encode(params: Dict[str, Any], mel: jax.Array, n_len_org,
           hp: ParakeetHParams, dtype=jnp.float32,
           unroll: bool = True) -> jax.Array:
    """Full encoder: mel (n_time, n_mels) -> (n_frames, n_state).

    n_len_org: original (unpadded) mel frame count; keys beyond
    ceil(n_len_org / subsampling) are masked (src/parakeet.cpp:2016-2042).

    unroll=True python-unrolls the 24-layer loop instead of lax.scan:
    XLA then CSEs the per-layer pos-embedding/skew prologue and drops the
    scan's carry copies — measured 7.6 -> 5.2 ms/30 s on v5e
    (tools/perf_parakeet.py, docs/PERF.md parakeet anatomy).  Set False
    for memory-tight training-style use (scan + remat)."""
    x = pre_encode(params["pre"], mel, hp, dtype)
    T = x.shape[0]
    n_real = (n_len_org + hp.subsampling_factor - 1) // hp.subsampling_factor

    local = T > LOCAL_ATTN_THRESHOLD
    if local:
        mask_or_valid = jnp.arange(T) < n_real
    else:
        mask_or_valid = jnp.where(jnp.arange(T) < n_real, 0.0, MASK_VALUE
                                  ).astype(dtype)

    if unroll:
        L = jax.tree_util.tree_leaves(params["layers"])[0].shape[0]
        for il in range(L):
            layer = jax.tree_util.tree_map(lambda a, _il=il: a[_il],
                                           params["layers"])
            x = conformer_block(x, layer, hp, mask_or_valid, local, dtype)
        return x

    def body(carry, layer):
        return conformer_block(carry, layer, hp, mask_or_valid, local,
                               dtype), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return x


# --------------------------------------------------------------------------
# prediction network + joint (src/parakeet.cpp:2144-2358)
# --------------------------------------------------------------------------

def lstm_predict(pred: Dict[str, jax.Array], joint: Dict[str, jax.Array],
                 token, h, c, hp: ParakeetHParams, dtype=jnp.float32):
    """One prediction-network step for `token`.

    h, c: [n_pred_layers, n_pred_dim]. Gates are packed [i, f, o, g]
    (reordered at conversion, models/convert-parakeet-to-ggml.py:300-309);
    bias is the folded ih+hh sum.  Returns (pred_out, h', c').
    """
    D = hp.n_pred_dim
    x = pred["embed_w"].astype(dtype)[token]

    hs, cs = [], []
    for il in range(hp.n_pred_layers):
        gates = (x @ pred["lstm_ih_w"][il].astype(dtype).T
                 + h[il] @ pred["lstm_hh_w"][il].astype(dtype).T
                 + pred["lstm_b_h"][il].astype(dtype))
        i_t = jax.nn.sigmoid(gates[0 * D:1 * D])
        f_t = jax.nn.sigmoid(gates[1 * D:2 * D])
        o_t = jax.nn.sigmoid(gates[2 * D:3 * D])
        g_t = jnp.tanh(gates[3 * D:4 * D])
        c_new = f_t * c[il] + i_t * g_t
        h_new = o_t * jnp.tanh(c_new)
        hs.append(h_new)
        cs.append(c_new)
        x = h_new

    pred_out = x @ joint["pred_w"].astype(dtype).T + joint["pred_b"].astype(dtype)
    return pred_out, jnp.stack(hs), jnp.stack(cs)


def joint_logits(joint: Dict[str, jax.Array], enc_t: jax.Array,
                 pred_out: jax.Array, dtype=jnp.float32) -> jax.Array:
    """logits over vocab + blank + durations (src/parakeet.cpp:2302-2352)."""
    enc = enc_t @ joint["enc_w"].astype(dtype).T + joint["enc_b"].astype(dtype)
    h = jax.nn.relu(enc + pred_out)
    return h @ joint["net_w"].astype(dtype).T + joint["net_b"].astype(dtype)
