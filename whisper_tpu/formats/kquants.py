"""K-quant (super-block) codecs: Q2_K Q3_K Q4_K Q5_K Q6_K.

Faithful numpy ports of the reference codecs (ggml/src/ggml-quants.c):
quantize_row_q{2,3,4,5,6}_K_ref and dequantize_row_q{2,3,4,5,6}_K, with the
helper searches make_qx_quants (:628), make_q3_quants (:697) and
make_qkx2_quants (:799) vectorized over all sub-blocks of a tensor at once
(the reference's scalar loops run per 16/32-element group; here the group
axis is a numpy axis and only the small search loops remain in Python).

Block layouts (ggml/src/ggml-common.h):
  q2_K: scales[16] u8 (4+4 bit), qs[64], d f16, dmin f16           =  84 B
  q3_K: hmask[32], qs[64], scales[12] (6 bit packed), d f16        = 110 B
  q4_K: d f16, dmin f16, scales[12] (6 bit packed), qs[128]        = 144 B
  q5_K: d f16, dmin f16, scales[12], qh[32], qs[128]               = 176 B
  q6_K: ql[128], qh[64], scales[16] i8, d f16                      = 210 B
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

QK_K = 256
GROUP_MAX_EPS = 1e-15


def _f16(x):
    return np.asarray(x, np.float32).astype(np.float16)


def _f16_bytes_to_f32(b):
    return b.view(np.float16).astype(np.float32)


def _nearest_int(x):
    # the reference's magic-constant trick rounds half to even, like rint
    return np.rint(x).astype(np.int32)


# --------------------------------------------------------------------------
# vectorized helper searches
# --------------------------------------------------------------------------

def make_qx_quants(x: np.ndarray, nmax: int) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized make_qx_quants with rmse_type=1 (ggml-quants.c:628-696).

    x: (G, n).  Returns (scale (G,), L (G, n) in [0, 2*nmax-1]).
    """
    f32 = np.float32
    x = x.astype(f32)
    G, n = x.shape
    amax_idx = np.argmax(np.abs(x), axis=1)
    max_ = x[np.arange(G), amax_idx]
    amax = np.abs(max_)
    dead = amax < GROUP_MAX_EPS
    safe_max = np.where(dead, f32(1.0), max_)

    w = x * x  # rmse_type == 1

    def trial(iscale):
        l = np.clip(_nearest_int(iscale[:, None] * x), -nmax, nmax - 1)
        lf = l.astype(f32)
        # sequential f32 sums in C program order (see _seq_sum_f32)
        sumlx = _seq_sum_f32(w * x * lf)
        suml2 = _seq_sum_f32(w * lf * lf)
        return l, sumlx, suml2

    iscale0 = (f32(-nmax) / safe_max).astype(f32)
    L, sumlx, suml2 = trial(iscale0)
    scale = np.where(suml2 != 0,
                     (sumlx / np.where(suml2 == 0, f32(1.0), suml2)
                      ).astype(f32), f32(0.0))
    best = (scale * sumlx).astype(f32)
    for is_ in range(-9, 10):
        if is_ == 0:
            continue
        isc = (-(f32(nmax) + f32(0.1) * f32(is_)) / safe_max).astype(f32)
        l2, slx, sl2 = trial(isc)
        better = (sl2 > 0) & (slx * slx > best * sl2)
        L = np.where(better[:, None], l2, L)
        new_scale = np.where(
            sl2 == 0, f32(0.0),
            (slx / np.where(sl2 == 0, f32(1.0), sl2)).astype(f32))
        scale = np.where(better, new_scale, scale)
        best = np.where(better, (new_scale * slx).astype(f32), best)
    L = np.where(dead[:, None], 0, L + nmax)
    scale = np.where(dead, f32(0.0), scale)
    return scale.astype(np.float32), L


def make_q3_quants(x: np.ndarray, nmax: int) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized make_q3_quants with do_rmse=True (ggml-quants.c:697-755).

    The refinement loop updates elements sequentially with running sums; the
    element loop stays sequential (n=16) and the group axis is vectorized.
    Returns (scale (G,), L (G, n) in [0, 2*nmax-1]).
    """
    f32 = np.float32
    x = x.astype(f32)
    G, n = x.shape
    amax_idx = np.argmax(np.abs(x), axis=1)
    max_ = x[np.arange(G), amax_idx]
    amax = np.abs(max_)
    dead = amax < GROUP_MAX_EPS
    safe_max = np.where(dead, f32(1.0), max_)

    iscale = (f32(-nmax) / safe_max).astype(f32)
    L = np.clip(_nearest_int(iscale[:, None] * x), -nmax, nmax - 1)
    w = x * x
    Lf = L.astype(f32)
    sumlx = _seq_sum_f32(w * x * Lf)
    suml2 = _seq_sum_f32(w * Lf * Lf)
    for _ in range(5):
        n_changed = np.zeros(G, bool)
        for i in range(n):
            wi, xi = w[:, i], x[:, i]
            Li = L[:, i].astype(f32)
            slx = (sumlx - wi * xi * Li).astype(f32)
            sl2 = (suml2 - wi * Li * Li).astype(f32)
            new_l = np.clip(_nearest_int(
                np.where(slx > 0,
                         (xi * sl2 / np.where(slx > 0, slx, f32(1.0))
                          ).astype(f32), Li)), -nmax, nmax - 1)
            nlf = new_l.astype(f32)
            slx2 = (slx + wi * xi * nlf).astype(f32)
            sl22 = (sl2 + wi * nlf * nlf).astype(f32)
            upd = (slx > 0) & (new_l != L[:, i]) & (sl22 > 0) & \
                  (slx2 * slx2 * suml2 > sumlx * sumlx * sl22)
            L[:, i] = np.where(upd, new_l, L[:, i])
            sumlx = np.where(upd, slx2, sumlx)
            suml2 = np.where(upd, sl22, suml2)
            n_changed |= upd
        if not n_changed.any():
            break
    scale = np.where(suml2 > 0,
                     (sumlx / np.where(suml2 > 0, suml2, f32(1.0))
                      ).astype(f32), f32(0.0))
    L = np.where(dead[:, None], 0, L + nmax)
    scale = np.where(dead, f32(0.0), scale)
    return scale.astype(np.float32), L


def _seq_sum_f32(a: np.ndarray) -> np.ndarray:
    """Sequential (C-loop-order) float32 row sums.

    numpy's .sum uses pairwise summation whose f32 rounding differs from
    the reference's sequential `for` loops; cumsum accumulates strictly
    left-to-right, so its last column reproduces the C sums bit-for-bit."""
    return np.cumsum(a.astype(np.float32), axis=1, dtype=np.float32)[:, -1]


def make_qkx2_quants(x: np.ndarray, weights: np.ndarray, nmax: int,
                     rmin: float, rdelta: float, nstep: int, use_mad: bool
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized make_qkx2_quants (ggml-quants.c:799-878), byte-faithful.

    x, weights: (G, n).  Returns (scale (G,), the_min (G,), L (G, n)).

    Two properties matter for byte parity with the reference search:
      * accepted candidates FEED BACK — `min = this_min` changes both the
        iscale and the (x - min) quantization of every later step, so the
        loop threads the updated min instead of reusing the original;
      * all arithmetic is float32 in C program order (sequential sums via
        _seq_sum_f32, f32 scalar coefficients).
    """
    f32 = np.float32
    x = x.astype(f32)
    weights = weights.astype(f32)
    G, n = x.shape
    min_ = np.minimum(x.min(axis=1), f32(0.0))
    max_ = x.max(axis=1)
    sum_w = _seq_sum_f32(weights)
    sum_x = _seq_sum_f32(weights * x)
    flat = max_ == min_
    rng0 = np.where(flat, f32(1.0), max_ - min_)  # guard; flat rows masked out

    iscale = (f32(nmax) / rng0).astype(f32)
    scale = (f32(1.0) / iscale).astype(f32)
    L = np.clip(_nearest_int(iscale[:, None] * (x - min_[:, None])),
                0, nmax)

    def err(s, m, l):
        diff = (s[:, None] * l.astype(f32) + m[:, None] - x).astype(f32)
        diff = np.abs(diff) if use_mad else diff * diff
        return _seq_sum_f32(weights * diff)

    best_error = err(scale, min_, L)
    cur_min = min_.copy()  # mutated by accepted candidates (C: `min`)
    for is_ in range(nstep + 1):
        step = (f32(rmin) + f32(rdelta) * f32(is_) + f32(nmax)).astype(f32)
        rng = np.where(flat, f32(1.0), max_ - cur_min)
        isc = (step / rng).astype(f32)
        l = np.clip(_nearest_int(isc[:, None] * (x - cur_min[:, None])),
                    0, nmax)
        lf = l.astype(f32)
        sum_l = _seq_sum_f32(weights * lf)
        sum_l2 = _seq_sum_f32(weights * lf * lf)
        sum_xl = _seq_sum_f32(weights * lf * x)
        D = (sum_w * sum_l2 - sum_l * sum_l).astype(f32)
        ok = D > 0
        Dn = np.where(ok, D, f32(1.0))
        this_scale = ((sum_w * sum_xl - sum_x * sum_l) / Dn).astype(f32)
        this_min = ((sum_l2 * sum_x - sum_l * sum_xl) / Dn).astype(f32)
        pos = this_min > 0
        this_min = np.where(pos, f32(0.0), this_min)
        this_scale = np.where(
            pos, (sum_xl / np.where(sum_l2 == 0, f32(1.0), sum_l2)
                  ).astype(f32), this_scale)
        cur_error = err(this_scale, this_min, l)
        better = ok & (cur_error < best_error)
        L = np.where(better[:, None], l, L)
        best_error = np.where(better, cur_error, best_error)
        scale = np.where(better, this_scale, scale)
        cur_min = np.where(better, this_min, cur_min)

    L = np.where(flat[:, None], 0, L)
    scale = np.where(flat, f32(0.0), scale)
    the_min = np.where(flat, -min_, -cur_min)
    return scale.astype(np.float32), the_min.astype(np.float32), L


# --------------------------------------------------------------------------
# 6-bit scale packing for q4_K / q5_K (get_scale_min_k4, :880-888)
# --------------------------------------------------------------------------

def _pack_scales_k4(ls: np.ndarray, lm: np.ndarray) -> np.ndarray:
    """ls, lm: (nb, 8) 6-bit values -> (nb, 12) packed bytes."""
    nb = ls.shape[0]
    out = np.zeros((nb, 12), np.uint8)
    out[:, 0:4] = ls[:, 0:4]
    out[:, 4:8] = lm[:, 0:4]
    for j in range(4, 8):
        out[:, j + 4] = (ls[:, j] & 0xF) | ((lm[:, j] & 0xF) << 4)
        out[:, j - 4] |= (ls[:, j] >> 4) << 6
        out[:, j - 0] |= (lm[:, j] >> 4) << 6
    return out


def _unpack_scales_k4(scales: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(nb, 12) packed -> (ls (nb, 8), lm (nb, 8))."""
    nb = scales.shape[0]
    ls = np.zeros((nb, 8), np.uint8)
    lm = np.zeros((nb, 8), np.uint8)
    ls[:, 0:4] = scales[:, 0:4] & 63
    lm[:, 0:4] = scales[:, 4:8] & 63
    for j in range(4, 8):
        ls[:, j] = (scales[:, j + 4] & 0xF) | ((scales[:, j - 4] >> 6) << 4)
        lm[:, j] = (scales[:, j + 4] >> 4) | ((scales[:, j] >> 6) << 4)
    return ls, lm


# --------------------------------------------------------------------------
# Q4_K
# --------------------------------------------------------------------------

def quantize_q4_k(x: np.ndarray) -> bytes:
    """quantize_row_q4_K_ref (ggml-quants.c:1457-1528)."""
    x = np.asarray(x, np.float32).reshape(-1)
    assert x.size % QK_K == 0
    nb = x.size // QK_K
    xb = x.reshape(nb, 8, 32)
    g = xb.reshape(nb * 8, 32)

    # sequential f32 sum-of-squares, C program order (sum_x2 loop)
    av_x = np.sqrt(_seq_sum_f32(g * g) / np.float32(32)).astype(np.float32)
    weights = av_x[:, None] + np.abs(g)
    scales, mins, L = make_qkx2_quants(g, weights, 15, -1.0, 0.1, 20, False)
    scales = scales.reshape(nb, 8)
    mins = mins.reshape(nb, 8)

    max_scale = scales.max(axis=1)
    max_min = mins.max(axis=1)
    inv_scale = np.where(max_scale > 0, 63.0 / np.where(max_scale > 0, max_scale, 1), 0.0)
    inv_min = np.where(max_min > 0, 63.0 / np.where(max_min > 0, max_min, 1), 0.0)
    ls = np.minimum(63, _nearest_int(inv_scale[:, None] * scales)).astype(np.uint8)
    lm = np.minimum(63, _nearest_int(inv_min[:, None] * mins)).astype(np.uint8)
    packed_scales = _pack_scales_k4(ls, lm)
    d = _f16(max_scale / 63.0)
    dmin = _f16(max_min / 63.0)

    # re-quantize with the rounded block scales
    d_eff = d.astype(np.float32)[:, None] * ls    # (nb, 8)
    m_eff = dmin.astype(np.float32)[:, None] * lm
    safe_d = np.where(d_eff == 0, 1.0, d_eff)
    Lq = np.clip(_nearest_int((xb + m_eff[:, :, None]) / safe_d[:, :, None]),
                 0, 15)
    Lq = np.where((d_eff == 0)[:, :, None], L.reshape(nb, 8, 32), Lq)
    Lq = Lq.reshape(nb, QK_K).astype(np.uint8)

    # pack nibbles: per 64, low = L[j..j+32], high = L[j+32..j+64]
    q = np.zeros((nb, 128), np.uint8)
    for jj in range(4):
        lo = Lq[:, 64 * jj: 64 * jj + 32]
        hi = Lq[:, 64 * jj + 32: 64 * jj + 64]
        q[:, 32 * jj: 32 * jj + 32] = lo | (hi << 4)

    out = np.zeros((nb, 144), np.uint8)
    out[:, 0:2] = d.view(np.uint8).reshape(nb, 2)
    out[:, 2:4] = dmin.view(np.uint8).reshape(nb, 2)
    out[:, 4:16] = packed_scales
    out[:, 16:] = q
    return out.tobytes()


def dequantize_q4_k(buf: bytes, n: int) -> np.ndarray:
    raw = np.frombuffer(buf, np.uint8).reshape(-1, 144)
    nb = raw.shape[0]
    d = _f16_bytes_to_f32(raw[:, 0:2].copy())[:, 0]
    dmin = _f16_bytes_to_f32(raw[:, 2:4].copy())[:, 0]
    ls, lm = _unpack_scales_k4(raw[:, 4:16])
    q = raw[:, 16:]
    y = np.empty((nb, 8, 32), np.float32)
    for jj in range(4):
        qs = q[:, 32 * jj: 32 * jj + 32]
        d1 = d[:, None] * ls[:, 2 * jj][:, None]
        m1 = dmin[:, None] * lm[:, 2 * jj][:, None]
        d2 = d[:, None] * ls[:, 2 * jj + 1][:, None]
        m2 = dmin[:, None] * lm[:, 2 * jj + 1][:, None]
        y[:, 2 * jj] = d1 * (qs & 0xF) - m1
        y[:, 2 * jj + 1] = d2 * (qs >> 4) - m2
    return y.reshape(-1)[:n]


# --------------------------------------------------------------------------
# Q5_K
# --------------------------------------------------------------------------

def quantize_q5_k(x: np.ndarray) -> bytes:
    """quantize_row_q5_K_ref (ggml-quants.c:1644-1730)."""
    x = np.asarray(x, np.float32).reshape(-1)
    assert x.size % QK_K == 0
    nb = x.size // QK_K
    xb = x.reshape(nb, 8, 32)
    g = xb.reshape(nb * 8, 32)

    # sequential f32 sum-of-squares, C program order (sum_x2 loop)
    av_x = np.sqrt(_seq_sum_f32(g * g) / np.float32(32)).astype(np.float32)
    weights = av_x[:, None] + np.abs(g)
    scales, mins, L = make_qkx2_quants(g, weights, 31, -0.5, 0.1, 15, False)
    scales = scales.reshape(nb, 8)
    mins = mins.reshape(nb, 8)

    max_scale = scales.max(axis=1)
    max_min = mins.max(axis=1)
    inv_scale = np.where(max_scale > 0, 63.0 / np.where(max_scale > 0, max_scale, 1), 0.0)
    inv_min = np.where(max_min > 0, 63.0 / np.where(max_min > 0, max_min, 1), 0.0)
    ls = np.minimum(63, _nearest_int(inv_scale[:, None] * scales)).astype(np.uint8)
    lm = np.minimum(63, _nearest_int(inv_min[:, None] * mins)).astype(np.uint8)
    packed_scales = _pack_scales_k4(ls, lm)
    d = _f16(max_scale / 63.0)
    dmin = _f16(max_min / 63.0)

    d_eff = d.astype(np.float32)[:, None] * ls
    m_eff = dmin.astype(np.float32)[:, None] * lm
    safe_d = np.where(d_eff == 0, 1.0, d_eff)
    Lq = np.clip(_nearest_int((xb + m_eff[:, :, None]) / safe_d[:, :, None]),
                 0, 31)
    Lq = np.where((d_eff == 0)[:, :, None], L.reshape(nb, 8, 32), Lq)
    Lq = Lq.reshape(nb, QK_K)

    qh = np.zeros((nb, 32), np.uint8)
    ql = np.zeros((nb, 128), np.uint8)
    for nn in range(4):  # n = 0, 64, 128, 192
        l1 = Lq[:, 64 * nn: 64 * nn + 32].copy()
        l2 = Lq[:, 64 * nn + 32: 64 * nn + 64].copy()
        hi1 = l1 > 15
        hi2 = l2 > 15
        qh |= (hi1.astype(np.uint8) << (2 * nn))
        qh |= (hi2.astype(np.uint8) << (2 * nn + 1))
        l1 = np.where(hi1, l1 - 16, l1)
        l2 = np.where(hi2, l2 - 16, l2)
        ql[:, 32 * nn: 32 * nn + 32] = (l1 | (l2 << 4)).astype(np.uint8)

    out = np.zeros((nb, 176), np.uint8)
    out[:, 0:2] = d.view(np.uint8).reshape(nb, 2)
    out[:, 2:4] = dmin.view(np.uint8).reshape(nb, 2)
    out[:, 4:16] = packed_scales
    out[:, 16:48] = qh
    out[:, 48:] = ql
    return out.tobytes()


def dequantize_q5_k(buf: bytes, n: int) -> np.ndarray:
    raw = np.frombuffer(buf, np.uint8).reshape(-1, 176)
    nb = raw.shape[0]
    d = _f16_bytes_to_f32(raw[:, 0:2].copy())[:, 0]
    dmin = _f16_bytes_to_f32(raw[:, 2:4].copy())[:, 0]
    ls, lm = _unpack_scales_k4(raw[:, 4:16])
    qh = raw[:, 16:48]
    ql = raw[:, 48:]
    y = np.empty((nb, 8, 32), np.float32)
    for jj in range(4):
        qs = ql[:, 32 * jj: 32 * jj + 32]
        u1, u2 = 1 << (2 * jj), 2 << (2 * jj)
        d1 = d[:, None] * ls[:, 2 * jj][:, None]
        m1 = dmin[:, None] * lm[:, 2 * jj][:, None]
        d2 = d[:, None] * ls[:, 2 * jj + 1][:, None]
        m2 = dmin[:, None] * lm[:, 2 * jj + 1][:, None]
        y[:, 2 * jj] = d1 * ((qs & 0xF) + np.where(qh & u1, 16, 0)) - m1
        y[:, 2 * jj + 1] = d2 * ((qs >> 4) + np.where(qh & u2, 16, 0)) - m2
    return y.reshape(-1)[:n]


# --------------------------------------------------------------------------
# Q6_K
# --------------------------------------------------------------------------

def quantize_q6_k(x: np.ndarray) -> bytes:
    """quantize_row_q6_K_ref (ggml-quants.c:1869-1938)."""
    x = np.asarray(x, np.float32).reshape(-1)
    assert x.size % QK_K == 0
    nb = x.size // QK_K
    xb = x.reshape(nb, 16, 16)
    g = xb.reshape(nb * 16, 16)

    scales, L0 = make_qx_quants(g, 32)
    scales = scales.reshape(nb, 16)

    amax_idx = np.argmax(np.abs(scales), axis=1)
    max_scale = scales[np.arange(nb), amax_idx]
    max_abs = np.abs(max_scale)
    dead = max_abs < GROUP_MAX_EPS
    safe_max = np.where(dead, 1.0, max_scale)

    iscale = -128.0 / safe_max
    d = _f16(np.where(dead, 0.0, 1.0 / iscale))
    sc = np.minimum(127, _nearest_int(iscale[:, None] * scales)).astype(np.int8)
    sc = np.where(dead[:, None], 0, sc).astype(np.int8)

    d_eff = d.astype(np.float32)[:, None] * sc  # (nb, 16)
    safe_d = np.where(d_eff == 0, 1.0, d_eff)
    L = np.clip(_nearest_int(xb / safe_d[:, :, None]), -32, 31) + 32
    # zero-scale groups keep the search's codes (C `continue`,
    # ggml-quants.c:1907-1910)
    L = np.where((d_eff == 0)[:, :, None], L0.reshape(nb, 16, 16), L)
    L = L.reshape(nb, QK_K).astype(np.uint8)

    ql = np.zeros((nb, 128), np.uint8)
    qh = np.zeros((nb, 64), np.uint8)
    for half in range(2):  # j = 0, 128
        Lh = L[:, 128 * half: 128 * half + 128]
        q1, q2 = Lh[:, 0:32] & 0xF, Lh[:, 32:64] & 0xF
        q3, q4 = Lh[:, 64:96] & 0xF, Lh[:, 96:128] & 0xF
        ql[:, 64 * half: 64 * half + 32] = q1 | (q3 << 4)
        ql[:, 64 * half + 32: 64 * half + 64] = q2 | (q4 << 4)
        qh[:, 32 * half: 32 * half + 32] = (
            (Lh[:, 0:32] >> 4) | ((Lh[:, 32:64] >> 4) << 2) |
            ((Lh[:, 64:96] >> 4) << 4) | ((Lh[:, 96:128] >> 4) << 6))

    out = np.zeros((nb, 210), np.uint8)
    out[:, 0:128] = ql
    out[:, 128:192] = qh
    out[:, 192:208] = sc.view(np.uint8)
    out[:, 208:210] = d.view(np.uint8).reshape(nb, 2)
    return out.tobytes()


def dequantize_q6_k(buf: bytes, n: int) -> np.ndarray:
    raw = np.frombuffer(buf, np.uint8).reshape(-1, 210)
    nb = raw.shape[0]
    ql = raw[:, 0:128]
    qh = raw[:, 128:192]
    sc = raw[:, 192:208].copy().view(np.int8).astype(np.float32)
    d = _f16_bytes_to_f32(raw[:, 208:210].copy())[:, 0]
    y = np.empty((nb, QK_K), np.float32)
    for half in range(2):
        qlh = ql[:, 64 * half: 64 * half + 64]
        qhh = qh[:, 32 * half: 32 * half + 32]
        sch = sc[:, 8 * half: 8 * half + 8]
        q1 = ((qlh[:, 0:32] & 0xF) | (((qhh >> 0) & 3) << 4)).astype(np.int8) - 32
        q2 = ((qlh[:, 32:64] & 0xF) | (((qhh >> 2) & 3) << 4)).astype(np.int8) - 32
        q3 = ((qlh[:, 0:32] >> 4) | (((qhh >> 4) & 3) << 4)).astype(np.int8) - 32
        q4 = ((qlh[:, 32:64] >> 4) | (((qhh >> 6) & 3) << 4)).astype(np.int8) - 32
        base = 128 * half
        # scale index: is = l//16 within each 32-lane strip
        sidx = (np.arange(32) // 16)[None, :]
        for strip, q, off in ((0, q1, 0), (2, q2, 32), (4, q3, 64), (6, q4, 96)):
            s = np.take_along_axis(sch, sidx + strip, axis=1)
            y[:, base + off: base + off + 32] = d[:, None] * s * q
    return y.reshape(-1)[:n]


# --------------------------------------------------------------------------
# Q2_K
# --------------------------------------------------------------------------

def quantize_q2_k(x: np.ndarray) -> bytes:
    """quantize_row_q2_K_ref (ggml-quants.c:889-960)."""
    x = np.asarray(x, np.float32).reshape(-1)
    assert x.size % QK_K == 0
    nb = x.size // QK_K
    xb = x.reshape(nb, 16, 16)
    g = xb.reshape(nb * 16, 16)

    weights = np.abs(g)
    scales, mins, L = make_qkx2_quants(g, weights, 3, -0.5, 0.1, 15, True)
    scales = scales.reshape(nb, 16)
    mins = mins.reshape(nb, 16)

    max_scale = scales.max(axis=1)
    max_min = mins.max(axis=1)
    sc_b = np.zeros((nb, 16), np.uint8)
    d = np.zeros(nb, np.float32)
    dmin = np.zeros(nb, np.float32)
    pos_s = max_scale > 0
    isc = np.where(pos_s, 15.0 / np.where(pos_s, max_scale, 1), 0.0)
    sc_b = np.where(pos_s[:, None],
                    _nearest_int(isc[:, None] * scales), 0).astype(np.uint8)
    d = np.where(pos_s, max_scale / 15.0, 0.0)
    pos_m = max_min > 0
    im = np.where(pos_m, 15.0 / np.where(pos_m, max_min, 1), 0.0)
    lm = np.where(pos_m[:, None],
                  _nearest_int(im[:, None] * mins), 0).astype(np.uint8)
    sc_b = sc_b | (lm << 4)
    dmin = np.where(pos_m, max_min / 15.0, 0.0)
    d16, dmin16 = _f16(d), _f16(dmin)

    d_eff = d16.astype(np.float32)[:, None] * (sc_b & 0xF)
    m_eff = dmin16.astype(np.float32)[:, None] * (sc_b >> 4)
    safe_d = np.where(d_eff == 0, 1.0, d_eff)
    Lq = np.clip(_nearest_int((xb + m_eff[:, :, None]) / safe_d[:, :, None]),
                 0, 3)
    Lq = np.where((d_eff == 0)[:, :, None], L.reshape(nb, 16, 16), Lq)
    Lq = Lq.reshape(nb, QK_K).astype(np.uint8)

    qs = np.zeros((nb, 64), np.uint8)
    for half in range(2):  # j = 0, 128
        Lh = Lq[:, 128 * half: 128 * half + 128]
        qs[:, 32 * half: 32 * half + 32] = (
            Lh[:, 0:32] | (Lh[:, 32:64] << 2) | (Lh[:, 64:96] << 4) |
            (Lh[:, 96:128] << 6))

    out = np.zeros((nb, 84), np.uint8)
    out[:, 0:16] = sc_b
    out[:, 16:80] = qs
    out[:, 80:82] = d16.view(np.uint8).reshape(nb, 2)
    out[:, 82:84] = dmin16.view(np.uint8).reshape(nb, 2)
    return out.tobytes()


def dequantize_q2_k(buf: bytes, n: int) -> np.ndarray:
    raw = np.frombuffer(buf, np.uint8).reshape(-1, 84)
    nb = raw.shape[0]
    sc_b = raw[:, 0:16]
    qs = raw[:, 16:80]
    d = _f16_bytes_to_f32(raw[:, 80:82].copy())[:, 0]
    dmin = _f16_bytes_to_f32(raw[:, 82:84].copy())[:, 0]
    y = np.empty((nb, QK_K), np.float32)
    is_ = 0
    for half in range(2):
        q = qs[:, 32 * half: 32 * half + 32]
        for j in range(4):
            for sub in range(2):
                sc = sc_b[:, is_]
                dl = d * (sc & 0xF)
                ml = dmin * (sc >> 4)
                seg = ((q[:, 16 * sub: 16 * sub + 16] >> (2 * j)) & 3)
                off = 128 * half + 32 * j + 16 * sub
                y[:, off: off + 16] = dl[:, None] * seg - ml[:, None]
                is_ += 1
    return y.reshape(-1)[:n]


# --------------------------------------------------------------------------
# Q3_K
# --------------------------------------------------------------------------

def _pack_scales_q3(sc6: np.ndarray) -> np.ndarray:
    """sc6: (nb, 16) values in [0, 63] -> (nb, 12) packed
    (quantize_row_q3_K_ref, ggml-quants.c:1248-1262)."""
    nb = sc6.shape[0]
    out = np.zeros((nb, 12), np.uint8)
    for j in range(16):
        l = sc6[:, j]
        if j < 8:
            out[:, j] |= l & 0xF
        else:
            out[:, j - 8] |= (l & 0xF) << 4
        out[:, 8 + j % 4] |= (l >> 4) << (2 * (j // 4))
    return out


def _unpack_scales_q3(scales: np.ndarray) -> np.ndarray:
    """(nb, 12) -> (nb, 16) signed 6-bit scales minus 32."""
    nb = scales.shape[0]
    sc = np.zeros((nb, 16), np.int32)
    for j in range(16):
        lo = (scales[:, j] & 0xF) if j < 8 else (scales[:, j - 8] >> 4)
        hi = (scales[:, 8 + j % 4] >> (2 * (j // 4))) & 3
        sc[:, j] = (lo | (hi << 4)).astype(np.int32) - 32
    return sc


def quantize_q3_k(x: np.ndarray) -> bytes:
    """quantize_row_q3_K_ref (ggml-quants.c:1222-1304)."""
    x = np.asarray(x, np.float32).reshape(-1)
    assert x.size % QK_K == 0
    nb = x.size // QK_K
    xb = x.reshape(nb, 16, 16)
    g = xb.reshape(nb * 16, 16)

    scales, L0 = make_q3_quants(g, 4)
    scales = scales.reshape(nb, 16)

    amax_idx = np.argmax(np.abs(scales), axis=1)
    max_scale = scales[np.arange(nb), amax_idx]
    has = max_scale != 0
    safe_max = np.where(has, max_scale, 1.0)
    iscale = -32.0 / safe_max
    sc6 = np.clip(_nearest_int(iscale[:, None] * scales), -32, 31) + 32
    sc6 = np.where(has[:, None], sc6, 0).astype(np.uint8)
    packed_scales = _pack_scales_q3(sc6)
    d = _f16(np.where(has, 1.0 / iscale, 0.0))

    sc_signed = _unpack_scales_q3(packed_scales)
    d_eff = d.astype(np.float32)[:, None] * sc_signed  # (nb, 16)
    safe_d = np.where(d_eff == 0, 1.0, d_eff)
    L = np.clip(_nearest_int(xb / safe_d[:, :, None]), -4, 3) + 4
    # zero-scale groups keep the SEARCH's codes (the C `continue` skips the
    # requant, leaving make_q3_quants' L in place — ggml-quants.c:1264-1267)
    L = np.where((d_eff == 0)[:, :, None], L0.reshape(nb, 16, 16), L)
    L = L.reshape(nb, QK_K)

    # high bit -> hmask; bit column = j // 32, bit row = j % 32
    hmask = np.zeros((nb, 32), np.uint8)
    hi = (L > 3).astype(np.uint8)
    L = np.where(L > 3, L - 4, L).astype(np.uint8)
    for col in range(8):
        seg = hi[:, 32 * col: 32 * col + 32]
        hmask |= seg << col

    qs = np.zeros((nb, 64), np.uint8)
    for half in range(2):
        Lh = L[:, 128 * half: 128 * half + 128]
        qs[:, 32 * half: 32 * half + 32] = (
            Lh[:, 0:32] | (Lh[:, 32:64] << 2) | (Lh[:, 64:96] << 4) |
            (Lh[:, 96:128] << 6))

    out = np.zeros((nb, 110), np.uint8)
    out[:, 0:32] = hmask
    out[:, 32:96] = qs
    out[:, 96:108] = packed_scales
    out[:, 108:110] = d.view(np.uint8).reshape(nb, 2)
    return out.tobytes()


def dequantize_q3_k(buf: bytes, n: int) -> np.ndarray:
    raw = np.frombuffer(buf, np.uint8).reshape(-1, 110)
    nb = raw.shape[0]
    hmask = raw[:, 0:32]
    qs = raw[:, 32:96]
    sc = _unpack_scales_q3(raw[:, 96:108])
    d = _f16_bytes_to_f32(raw[:, 108:110].copy())[:, 0]
    y = np.empty((nb, QK_K), np.float32)
    is_ = 0
    m = 1
    for half in range(2):
        q = qs[:, 32 * half: 32 * half + 32]
        for j in range(4):
            for sub in range(2):
                dl = d * sc[:, is_]
                seg = ((q[:, 16 * sub: 16 * sub + 16] >> (2 * j)) & 3).astype(np.int32)
                hm = hmask[:, 16 * sub: 16 * sub + 16]
                seg = seg - np.where((hm & m) != 0, 0, 4)
                off = 128 * half + 32 * j + 16 * sub
                y[:, off: off + 16] = dl[:, None] * seg
                is_ += 1
            m <<= 1
    return y.reshape(-1)[:n]


# --------------------------------------------------------------------------
# struct-of-arrays planes (quants.unpack_to_planes K-quant leg): codes +
# per-sub-block scale (and min for the affine formats) such that
# dequant == codes * scale (+ min).  Feeds the packed decode paths
# (whisper ops/qmm, parakeet model.PQW).
# --------------------------------------------------------------------------

def to_planes(buf: bytes, ggml_type: int, rows: int, cols: int):
    """-> (codes (rows, cols) f32-exact ints, scales (rows, cols//grain),
    mins (rows, cols//grain) or None).  Grain: 32 for q4_k/q5_k (affine,
    mins NEGATIVE so value = c*s + m), 16 for q6_k (symmetric)."""
    from .quants import GGML_TYPE_Q4_K, GGML_TYPE_Q5_K, GGML_TYPE_Q6_K

    n = rows * cols
    if ggml_type == GGML_TYPE_Q4_K:
        raw = np.frombuffer(buf, np.uint8).reshape(-1, 144)
        nb = raw.shape[0]
        d = _f16_bytes_to_f32(raw[:, 0:2].copy())[:, 0]
        dmin = _f16_bytes_to_f32(raw[:, 2:4].copy())[:, 0]
        ls, lm = _unpack_scales_k4(raw[:, 4:16])
        q = raw[:, 16:]
        codes = np.empty((nb, 8, 32), np.float32)
        for jj in range(4):
            qs = q[:, 32 * jj: 32 * jj + 32]
            codes[:, 2 * jj] = qs & 0xF
            codes[:, 2 * jj + 1] = qs >> 4
        scales = d[:, None] * ls
        mins = -(dmin[:, None] * lm)
    elif ggml_type == GGML_TYPE_Q5_K:
        raw = np.frombuffer(buf, np.uint8).reshape(-1, 176)
        nb = raw.shape[0]
        d = _f16_bytes_to_f32(raw[:, 0:2].copy())[:, 0]
        dmin = _f16_bytes_to_f32(raw[:, 2:4].copy())[:, 0]
        ls, lm = _unpack_scales_k4(raw[:, 4:16])
        qh = raw[:, 16:48]
        ql = raw[:, 48:]
        codes = np.empty((nb, 8, 32), np.float32)
        for jj in range(4):
            qs = ql[:, 32 * jj: 32 * jj + 32]
            u1, u2 = 1 << (2 * jj), 2 << (2 * jj)
            codes[:, 2 * jj] = (qs & 0xF) + np.where(qh & u1, 16, 0)
            codes[:, 2 * jj + 1] = (qs >> 4) + np.where(qh & u2, 16, 0)
        scales = d[:, None] * ls
        mins = -(dmin[:, None] * lm)
    elif ggml_type == GGML_TYPE_Q6_K:
        raw = np.frombuffer(buf, np.uint8).reshape(-1, 210)
        nb = raw.shape[0]
        ql = raw[:, 0:128]
        qh = raw[:, 128:192]
        sc = raw[:, 192:208].copy().view(np.int8).astype(np.float32)
        d = _f16_bytes_to_f32(raw[:, 208:210].copy())[:, 0]
        codes = np.empty((nb, QK_K), np.float32)
        for half in range(2):
            qlh = ql[:, 64 * half: 64 * half + 64]
            qhh = qh[:, 32 * half: 32 * half + 32]
            base = 128 * half
            codes[:, base + 0: base + 32] = (
                (qlh[:, 0:32] & 0xF) | (((qhh >> 0) & 3) << 4)).astype(np.int8) - 32
            codes[:, base + 32: base + 64] = (
                (qlh[:, 32:64] & 0xF) | (((qhh >> 2) & 3) << 4)).astype(np.int8) - 32
            codes[:, base + 64: base + 96] = (
                (qlh[:, 0:32] >> 4) | (((qhh >> 4) & 3) << 4)).astype(np.int8) - 32
            codes[:, base + 96: base + 128] = (
                (qlh[:, 32:64] >> 4) | (((qhh >> 6) & 3) << 4)).astype(np.int8) - 32
        # position order matches raw scale order (16 sub-blocks of 16)
        scales = d[:, None] * sc
        mins = None
    else:
        raise NotImplementedError(f"kquants.to_planes: {ggml_type}")
    grain = QK_K // scales.shape[1] if scales.ndim == 2 else 32
    n_sub = cols // grain
    return (codes.reshape(rows, cols),
            scales.reshape(rows, n_sub),
            None if mins is None else mins.reshape(rows, n_sub))
