"""IQ4 / MXFP4 / NVFP4 / ternary (TQ) block-quant codecs — vectorized numpy.

Reference layouts and algorithms: ggml/src/ggml-common.h (block_iq4_nl:451,
block_iq4_xs:454, block_mxfp4:214, block_nvfp4:223, block_tq1_0:273,
block_tq2_0:284) and ggml/src/ggml-quants.c (quantize_row_iq4_nl_impl:4966,
quantize_iq4_xs:5116, quantize_row_mxfp4_ref:350, quantize_row_nvfp4_ref:384,
quantize_row_tq{1,2}_0_ref:2316/2382, and the matching dequantize_row_*
functions).  Quantizers reproduce the `ggml_quantize_chunk` entry points
(no importance weights), so produced bytes match the reference bit-for-bit;
dequantizers are bit-exact.

All codecs decode into the same struct-of-arrays planes as the linear
formats (quants.QTensor): the nonlinear IQ4/MXFP4 codebooks collapse into
int8 *values* (the codebook entries), so `value = codes * scale` still holds
and the fused qmm kernel can consume them unchanged.
"""

from __future__ import annotations

import numpy as np

QK4_NL = 32
QK_MXFP4 = 32
QK_K = 256
GROUP_MAX_EPS = 1e-15

# ggml-common.h:1120 kvalues_iq4nl — the non-uniform 4-bit codebook
KVALUES_IQ4NL = np.array(
    [-127, -104, -83, -65, -49, -35, -22, -10, 1, 13, 25, 38, 53, 69, 89,
     113], np.int8)
# ggml-common.h:1126 kvalues_fp4 (E2M1 magnitudes, doubled)
KVALUES_MXFP4 = np.array(
    [0, 1, 2, 3, 4, 6, 8, 12, 0, -1, -2, -3, -4, -6, -8, -12], np.int8)


def _f16(x):
    return np.asarray(x, np.float32).astype(np.float16).astype(np.float32)


def _nearest_int(x):
    """ggml nearest_int: round-half-to-even (via the 2^23 trick)."""
    return np.rint(np.asarray(x, np.float32)).astype(np.int32)


def _lround(x):
    """C lroundf: round half AWAY from zero."""
    x = np.asarray(x, np.float32)
    return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(np.int32)


def _best_index_int8(vals: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Vectorized best_index_int8 (ggml-quants.c:28): nearest entry of the
    sorted int8 codebook, ties resolving to the upper index."""
    v = vals.astype(np.float32)
    mu = np.clip(np.searchsorted(v, x, side="right"), 1, len(v) - 1)
    lo = v[mu - 1]
    hi = v[mu]
    return np.where(x - lo < hi - x, mu - 1, mu).astype(np.uint8)


def _e8m0_to_fp32_half(e: np.ndarray) -> np.ndarray:
    """ggml_e8m0_to_fp32_half (ggml-impl.h:477): 2^(e-128) with denormal
    patterns for e < 2."""
    e = np.asarray(e, np.uint32)
    bits = np.where(e < 2, np.uint32(0x00200000) << e, (e - 1) << np.uint32(23))
    return bits.astype(np.uint32).view(np.float32)


# ---------------------------------------------------------------------------
# MXFP4 — 32-elem blocks, shared E8M0 exponent + 4-bit E2M1 codes
# ---------------------------------------------------------------------------

def quantize_mxfp4(x: np.ndarray) -> bytes:
    x = np.asarray(x, np.float32).reshape(-1, QK_MXFP4)
    nb = x.shape[0]
    amax = np.abs(x).max(axis=1)
    with np.errstate(divide="ignore"):
        loga = np.floor(np.log2(np.where(amax > 0, amax, 1.0)
                                .astype(np.float32))).astype(np.int32)
    e = np.where(amax > 0, loga - 2 + 127, 0).astype(np.uint8)
    d = _e8m0_to_fp32_half(e)
    # best_index_mxfp4: first minimum of |kval*d - x| wins (strict <)
    errs = np.abs(KVALUES_MXFP4.astype(np.float32)[None, None, :]
                  * d[:, None, None] - x[:, :, None])
    idx = np.argmin(errs, axis=2).astype(np.uint8)
    lo, hi = idx[:, :16], idx[:, 16:]
    out = np.zeros((nb, 1 + 16), np.uint8)
    out[:, 0] = e
    out[:, 1:] = lo | (hi << 4)
    return out.tobytes()


def dequantize_mxfp4(buf: bytes, n: int) -> np.ndarray:
    raw = np.frombuffer(buf, np.uint8).reshape(-1, 17)
    d = _e8m0_to_fp32_half(raw[:, 0])
    qs = raw[:, 1:]
    vals = KVALUES_MXFP4.astype(np.float32)
    y = np.concatenate([vals[qs & 0x0F], vals[qs >> 4]], axis=1)
    return (y * d[:, None]).reshape(-1)[:n]


# ---------------------------------------------------------------------------
# NVFP4 — 64-elem blocks of four 16-elem sub-blocks, each with a UE4M3
# scale + 4-bit E2M1 codes (block_nvfp4, ggml-common.h:221-227)
# ---------------------------------------------------------------------------

QK_NVFP4 = 64
QK_NVFP4_SUB = 16


def _ue4m3_to_fp32(x: np.ndarray) -> np.ndarray:
    """ggml_ue4m3_to_fp32 (ggml-impl.h:502): unsigned e4m3 (bias 7), result
    halved to match the doubled kvalues_mxfp4 convention."""
    x = np.asarray(x, np.uint8)
    exp = ((x >> 3) & 0xF).astype(np.int32)
    man = (x & 0x7).astype(np.float32)
    raw = np.where(exp == 0, man * np.float32(2.0 ** -9),
                   (1.0 + man / 8.0) * np.exp2((exp - 7).astype(np.float32)))
    dead = (x == 0) | (x == 0x7F)
    return np.where(dead, 0.0, raw * 0.5).astype(np.float32)


def _fp32_to_ue4m3(x: np.ndarray) -> np.ndarray:
    """ggml_fp32_to_ue4m3 (ggml-impl.h:517): round-to-nearest on the top 3
    mantissa bits, clamp to 448, subnormals below 2^-7."""
    x = np.clip(np.asarray(x, np.float32), 0.0, 448.0)
    bits = x.view(np.uint32) if x.flags.c_contiguous else \
        np.ascontiguousarray(x).view(np.uint32)
    fp32_exp = ((bits >> 23) & 0xFF).astype(np.int32) - 127
    fp32_man = ((bits >> 20) & 0x7).astype(np.int32)
    ue_exp = fp32_exp + 7
    round_bit = ((bits >> 19) & 1).astype(np.int32)
    man = fp32_man + round_bit
    exp_r = np.where(man > 7, ue_exp + 1, ue_exp)
    man_r = np.where(man > 7, 0, man)
    normal = np.where(exp_r >= 15, 0x7E, (exp_r << 3) | man_r)
    # subnormal branch: man = (int)(x * 512 + 0.5), clamped to [flush, 7]
    sub_man = np.minimum((x * 512.0 + 0.5).astype(np.int32), 7)
    subnormal = np.where(sub_man < 1, 0, sub_man)
    out = np.where(ue_exp <= 0, subnormal,
                   np.where(ue_exp >= 15, 0x7E, normal))
    return np.where(x > 0.0, out, 0).astype(np.uint8)


def quantize_nvfp4(x: np.ndarray) -> bytes:
    x = np.asarray(x, np.float32).reshape(-1, QK_NVFP4 // QK_NVFP4_SUB,
                                          QK_NVFP4_SUB)
    nb = x.shape[0]
    amax = np.abs(x).max(axis=2)                           # (nb, 4)
    # UE4M3 scale maps the max E2M1 value (6.0) to amax
    ue = _fp32_to_ue4m3(amax / np.float32(6.0))
    d = _ue4m3_to_fp32(ue)
    # best_index_mxfp4: first minimum of |kval*d - x| wins (strict <)
    errs = np.abs(KVALUES_MXFP4.astype(np.float32)[None, None, None, :]
                  * d[:, :, None, None] - x[:, :, :, None])
    idx = np.argmin(errs, axis=3).astype(np.uint8)         # (nb, 4, 16)
    lo, hi = idx[:, :, :8], idx[:, :, 8:]
    out = np.zeros((nb, 4 + 32), np.uint8)
    out[:, :4] = ue
    out[:, 4:] = (lo | (hi << 4)).reshape(nb, 32)
    return out.tobytes()


def dequantize_nvfp4(buf: bytes, n: int) -> np.ndarray:
    raw = np.frombuffer(buf, np.uint8).reshape(-1, 36)
    nb = raw.shape[0]
    d = _ue4m3_to_fp32(raw[:, :4])                         # (nb, 4)
    qs = raw[:, 4:].reshape(nb, 4, 8)
    vals = KVALUES_MXFP4.astype(np.float32)
    y = np.concatenate([vals[qs & 0x0F], vals[qs >> 4]], axis=2)
    return (y * d[:, :, None]).reshape(-1)[:n]


# ---------------------------------------------------------------------------
# IQ4_NL / IQ4_XS — non-uniform 4-bit codebook
# ---------------------------------------------------------------------------

def _iq4_fit_blocks(xb: np.ndarray, ntry: int = 7):
    """quantize_row_iq4_nl_impl inner loop over independent 32-blocks
    (weights = x^2, no importance weights): returns per-block scale d."""
    w = xb * xb
    amax = np.abs(xb).max(axis=1)
    mx = xb[np.arange(xb.shape[0]), np.argmax(np.abs(xb), axis=1)]
    dead = amax < GROUP_MAX_EPS
    safe_max = np.where(dead, 1.0, mx)

    vals = KVALUES_IQ4NL.astype(np.float32)

    def fit(id_):
        L = _best_index_int8(KVALUES_IQ4NL, id_[:, None] * xb)
        q = vals[L]
        sumqx = (w * q * xb).sum(axis=1)
        sumq2 = (w * q * q).sum(axis=1)
        return sumqx, sumq2

    d0 = -safe_max / float(KVALUES_IQ4NL[0])
    sumqx, sumq2 = fit(1.0 / d0)
    d = np.where(sumq2 > 0, sumqx / np.where(sumq2 > 0, sumq2, 1), 0.0)
    best = d * sumqx
    for itry in range(-ntry, ntry + 1):
        id_ = (itry + float(KVALUES_IQ4NL[0])) / safe_max
        sqx, sq2 = fit(id_)
        better = (sq2 > 0) & (sqx * sqx > best * sq2)
        d = np.where(better, sqx / np.where(sq2 > 0, sq2, 1), d)
        best = np.where(better, d * sqx, best)
    return np.where(dead, 0.0, d).astype(np.float32)


def _pack_nibbles(L: np.ndarray) -> np.ndarray:
    """q4[16i+j] = L[32i+j] | L[32i+16+j] << 4 over each 32-run."""
    nb = L.shape[0]
    L = L.reshape(nb, -1, 2, 16)
    return (L[:, :, 0] | (L[:, :, 1] << 4)).reshape(nb, -1)


def quantize_iq4_nl(x: np.ndarray) -> bytes:
    x = np.asarray(x, np.float32).reshape(-1, QK4_NL)
    nb = x.shape[0]
    d = _iq4_fit_blocks(x)
    dh = _f16(d)
    id_ = np.where(d != 0, 1.0 / np.where(d != 0, d, 1), 0.0)
    L = _best_index_int8(KVALUES_IQ4NL, id_[:, None] * x)
    out = np.zeros((nb, 2 + 16), np.uint8)
    out[:, :2] = dh.astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:] = _pack_nibbles(L)
    return out.tobytes()


def dequantize_iq4_nl(buf: bytes, n: int) -> np.ndarray:
    raw = np.frombuffer(buf, np.uint8).reshape(-1, 18)
    d = raw[:, :2].copy().view(np.float16).astype(np.float32)
    qs = raw[:, 2:]
    vals = KVALUES_IQ4NL.astype(np.float32)
    y = np.concatenate([vals[qs & 0x0F], vals[qs >> 4]], axis=1)
    return (y * d).reshape(-1)[:n]


def quantize_iq4_xs(x: np.ndarray) -> bytes:
    x = np.asarray(x, np.float32).reshape(-1, QK_K)
    nb = x.shape[0]
    xb = x.reshape(nb, 8, 32)
    scales = _iq4_fit_blocks(xb.reshape(-1, 32)).reshape(nb, 8)

    # super-block scale: d = -max_scale/32 with max_scale the (first)
    # largest-|.| block scale; dh stores fp16(d) but id uses unrounded d
    pick = np.argmax(np.abs(scales), axis=1)
    max_scale = scales[np.arange(nb), pick]
    d = -max_scale / 32.0
    id_ = np.where(d != 0, 1.0 / np.where(d != 0, d, 1), 0.0)
    l = np.clip(_nearest_int(id_[:, None] * scales), -32, 31)
    dl = d[:, None] * l
    idl = np.where(dl != 0, 1.0 / np.where(dl != 0, dl, 1), 0.0)
    L = _best_index_int8(KVALUES_IQ4NL, idl[:, :, None] * xb).reshape(nb, QK_K)

    lp = (l + 32).astype(np.uint16)
    l_l, l_h = lp & 0xF, lp >> 4
    scales_l = (l_l[:, 0::2] | (l_l[:, 1::2] << 4)).astype(np.uint8)
    scales_h = np.zeros(nb, np.uint16)
    for ib in range(8):
        scales_h |= l_h[:, ib] << np.uint16(2 * ib)

    out = np.zeros((nb, 2 + 2 + 4 + 128), np.uint8)
    out[:, 0:2] = _f16(d).astype(np.float16)[:, None].view(np.uint8)
    out[:, 2:4] = scales_h[:, None].view(np.uint8)
    out[:, 4:8] = scales_l
    out[:, 8:] = _pack_nibbles(L)
    return out.tobytes()


def _iq4_xs_block_scales(raw: np.ndarray):
    d = raw[:, 0:2].copy().view(np.float16).astype(np.float32)  # (nb, 1)
    scales_h = raw[:, 2:4].copy().view(np.uint16).astype(np.uint32)
    scales_l = raw[:, 4:8]
    ls_lo = np.stack([scales_l & 0xF, scales_l >> 4], axis=2).reshape(-1, 8)
    ib = np.arange(8)
    ls_hi = ((scales_h >> (2 * ib)[None, :]) & 3).astype(np.uint8)
    ls = (ls_lo | (ls_hi << 4)).astype(np.int32)
    return d * (ls - 32)  # (nb, 8)


def dequantize_iq4_xs(buf: bytes, n: int) -> np.ndarray:
    raw = np.frombuffer(buf, np.uint8).reshape(-1, 136)
    dl = _iq4_xs_block_scales(raw)                            # (nb, 8)
    qs = raw[:, 8:].reshape(-1, 8, 16)
    vals = KVALUES_IQ4NL.astype(np.float32)
    y = np.concatenate([vals[qs & 0x0F], vals[qs >> 4]], axis=2)
    return (y * dl[:, :, None]).reshape(-1)[:n]


# ---------------------------------------------------------------------------
# TQ1_0 / TQ2_0 — ternary {-1, 0, 1} * d
# ---------------------------------------------------------------------------

_POW3 = np.array([1, 3, 9, 27, 81, 243], np.uint16)


def quantize_tq1_0(x: np.ndarray) -> bytes:
    x = np.asarray(x, np.float32).reshape(-1, QK_K)
    nb = x.shape[0]
    amax = np.abs(x).max(axis=1)
    d = amax
    id_ = np.where(d != 0, 1.0 / np.where(d != 0, d, 1), 0.0)
    xi = (_lround(x * id_[:, None]) + 1).astype(np.uint16)     # 0..2

    def pack(block, width):  # base-3 digits, n ascending = most significant
        q = np.zeros(block.shape[::2][:1] + (width,), np.uint16)
        q = np.zeros((block.shape[0], width), np.uint16)
        for nd in range(5):
            q = q * 3 + block[:, nd, :]
        return ((q * 256 + 242) // 243).astype(np.uint8)

    qs_a = pack(xi[:, :160].reshape(nb, 5, 32), 32)            # bytes 0..31
    qs_b = pack(xi[:, 160:240].reshape(nb, 5, 16), 16)         # bytes 32..47
    qh_src = xi[:, 240:].reshape(nb, 4, 4)                     # (nb, m, j)
    qh = np.zeros((nb, 4), np.uint16)
    for m in range(4):
        qh = qh * 3 + qh_src[:, m, :]
    qh = (((qh * 3) * 256 + 242) // 243).astype(np.uint8)

    out = np.zeros((nb, 48 + 4 + 2), np.uint8)
    out[:, :32] = qs_a
    out[:, 32:48] = qs_b
    out[:, 48:52] = qh
    out[:, 52:54] = _f16(d).astype(np.float16)[:, None].view(np.uint8)
    return out.tobytes()


def _tq1_digits(q: np.ndarray, n_digits: int) -> np.ndarray:
    """Decode base-3 digits from the ceil-scaled byte (dequantize_row_tq1_0):
    digit n = ((q * 3^n mod 256) * 3) >> 8, in {0,1,2}."""
    outs = []
    for nd in range(n_digits):
        qn = (q.astype(np.uint16) * _POW3[nd]) & 0xFF
        outs.append(((qn * 3) >> 8).astype(np.int8) - 1)
    return np.stack(outs, axis=1)  # (nb, n, width)


def dequantize_tq1_0(buf: bytes, n: int) -> np.ndarray:
    raw = np.frombuffer(buf, np.uint8).reshape(-1, 54)
    nb = raw.shape[0]
    d = raw[:, 52:54].copy().view(np.float16).astype(np.float32)
    ya = _tq1_digits(raw[:, :32], 5).reshape(nb, 160)
    yb = _tq1_digits(raw[:, 32:48], 5).reshape(nb, 80)
    yh = _tq1_digits(raw[:, 48:52], 4).reshape(nb, 16)
    y = np.concatenate([ya, yb, yh], axis=1).astype(np.float32)
    return (y * d).reshape(-1)[:n]


def quantize_tq2_0(x: np.ndarray) -> bytes:
    x = np.asarray(x, np.float32).reshape(-1, QK_K)
    nb = x.shape[0]
    amax = np.abs(x).max(axis=1)
    d = amax
    id_ = np.where(d != 0, 1.0 / np.where(d != 0, d, 1), 0.0)
    xi = ((_lround(x * id_[:, None]) + 1) & 3).astype(np.uint8)
    xi = xi.reshape(nb, 2, 4, 32)                              # (chunk, n, m)
    qs = (xi[:, :, 0] | (xi[:, :, 1] << 2) | (xi[:, :, 2] << 4)
          | (xi[:, :, 3] << 6)).reshape(nb, 64)
    out = np.zeros((nb, 64 + 2), np.uint8)
    out[:, :64] = qs
    out[:, 64:] = _f16(d).astype(np.float16)[:, None].view(np.uint8)
    return out.tobytes()


def dequantize_tq2_0(buf: bytes, n: int) -> np.ndarray:
    raw = np.frombuffer(buf, np.uint8).reshape(-1, 66)
    nb = raw.shape[0]
    d = raw[:, 64:66].copy().view(np.float16).astype(np.float32)
    qs = raw[:, :64].reshape(nb, 2, 32)
    y = np.stack([((qs >> (2 * l)) & 3).astype(np.int8) - 1
                  for l in range(4)], axis=2)                  # (nb, 2, l, 32)
    return (y.reshape(nb, QK_K).astype(np.float32) * d).reshape(-1)[:n]


# ---------------------------------------------------------------------------
# planes (struct-of-arrays) decoders — nonlinear codebooks collapse into
# int8 VALUES so `value = codes * scale` holds (quants.QTensor contract)
# ---------------------------------------------------------------------------

def planes_iq4_nl(buf: bytes, rows: int, cols: int):
    raw = np.frombuffer(buf, np.uint8).reshape(-1, 18)
    d = raw[:, :2].copy().view(np.float16).astype(np.float32)
    qs = raw[:, 2:]
    codes = np.concatenate([KVALUES_IQ4NL[qs & 0x0F],
                            KVALUES_IQ4NL[qs >> 4]], axis=1)
    return codes.reshape(rows, cols), d.reshape(rows, cols // 32)


def planes_mxfp4(buf: bytes, rows: int, cols: int):
    raw = np.frombuffer(buf, np.uint8).reshape(-1, 17)
    d = _e8m0_to_fp32_half(raw[:, 0])[:, None]
    qs = raw[:, 1:]
    codes = np.concatenate([KVALUES_MXFP4[qs & 0x0F],
                            KVALUES_MXFP4[qs >> 4]], axis=1)
    return codes.reshape(rows, cols), d.reshape(rows, cols // 32)


def planes_nvfp4(buf: bytes, rows: int, cols: int):
    """NVFP4 planes are at per-16 grain (one UE4M3 scale per sub-block), the
    only format whose scale grain is not 32; consumers derive the grain from
    cols // scales.shape[-1]."""
    raw = np.frombuffer(buf, np.uint8).reshape(-1, 36)
    nb = raw.shape[0]
    d = _ue4m3_to_fp32(raw[:, :4])                         # (nb, 4)
    qs = raw[:, 4:].reshape(nb, 4, 8)
    codes = np.concatenate([KVALUES_MXFP4[qs & 0x0F],
                            KVALUES_MXFP4[qs >> 4]], axis=2)
    return codes.reshape(rows, cols), d.reshape(rows, cols // 16)


def planes_iq4_xs(buf: bytes, rows: int, cols: int):
    raw = np.frombuffer(buf, np.uint8).reshape(-1, 136)
    dl = _iq4_xs_block_scales(raw)                             # per-32 scales
    qs = raw[:, 8:].reshape(-1, 8, 16)
    codes = np.concatenate([KVALUES_IQ4NL[qs & 0x0F],
                            KVALUES_IQ4NL[qs >> 4]], axis=2)
    return (codes.reshape(rows, cols),
            dl.reshape(rows, cols // 32))


def planes_tq(buf: bytes, rows: int, cols: int, ggml_type: int):
    from . import quants as Q

    fn = dequantize_tq1_0 if ggml_type == Q.GGML_TYPE_TQ1_0 else dequantize_tq2_0
    y = fn(buf, rows * cols).reshape(-1, QK_K)
    nb = y.shape[0]
    raw = np.frombuffer(buf, np.uint8).reshape(nb, -1)
    d = raw[:, -2:].copy().view(np.float16).astype(np.float32)  # (nb, 1)
    codes = np.where(d > 0, np.round(y / np.where(d > 0, d, 1)), 0).astype(np.int8)
    scales = np.repeat(d, QK_K // 32, axis=1)                   # per-32 grain
    return codes.reshape(rows, cols), scales.reshape(rows, cols // 32)


# ---------------------------------------------------------------------------
# IQ1/IQ2/IQ3 importance-matrix formats — DECODE ONLY.
#
# These formats store groups of 8 weights as indices into fixed codebook
# grids (ggml-common.h:560-1649, extracted by tools/gen_iq_grids.py into
# iq_grids.npz) plus per-group sign bits and per-32 block scales.  Encoding
# requires an importance matrix and a codebook search; whisper's own
# quantize tool never emits them (examples/common-ggml.cpp:43-246), so this
# repo supports them for *loading* ecosystem files only.  Layouts:
# ggml-common.h block_iq2_xxs:384, block_iq2_xs:392, block_iq2_s:401,
# block_iq3_xxs:410, block_iq3_s:421, block_iq1_s:430, block_iq1_m:437;
# algorithms: ggml-quants.c dequantize_row_iq*:2488-2723.
# ---------------------------------------------------------------------------

IQ1S_DELTA = 0.125

_IQ_GRIDS = None


def _grids():
    """Lazy-load codebook grids + derived sign tables."""
    global _IQ_GRIDS
    if _IQ_GRIDS is None:
        from pathlib import Path

        z = np.load(Path(__file__).parent / "iq_grids.npz")
        i = np.arange(128, dtype=np.uint8)
        parity = np.zeros(128, np.uint8)
        for b in range(7):
            parity ^= (i >> b) & 1
        ksigns = (i | (parity << 7)).astype(np.uint8)  # == ksigns_iq2xs
        kmask = (1 << np.arange(8)).astype(np.uint8)   # == kmask_iq2xs
        # ksigns-coded sign vectors (7-bit index -> ±1 over 8 lanes)
        spm_k = np.where(ksigns[:, None] & kmask[None, :], -1.0,
                         1.0).astype(np.float32)
        # raw-byte sign vectors (iq2_s / iq3_s store sign bytes directly)
        byte = np.arange(256, dtype=np.uint8)
        spm_raw = np.where(byte[:, None] & kmask[None, :], -1.0,
                           1.0).astype(np.float32)
        _IQ_GRIDS = dict(
            g2xxs=z["iq2xxs_grid"].view(np.uint8).reshape(256, 8),
            g2xs=z["iq2xs_grid"].view(np.uint8).reshape(512, 8),
            g2s=z["iq2s_grid"].view(np.uint8).reshape(1024, 8),
            g3xxs=z["iq3xxs_grid"].view(np.uint8).reshape(256, 4),
            g3s=z["iq3s_grid"].view(np.uint8).reshape(512, 4),
            g1s=z["iq1s_grid"].view(np.int8).reshape(2048, 8),
            spm_k=spm_k, spm_raw=spm_raw)
    return _IQ_GRIDS


def _f16_scale(raw2: np.ndarray) -> np.ndarray:
    return raw2.copy().view(np.float16).astype(np.float32)[:, 0]


def dequantize_iq2_xxs(buf: bytes, n: int) -> np.ndarray:
    g = _grids()
    nb = n // QK_K
    a = np.frombuffer(buf, np.uint8).reshape(nb, 66)
    d = _f16_scale(a[:, :2])                                  # (nb,)
    qs = a[:, 2:].copy().view("<u2").reshape(nb, 8, 4).astype(np.uint32)
    aux0 = qs[:, :, 0] | (qs[:, :, 1] << 16)                  # grid bytes
    aux1 = qs[:, :, 2] | (qs[:, :, 3] << 16)                  # signs+scale
    db = d[:, None] * (0.5 + (aux1 >> 28)) * 0.25             # (nb, 8)
    lshift = 8 * np.arange(4, dtype=np.uint32)
    idx = (aux0[..., None] >> lshift) & 255                   # (nb, 8, 4)
    sidx = (aux1[..., None] >> (7 * np.arange(4, dtype=np.uint32))) & 127
    y = (db[..., None, None] * g["g2xxs"][idx] * g["spm_k"][sidx])
    return y.reshape(n).astype(np.float32)


def dequantize_iq2_xs(buf: bytes, n: int) -> np.ndarray:
    g = _grids()
    nb = n // QK_K
    a = np.frombuffer(buf, np.uint8).reshape(nb, 74)
    d = _f16_scale(a[:, :2])
    qs = a[:, 2:66].copy().view("<u2").reshape(nb, 8, 4)
    sc = a[:, 66:74]                                          # (nb, 8)
    db0 = d[:, None] * (0.5 + (sc & 0xF)) * 0.25
    db1 = d[:, None] * (0.5 + (sc >> 4)) * 0.25
    db = np.stack([db0, db0, db1, db1], axis=-1)              # (nb, 8, 4)
    idx = qs & 511
    sidx = qs >> 9
    y = db[..., None] * g["g2xs"][idx] * g["spm_k"][sidx]
    return y.reshape(n).astype(np.float32)


def dequantize_iq2_s(buf: bytes, n: int) -> np.ndarray:
    g = _grids()
    nb = n // QK_K
    a = np.frombuffer(buf, np.uint8).reshape(nb, 82)
    d = _f16_scale(a[:, :2])
    qs = a[:, 2:34].reshape(nb, 8, 4).astype(np.uint16)
    signs = a[:, 34:66].reshape(nb, 8, 4)
    qh = a[:, 66:74].astype(np.uint16)                        # (nb, 8)
    sc = a[:, 74:82]
    db0 = d[:, None] * (0.5 + (sc & 0xF)) * 0.25
    db1 = d[:, None] * (0.5 + (sc >> 4)) * 0.25
    db = np.stack([db0, db0, db1, db1], axis=-1)
    shift = (8 - 2 * np.arange(4, dtype=np.uint16))
    idx = qs | ((qh[..., None] << shift) & 0x300)
    y = db[..., None] * g["g2s"][idx] * g["spm_raw"][signs]
    return y.reshape(n).astype(np.float32)


def dequantize_iq3_xxs(buf: bytes, n: int) -> np.ndarray:
    g = _grids()
    nb = n // QK_K
    a = np.frombuffer(buf, np.uint8).reshape(nb, 98)
    d = _f16_scale(a[:, :2])
    qs = a[:, 2:66].reshape(nb, 8, 8)                         # grid bytes
    aux = a[:, 66:98].copy().view("<u4").reshape(nb, 8)       # per-ib32
    db = d[:, None] * (0.5 + (aux >> 28)) * 0.5               # (nb, 8)
    sidx = (aux[..., None] >> (7 * np.arange(4, dtype=np.uint32))) & 127
    vals = g["g3xxs"][qs].reshape(nb, 8, 4, 8)                # pairs of 4
    y = db[..., None, None] * vals * g["spm_k"][sidx]
    return y.reshape(n).astype(np.float32)


def dequantize_iq3_s(buf: bytes, n: int) -> np.ndarray:
    g = _grids()
    nb = n // QK_K
    a = np.frombuffer(buf, np.uint8).reshape(nb, 110)
    d = _f16_scale(a[:, :2])
    qs = a[:, 2:66].reshape(nb, 8, 8).astype(np.uint16)
    qh = a[:, 66:74].astype(np.uint16)                        # (nb, 8)
    signs = a[:, 74:106].reshape(nb, 8, 4)
    sc = a[:, 106:110]                                        # (nb, 4)
    db_lo = d[:, None] * (1 + 2 * (sc & 0xF).astype(np.float32))
    db_hi = d[:, None] * (1 + 2 * (sc >> 4).astype(np.float32))
    db = np.stack([db_lo, db_hi], axis=-1).reshape(nb, 8)     # per ib32
    m = np.arange(8, dtype=np.uint16)
    idx = qs | (((qh[..., None] >> m) & 1) << 8)
    vals = g["g3s"][idx].reshape(nb, 8, 4, 8)
    y = db[..., None, None] * vals * g["spm_raw"][signs]
    return y.reshape(n).astype(np.float32)


def dequantize_iq1_s(buf: bytes, n: int) -> np.ndarray:
    g = _grids()
    nb = n // QK_K
    a = np.frombuffer(buf, np.uint8).reshape(nb, 50)
    d = _f16_scale(a[:, :2])
    qs = a[:, 2:34].reshape(nb, 8, 4).astype(np.uint16)
    qh = a[:, 34:50].copy().view("<u2").reshape(nb, 8)        # per ib
    dl = d[:, None] * (2 * ((qh >> 12) & 7).astype(np.float32) + 1)
    delta = np.where(qh & 0x8000, -IQ1S_DELTA, IQ1S_DELTA)    # (nb, 8)
    shift = 3 * np.arange(4, dtype=np.uint16)
    idx = qs | (((qh[..., None] >> shift) & 7) << 8)
    vals = g["g1s"][idx].astype(np.float32)                   # (nb, 8, 4, 8)
    y = dl[..., None, None] * (vals + delta[..., None, None])
    return y.reshape(n).astype(np.float32)


def dequantize_iq1_m(buf: bytes, n: int) -> np.ndarray:
    g = _grids()
    nb = n // QK_K
    a = np.frombuffer(buf, np.uint8).reshape(nb, 56)
    qs = a[:, :32].reshape(nb, 8, 4).astype(np.uint16)
    qh = a[:, 32:48].reshape(nb, 8, 2)                        # per ib: 2 bytes
    sc = a[:, 48:56].copy().view("<u2").reshape(nb, 4).astype(np.uint32)
    d16 = ((sc[:, 0] >> 12) | ((sc[:, 1] >> 8) & 0x00F0) |
           ((sc[:, 2] >> 4) & 0x0F00) | (sc[:, 3] & 0xF000)).astype(np.uint16)
    d = d16.view(np.float16).astype(np.float32)               # (nb,)

    ib = np.arange(8)
    nib_shift = 6 * (ib % 2)                                  # (8,)
    sc_ib = sc[:, ib // 2]                                    # (nb, 8)
    dl1 = d[:, None] * (2 * ((sc_ib >> nib_shift) & 7).astype(np.float32) + 1)
    dl2 = d[:, None] * (2 * ((sc_ib >> (nib_shift + 3)) & 7
                             ).astype(np.float32) + 1)
    dl = np.stack([dl1, dl1, dl2, dl2], axis=-1)              # (nb, 8, 4)

    qh0 = qh[:, :, 0].astype(np.uint16)
    qh1 = qh[:, :, 1].astype(np.uint16)
    idx = np.stack([
        qs[:, :, 0] | ((qh0 << 8) & 0x700),
        qs[:, :, 1] | ((qh0 << 4) & 0x700),
        qs[:, :, 2] | ((qh1 << 8) & 0x700),
        qs[:, :, 3] | ((qh1 << 4) & 0x700)], axis=-1)         # (nb, 8, 4)
    delta = np.stack([
        np.where(qh0 & 0x08, -IQ1S_DELTA, IQ1S_DELTA),
        np.where(qh0 & 0x80, -IQ1S_DELTA, IQ1S_DELTA),
        np.where(qh1 & 0x08, -IQ1S_DELTA, IQ1S_DELTA),
        np.where(qh1 & 0x80, -IQ1S_DELTA, IQ1S_DELTA)], axis=-1)
    vals = g["g1s"][idx].astype(np.float32)                   # (nb, 8, 4, 8)
    y = dl[..., None] * (vals + delta[..., None])
    return y.reshape(n).astype(np.float32)
