"""Fused dequant-matmul kernel tests (interpret mode on CPU; the same kernel
compiles for TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisper_tpu.formats import quants
from whisper_tpu.ops.qmm import QK, QWeight, dequantize_qweight, from_qtensor, qmm


def _random_qweight(rng, R, K, qtype=quants.GGML_TYPE_Q5_0):
    w = (rng.standard_normal((R, K)) * 0.5).astype(np.float32)
    packed = quants.quantize(w, qtype)
    qt = quants.unpack_to_planes(packed, qtype, (R, K))
    return from_qtensor(qt), quants.dequantize(packed, qtype, R * K).reshape(R, K)


@pytest.mark.parametrize("T,R,K", [(1, 64, 64), (7, 100, 128),
                                   (16, 512, 384), (3, 1000, 96)])
def test_qmm_matches_dense(T, R, K):
    rng = np.random.default_rng(0)
    qw, w_ref = _random_qweight(rng, R, K)
    x = (rng.standard_normal((T, K)) * 0.3).astype(np.float32)

    y = np.asarray(qmm(jnp.asarray(x), qw.codes, qw.scales,
                       block_t=8, block_r=128,
                       dtype=jnp.float32, interpret=True))
    y_ref = x @ w_ref.T
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)


def test_qmm_q8_0():
    rng = np.random.default_rng(1)
    qw, w_ref = _random_qweight(rng, 96, 160, quants.GGML_TYPE_Q8_0)
    x = rng.standard_normal((5, 160)).astype(np.float32)
    y = np.asarray(qmm(jnp.asarray(x), qw.codes, qw.scales,
                       block_t=8, block_r=96,
                       dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(y, x @ w_ref.T, rtol=1e-4, atol=1e-4)


def test_dequantize_qweight_roundtrip():
    rng = np.random.default_rng(2)
    qw, w_ref = _random_qweight(rng, 32, 64)
    dense = np.asarray(dequantize_qweight(qw))
    np.testing.assert_allclose(dense, w_ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("qtype", [quants.GGML_TYPE_Q4_1,
                                   quants.GGML_TYPE_Q5_1,
                                   quants.GGML_TYPE_Q4_K,
                                   quants.GGML_TYPE_Q5_K,
                                   quants.GGML_TYPE_Q6_K])
def test_affine_packed_paths_match_dense(qtype):
    """Affine/K-quant formats ride the packed path with their mins plane
    (round-5; previously from_qtensor raised and the overlay silently fell
    back to dense).  Every consumer — dense expand, XLA-fused qmm_auto,
    interpreted Pallas qmmt, and the embedding gather — must reproduce the
    reference dequantization."""
    from whisper_tpu.ops.qmm import (QWeightT, embed_lookup, qmm_auto, qmmt)

    rng = np.random.default_rng(3)
    R, K = 16, 512
    w = rng.standard_normal((R, K)).astype(np.float32)
    packed = quants.quantize(w, qtype)
    qt = quants.unpack_to_planes(packed, qtype, (R, K))
    qw = from_qtensor(qt)
    if qtype == quants.GGML_TYPE_Q6_K:
        assert qw.mins is None
    else:
        assert qw.mins is not None
    ref = quants.dequantize(packed, qtype, w.size).reshape(R, K)
    np.testing.assert_allclose(np.asarray(dequantize_qweight(qw)), ref,
                               rtol=1e-6, atol=1e-6)
    x = rng.standard_normal((4, K)).astype(np.float32)
    y_ref = x @ ref.T
    tol = dict(rtol=2e-6, atol=2e-5 * np.abs(y_ref).max())
    np.testing.assert_allclose(
        np.asarray(qmm_auto(jnp.asarray(x), qw, dtype=jnp.float32)),
        y_ref, **tol)
    qwt = QWeightT(jnp.swapaxes(qw.codes, 0, 1),
                   jnp.swapaxes(qw.scales, 0, 1),
                   None if qw.mins is None
                   else jnp.swapaxes(qw.mins, 0, 1))
    np.testing.assert_allclose(
        np.asarray(qmmt(jnp.asarray(x), qwt.codes_t, qwt.scales_t,
                        mins_t=qwt.mins_t, dtype=jnp.float32,
                        interpret=True)), y_ref, **tol)
    np.testing.assert_allclose(
        np.asarray(embed_lookup(qw, jnp.asarray([1, 5]))), ref[[1, 5]],
        rtol=1e-6, atol=1e-6)


def _random_qweight_t(rng, R, K, qtype=quants.GGML_TYPE_Q5_0):
    from whisper_tpu.ops.qmm import QWeightT
    qw, w_ref = _random_qweight(rng, R, K, qtype)
    return QWeightT(jnp.swapaxes(qw.codes, 0, 1),
                    jnp.swapaxes(qw.scales, 0, 1)), w_ref


@pytest.mark.parametrize("T,R,K", [(1, 256, 64), (16, 300, 128)])
def test_qmmt_matches_dense(T, R, K):
    from whisper_tpu.ops.qmm import qmmt

    rng = np.random.default_rng(4)
    qwt, w_ref = _random_qweight_t(rng, R, K)
    x = (rng.standard_normal((T, K)) * 0.3).astype(np.float32)
    y = np.asarray(qmmt(jnp.asarray(x), qwt.codes_t, qwt.scales_t,
                        block_r=256, dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(y, x @ w_ref.T, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("ln,bias,act,res", [
    (False, True, None, False),        # qkv/xq: bias only + LN separately
    (True, True, None, False),         # qkv with fused LN
    (False, True, None, True),         # o/xo/mlp1: bias + residual
    (True, True, "gelu", False),       # mlp0: LN + bias + gelu
])
def test_qmmt_fused_matches_unfused(ln, bias, act, res):
    """The fused kernel must reproduce the exact unfused op sequence
    (model.layer_norm -> matmul -> +bias -> gelu -> +residual)."""
    from whisper_tpu.ops.qmm import qmmt_fused

    T, R, K = 5, 256, 128
    eps = 1e-5
    rng = np.random.default_rng(5)
    qwt, w_ref = _random_qweight_t(rng, R, K)
    x = (rng.standard_normal((T, K)) * 0.5).astype(np.float32)
    ln_w = rng.standard_normal(K).astype(np.float32) if ln else None
    ln_b = rng.standard_normal(K).astype(np.float32) if ln else None
    b = rng.standard_normal(R).astype(np.float32) if bias else None
    r = rng.standard_normal((T, R)).astype(np.float32) if res else None

    h = x.astype(np.float64)
    if ln:
        mean = h.mean(-1, keepdims=True)
        var = ((h - mean) ** 2).mean(-1, keepdims=True)
        h = (h - mean) / np.sqrt(var + eps) * ln_w + ln_b
    y_ref = h @ w_ref.astype(np.float64).T
    if bias:
        y_ref = y_ref + b
    if act == "gelu":
        y_ref = np.asarray(jax.nn.gelu(jnp.asarray(y_ref, jnp.float32),
                                       approximate=True), np.float64)
    if res:
        y_ref = y_ref + r

    y = np.asarray(qmmt_fused(
        jnp.asarray(x), qwt.codes_t, qwt.scales_t,
        ln_w=jnp.asarray(ln_w) if ln else None,
        ln_b=jnp.asarray(ln_b) if ln else None,
        bias=jnp.asarray(b) if bias else None,
        residual=jnp.asarray(r) if res else None,
        act=act, eps=eps, block_r=256, dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(y, y_ref, rtol=2e-4, atol=2e-4)


def test_qmmt_fused_auto_fallback_matches_interpret():
    """The off-TPU fallback path and the kernel agree (both are exercised
    in production: fallback on CPU meshes, kernel on TPU)."""
    from whisper_tpu.ops.qmm import qmmt_fused_auto

    T, R, K = 3, 128, 96
    rng = np.random.default_rng(6)
    qwt, _ = _random_qweight_t(rng, R, K)
    x = jnp.asarray((rng.standard_normal((2, T, K)) * 0.5).astype(np.float32))
    ln = (jnp.asarray(rng.standard_normal(K).astype(np.float32)),
          jnp.asarray(rng.standard_normal(K).astype(np.float32)))
    b = jnp.asarray(rng.standard_normal(R).astype(np.float32))
    r = jnp.asarray(rng.standard_normal((2, T, R)).astype(np.float32))

    y_fb = np.asarray(qmmt_fused_auto(x, qwt, jnp.float32, ln=ln, bias=b,
                                      residual=r, act=None))
    y_k = np.asarray(qmmt_fused_auto(x, qwt, jnp.float32, ln=ln, bias=b,
                                     residual=r, act=None, interpret=True))
    np.testing.assert_allclose(y_k, y_fb, rtol=2e-4, atol=2e-4)
