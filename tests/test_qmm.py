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


def test_affine_rejected():
    rng = np.random.default_rng(3)
    w = rng.standard_normal((8, 32)).astype(np.float32)
    packed = quants.quantize(w, quants.GGML_TYPE_Q4_1)
    qt = quants.unpack_to_planes(packed, quants.GGML_TYPE_Q4_1, (8, 32))
    with pytest.raises(ValueError):
        from_qtensor(qt)
