"""Block-quant codec tests: roundtrip error bounds, idempotence, sizes."""

import numpy as np
import pytest

from whisper_tpu.formats import quants


RNG = np.random.default_rng(42)


@pytest.mark.parametrize("qtype,max_rel", [
    (quants.GGML_TYPE_Q4_0, 0.20),
    (quants.GGML_TYPE_Q4_1, 0.12),
    (quants.GGML_TYPE_Q5_0, 0.10),
    (quants.GGML_TYPE_Q5_1, 0.06),
    (quants.GGML_TYPE_Q8_0, 0.01),
])
def test_roundtrip_error(qtype, max_rel):
    x = RNG.standard_normal(32 * 64).astype(np.float32)
    buf = quants.quantize(x, qtype)
    assert len(buf) == quants.row_size(qtype, x.size)
    y = quants.dequantize(buf, qtype, x.size)
    scale = np.abs(x).max()
    assert np.abs(x - y).max() <= max_rel * scale


_SIMPLE_TYPES = tuple(t for t in quants.supported_quant_types()
                      if quants.SPECS[t].block_elems == quants.QK)


@pytest.mark.parametrize("qtype", _SIMPLE_TYPES)
def test_idempotent(qtype):
    """quantize(dequantize(q)) == q — the *_0/*_1 codecs are fixed points
    (K-quants use iterative scale searches and are not)."""
    x = RNG.standard_normal(32 * 16).astype(np.float32)
    b1 = quants.quantize(x, qtype)
    y = quants.dequantize(b1, qtype, x.size)
    b2 = quants.quantize(y, qtype)
    assert b1 == b2


@pytest.mark.parametrize("qtype", quants.supported_quant_types())
def test_zeros_block(qtype):
    n = 4 * quants.SPECS[qtype].block_elems
    x = np.zeros(n, np.float32)
    y = quants.dequantize(quants.quantize(x, qtype), qtype, n)
    assert np.all(y == 0.0) or np.abs(y).max() < 1e-6


@pytest.mark.parametrize("qtype", _SIMPLE_TYPES)
def test_planes_match_dequant(qtype):
    """Struct-of-arrays device layout decodes to the same values."""
    rows, cols = 8, 128
    x = RNG.standard_normal((rows, cols)).astype(np.float32)
    buf = quants.quantize(x, qtype)
    dense = quants.dequantize(buf, qtype, x.size).reshape(rows, cols)
    qt = quants.unpack_to_planes(buf, qtype, (rows, cols))
    blocks = cols // qt.block
    codes = qt.codes.reshape(rows, blocks, qt.block).astype(np.float32)
    scales = qt.scales.reshape(rows, blocks, 1)
    vals = codes * scales
    if qt.mins is not None:
        vals = vals + qt.mins.reshape(rows, blocks, 1)
    np.testing.assert_allclose(vals.reshape(rows, cols), dense, rtol=0, atol=1e-6)


def test_f16_passthrough():
    x = RNG.standard_normal(100).astype(np.float32)
    buf = quants.quantize(x, quants.GGML_TYPE_F16)
    y = quants.dequantize(buf, quants.GGML_TYPE_F16, 100)
    np.testing.assert_allclose(x, y, atol=2e-3)
