"""K-quant codec tests against the REFERENCE ggml codecs via ctypes.

Oracle: .oracle/build/bin/libggml-base.so exports ggml_quantize_chunk and
dequantize_row_q*_K; our numpy codecs must (a) decode reference-produced
bytes bit-identically and (b) produce bytes the reference decodes with
quality matching its own quantizer.
"""

import ctypes

import numpy as np
import pytest

from whisper_tpu.formats import quants

from oracle_paths import require_bin

KTYPES = {
    "q2_k": quants.GGML_TYPE_Q2_K,
    "q3_k": quants.GGML_TYPE_Q3_K,
    "q4_k": quants.GGML_TYPE_Q4_K,
    "q5_k": quants.GGML_TYPE_Q5_K,
    "q6_k": quants.GGML_TYPE_Q6_K,
}


@pytest.fixture(scope="module")
def ggml():
    lib = ctypes.CDLL(str(require_bin("libggml-base.so")))
    lib.ggml_quantize_chunk.restype = ctypes.c_size_t
    lib.ggml_quantize_chunk.argtypes = [
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float)]
    return lib


def ref_quantize(lib, qtype: int, x: np.ndarray) -> bytes:
    n = x.size
    row = x.shape[-1]
    out = ctypes.create_string_buffer(quants.row_size(qtype, n))
    written = lib.ggml_quantize_chunk(
        qtype, x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out,
        0, n // row, row, None)
    return out.raw[:written]


def ref_dequantize(lib, name: str, buf: bytes, n: int) -> np.ndarray:
    fn = getattr(lib, f"dequantize_row_{name.replace('k', 'K')}")
    out = np.zeros(n, np.float32)
    fn(buf, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
       ctypes.c_int64(n))
    return out


@pytest.mark.parametrize("name", sorted(KTYPES))
def test_decode_reference_bytes(ggml, name):
    """Our dequant of reference-quantized bytes == reference dequant."""
    qtype = KTYPES[name]
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((4, 512)) * 0.5).astype(np.float32)
    packed = ref_quantize(ggml, qtype, x)
    ours = quants.dequantize(packed, qtype, x.size)
    ref = ref_dequantize(ggml, name, packed, x.size)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-6)


@pytest.mark.parametrize("name", sorted(KTYPES))
def test_encode_bit_exact(ggml, name):
    """Our quantizer's bytes equal the reference's BIT-FOR-BIT — the
    searches reproduce the C's sequential-f32 arithmetic and candidate
    feedback (make_qkx2_quants' accepted mins re-enter later iscales;
    zero-scale groups keep the search's codes)."""
    qtype = KTYPES[name]
    for seed, scale in ((1, 0.3), (5, 0.02), (9, 1.7)):
        rng = np.random.default_rng(seed)
        x = (rng.standard_normal((8, 768)) * scale).astype(np.float32)
        x[0, :32] = 0.0          # dead group
        x[1, 5] = 4.0            # outlier forcing zero-scale sibling groups
        ours_packed = quants.quantize(x, qtype)
        assert len(ours_packed) == quants.row_size(qtype, x.size)
        ref_packed = ref_quantize(ggml, qtype, x)
        assert ours_packed == ref_packed, (name, seed)


@pytest.mark.parametrize("name", sorted(KTYPES))
def test_roundtrip_self_consistent(ggml, name):
    """our quant -> our dequant == reference dequant of the same bytes."""
    qtype = KTYPES[name]
    rng = np.random.default_rng(2)
    x = (rng.standard_normal(1024) * 2.0).astype(np.float32)
    packed = quants.quantize(x, qtype)
    ours = quants.dequantize(packed, qtype, x.size)
    ref = ref_dequantize(ggml, name, packed, x.size)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-6)


def test_kquant_model_quantize(mini_model_path, tmp_path):
    """whisper-quantize to q5_k produces a loadable model (K-quant path)."""
    from whisper_tpu.cli.quantize import quantize_model
    from whisper_tpu.formats import requant
    from whisper_tpu.models.whisper.load import load_model

    out = tmp_path / "mini-q5_k.bin"
    # mini model dims (64) are not divisible by QK_K=256 -> rows shorter
    # than a super-block must be rejected like the reference
    with pytest.raises(Exception):
        quantize_model(str(mini_model_path), str(out),
                       requant.parse_ftype("q5_k"), verbose=False)
