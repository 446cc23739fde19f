"""IQ4/MXFP4/ternary codec tests against the REFERENCE ggml codecs via
ctypes (same oracle pattern as test_kquants.py): our bytes must equal
`ggml_quantize_chunk`'s bit-for-bit, and our decode must equal
`dequantize_row_*` bit-for-bit on reference-produced bytes."""

import ctypes
import pathlib

import numpy as np
import pytest

from whisper_tpu.formats import quants

LIB = pathlib.Path("/root/repo/.oracle/build/bin/libggml-base.so")

TYPES = {
    "iq4_nl": quants.GGML_TYPE_IQ4_NL,
    "iq4_xs": quants.GGML_TYPE_IQ4_XS,
    "mxfp4": quants.GGML_TYPE_MXFP4,
    "nvfp4": quants.GGML_TYPE_NVFP4,
    "tq1_0": quants.GGML_TYPE_TQ1_0,
    "tq2_0": quants.GGML_TYPE_TQ2_0,
}


@pytest.fixture(scope="module")
def ggml():
    if not LIB.exists():
        pytest.skip("reference libggml not built")
    lib = ctypes.CDLL(str(LIB))
    lib.ggml_quantize_chunk.restype = ctypes.c_size_t
    lib.ggml_quantize_chunk.argtypes = [
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float)]
    return lib


def sample(rows=6, cols=512, seed=3):
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal((rows, cols)) * 0.08).astype(np.float32)
    x[0, :32] = 0.0            # dead block
    x[1, 5] = 4.0              # outlier
    return x


def ref_quantize(lib, qtype: int, x: np.ndarray) -> bytes:
    n = x.size
    out = ctypes.create_string_buffer(quants.row_size(qtype, n))
    written = lib.ggml_quantize_chunk(
        qtype, x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out,
        0, n // x.shape[-1], x.shape[-1], None)
    return out.raw[:written]


def ref_dequantize(lib, name: str, buf: bytes, n: int) -> np.ndarray:
    fn = getattr(lib, f"dequantize_row_{name}")
    out = np.zeros(n, np.float32)
    fn(buf, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
       ctypes.c_int64(n))
    return out


@pytest.mark.parametrize("name", sorted(TYPES))
def test_quantize_bit_exact(ggml, name):
    x = sample()
    ours = quants.quantize(x, TYPES[name])
    ref = ref_quantize(ggml, TYPES[name], x)
    assert ours == ref, name


@pytest.mark.parametrize("name", sorted(TYPES))
def test_decode_reference_bytes_bit_exact(ggml, name):
    x = sample(seed=11)
    buf = ref_quantize(ggml, TYPES[name], x)
    ours = quants.dequantize(buf, TYPES[name], x.size)
    ref = ref_dequantize(ggml, name, buf, x.size)
    np.testing.assert_array_equal(ours, ref, err_msg=name)


@pytest.mark.parametrize("name", sorted(TYPES))
def test_planes_match_dequant(ggml, name):
    x = sample(seed=7)
    buf = ref_quantize(ggml, TYPES[name], x)
    qt = quants.unpack_to_planes(buf, TYPES[name], x.shape)
    dense = quants.dequantize(buf, TYPES[name], x.size).reshape(x.shape)
    grain = x.shape[1] // qt.scales.shape[1]  # 32, except nvfp4 (16)
    rebuilt = (qt.codes.astype(np.float32).reshape(x.shape[0], -1, grain)
               * qt.scales[:, :, None]).reshape(x.shape)
    np.testing.assert_allclose(rebuilt, dense, atol=1e-6, err_msg=name)
