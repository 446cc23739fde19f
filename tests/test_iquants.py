"""IQ4/MXFP4/ternary codec tests against the REFERENCE ggml codecs via
ctypes (same oracle pattern as test_kquants.py): our bytes must equal
`ggml_quantize_chunk`'s bit-for-bit, and our decode must equal
`dequantize_row_*` bit-for-bit on reference-produced bytes."""

import ctypes

import numpy as np
import pytest

from whisper_tpu.formats import quants

from oracle_paths import require_bin

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
    lib = ctypes.CDLL(str(require_bin("libggml-base.so")))
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


# --------------------------------------------------------------------------
# IQ1/IQ2/IQ3 grid formats: DECODE-ONLY support.  Encoding needs an
# importance matrix, so test blocks are synthesized as structured random
# bytes (valid f16 super-scales patched in) and both decoders must agree
# bit-for-bit — every grid index / sign / scale bit pattern is legal by
# construction of the formats.
# --------------------------------------------------------------------------

IQ_DECODE_ONLY = {
    "iq2_xxs": quants.GGML_TYPE_IQ2_XXS,
    "iq2_xs": quants.GGML_TYPE_IQ2_XS,
    "iq2_s": quants.GGML_TYPE_IQ2_S,
    "iq3_xxs": quants.GGML_TYPE_IQ3_XXS,
    "iq3_s": quants.GGML_TYPE_IQ3_S,
    "iq1_s": quants.GGML_TYPE_IQ1_S,
    "iq1_m": quants.GGML_TYPE_IQ1_M,
}


def synth_blocks(qtype: int, n_blocks=8, seed=5) -> bytes:
    rng = np.random.default_rng(seed)
    bs = quants.SPECS[qtype].block_bytes
    raw = rng.integers(0, 256, size=(n_blocks, bs), dtype=np.uint8)
    if qtype != quants.GGML_TYPE_IQ1_M:
        # leading f16 scale: patch to a finite positive value
        d = (rng.random(n_blocks, np.float32) * 0.1 + 0.01).astype(np.float16)
        raw[:, :2] = d.view(np.uint8).reshape(n_blocks, 2)
    return raw.tobytes()


@pytest.mark.parametrize("name", sorted(IQ_DECODE_ONLY))
def test_iq_grid_decode_bit_exact(ggml, name):
    qtype = IQ_DECODE_ONLY[name]
    n = 8 * quants.QK_K
    buf = synth_blocks(qtype)
    assert len(buf) == quants.row_size(qtype, n)
    ours = quants.dequantize(buf, qtype, n)
    ref = ref_dequantize(ggml, name, buf, n)
    np.testing.assert_array_equal(ours, ref, err_msg=name)


@pytest.mark.parametrize("name", sorted(IQ_DECODE_ONLY))
def test_iq_grid_quantize_unsupported(name):
    with pytest.raises(NotImplementedError):
        quants.quantize(np.zeros(quants.QK_K, np.float32),
                        IQ_DECODE_ONLY[name])
