"""IQ1/IQ2/IQ3 importance-matrix ENCODER tests: our bytes must equal
`ggml_quantize_chunk`'s bit-for-bit with the same imatrix (closing the last
file-format asymmetry — round 2 had decode-only support for these).

Covers every grid format the reference can produce: iq2_xxs/xs/s,
iq3_xxs/s, iq1_s/m, across scale regimes and a dead (all-zero) sub-block.
"""

import ctypes

import numpy as np
import pytest

from whisper_tpu.formats import quants

from oracle_paths import require_bin

ENCODERS = {
    "iq2_xxs": quants.GGML_TYPE_IQ2_XXS,
    "iq2_xs": quants.GGML_TYPE_IQ2_XS,
    "iq2_s": quants.GGML_TYPE_IQ2_S,
    "iq3_xxs": quants.GGML_TYPE_IQ3_XXS,
    "iq3_s": quants.GGML_TYPE_IQ3_S,
    "iq1_s": quants.GGML_TYPE_IQ1_S,
    "iq1_m": quants.GGML_TYPE_IQ1_M,
}


@pytest.fixture(scope="module")
def ggml():
    lib = ctypes.CDLL(str(require_bin("libggml-base.so")))
    lib.ggml_quantize_chunk.restype = ctypes.c_size_t
    lib.ggml_quantize_chunk.argtypes = [
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float)]
    lib.ggml_quantize_init.argtypes = [ctypes.c_int]
    return lib


def ref_quantize(lib, qtype, x, imatrix):
    lib.ggml_quantize_init(qtype)
    out = ctypes.create_string_buffer(quants.row_size(qtype, x.size))
    n = lib.ggml_quantize_chunk(
        qtype, x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out,
        0, x.shape[0], x.shape[1],
        imatrix.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out.raw[:n]


@pytest.mark.parametrize("name", sorted(ENCODERS))
@pytest.mark.parametrize("rows,cols,seed,scale", [
    (1, 256, 0, 0.1),
    (4, 512, 1, 0.1),
    (8, 768, 2, 0.02),    # includes a dead all-zero 32-group
    (2, 256, 3, 1.5),
])
def test_encode_bit_exact(ggml, name, rows, cols, seed, scale):
    qtype = ENCODERS[name]
    rng = np.random.default_rng(seed)
    x = (rng.standard_normal((rows, cols)) * scale).astype(np.float32)
    if seed == 2:
        x[0, :32] = 0.0
    imatrix = (rng.random(cols) * 2 + 0.1).astype(np.float32)
    ours = quants.quantize(x, qtype, imatrix=imatrix)
    ref = ref_quantize(ggml, qtype, x, imatrix)
    assert len(ours) == len(ref)
    assert ours == ref, name


@pytest.mark.parametrize("name", sorted(ENCODERS))
def test_roundtrip_through_our_decoder(ggml, name):
    """Our encoder's bytes decode (with our bit-exact decoder) to values
    close to the input at the expected bitwidth error."""
    qtype = ENCODERS[name]
    rng = np.random.default_rng(7)
    x = (rng.standard_normal((2, 512)) * 0.2).astype(np.float32)
    imatrix = np.ones(512, np.float32)
    buf = quants.quantize(x, qtype, imatrix=imatrix)
    y = quants.dequantize(buf, qtype, x.size).reshape(x.shape)
    # 1-3 bit codebooks: loose but meaningful reconstruction gates
    rel = np.abs(y - x).mean() / np.abs(x).mean()
    assert rel < (1.0 if name.startswith("iq1") else 0.6), (name, rel)


def test_requires_imatrix():
    x = np.zeros((1, 256), np.float32)
    for name, qtype in ENCODERS.items():
        with pytest.raises(NotImplementedError):
            quants.quantize(x, qtype)
