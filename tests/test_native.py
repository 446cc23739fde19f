"""Native C++ runtime component tests (native/wtpu_native.cpp).

The native codecs must match the Python reference codecs bit-for-bit, and
the native mel must match the numpy mel numerically.
"""

import numpy as np
import pytest

from whisper_tpu import native
from whisper_tpu.formats import quants


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_version(lib):
    assert b"whisper_tpu-native" in lib.wtpu_native_version()


@pytest.mark.parametrize("name,qtype", [
    ("q4_0", quants.GGML_TYPE_Q4_0),
    ("q5_0", quants.GGML_TYPE_Q5_0),
    ("q8_0", quants.GGML_TYPE_Q8_0),
])
def test_codecs_bit_exact(lib, name, qtype):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(32 * 64) * 2.0).astype(np.float32)
    ours = native.quantize(name, x)
    ref = quants.quantize(x, qtype)
    assert ours == ref
    back = native.dequantize(name, ref, x.size)
    ref_back = quants.dequantize(ref, qtype, x.size)
    np.testing.assert_array_equal(back, ref_back)


def test_codec_zeros(lib):
    x = np.zeros(64, np.float32)
    for name, qtype in (("q4_0", quants.GGML_TYPE_Q4_0),
                        ("q8_0", quants.GGML_TYPE_Q8_0)):
        assert native.quantize(name, x) == quants.quantize(x, qtype)


def test_native_mel_matches_numpy(lib):
    from whisper_tpu.audio.mel import (HOP_LENGTH, N_FFT, _log_mel_numpy,
                                       hann_window, mel_frame_counts,
                                       pad_audio)

    rng = np.random.default_rng(1)
    samples = (0.3 * rng.standard_normal(16000 * 2)).astype(np.float32)
    filters = rng.random((80, N_FFT // 2 + 1)).astype(np.float32) * 0.01

    n_len, _ = mel_frame_counts(len(samples))
    padded = pad_audio(samples)
    ref = _log_mel_numpy(padded, filters, hann_window(), n_len)
    got = native.log_mel(padded, filters, N_FFT, HOP_LENGTH, n_len)
    assert got is not None and got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_jax_mel_matches_numpy():
    """LogMel backend='jax' (the TPU 'auto' default, runtime/context.py) vs
    the reference-exact numpy path: FFT rounding only.  Mirrors the native
    backend check above; the normalized output is O(1)-scaled so a tight
    absolute tolerance bounds relative error."""
    import numpy as np

    from whisper_tpu.audio.io import load_audio
    from whisper_tpu.audio.mel import LogMel
    from whisper_tpu.models.whisper.load import _read_header

    header = "/root/reference/models/for-tests-ggml-tiny.en.bin"
    import pathlib

    if not pathlib.Path(header).exists():
        import pytest

        pytest.skip("reference test models not available")
    with open(header, "rb") as f:
        _, filters, _, _ = _read_header(f)
    samples, _ = load_audio("/root/reference/samples/jfk.wav")
    a, n_org_a = LogMel(filters.data)(samples)
    b, n_org_b = LogMel(filters.data, backend="jax")(samples)
    assert a.shape == b.shape and n_org_a == n_org_b
    assert np.max(np.abs(a - b)) < 2e-4, np.max(np.abs(a - b))
