"""GGUF container tests, cross-validated against the reference's gguf
implementation in libggml-base via ctypes."""

import ctypes

import numpy as np
import pytest

from whisper_tpu.formats import gguf, quants

from oracle_paths import require_bin


def _sample_file(path):
    rng = np.random.default_rng(0)
    kv = {
        "general.architecture": "whisper",
        "general.alignment": 32,
        "whisper.n_audio_layer": 4,
        "custom.pi": 3.5,
        "custom.flag": True,
        "custom.big": 2 ** 40,
        "custom.langs": ["en", "es"],
        "custom.dims": [80, 384],
    }
    tensors = [
        ("enc.w", rng.standard_normal((8, 64)).astype(np.float32),
         quants.GGML_TYPE_F32),
        ("enc.h", rng.standard_normal((16, 32)).astype(np.float32),
         quants.GGML_TYPE_F16),
        ("enc.q", rng.standard_normal((4, 64)).astype(np.float32),
         quants.GGML_TYPE_Q8_0),
    ]
    gguf.write_gguf(str(path), kv, tensors)
    return kv, tensors


def test_roundtrip(tmp_path):
    p = tmp_path / "t.gguf"
    kv, tensors = _sample_file(p)
    g = gguf.read_gguf(str(p))
    assert g.kv["general.architecture"] == "whisper"
    assert g.kv["whisper.n_audio_layer"] == 4
    assert g.kv["custom.pi"] == pytest.approx(3.5)
    assert g.kv["custom.flag"] is True
    assert g.kv["custom.big"] == 2 ** 40
    assert g.kv["custom.langs"] == ["en", "es"]
    assert g.kv["custom.dims"] == [80, 384]
    assert [t.name for t in g.tensors] == ["enc.w", "enc.h", "enc.q"]
    np.testing.assert_array_equal(g.tensor("enc.w").to_f32(), tensors[0][1])
    np.testing.assert_allclose(g.tensor("enc.h").to_f32(), tensors[1][1],
                               rtol=1e-3, atol=1e-3)
    q8 = g.tensor("enc.q")
    assert q8.ggml_type == quants.GGML_TYPE_Q8_0
    np.testing.assert_allclose(q8.to_f32(), tensors[2][1], atol=0.05)


def test_reference_reads_our_gguf(tmp_path):
    """The REFERENCE gguf implementation must accept our files."""
    p = tmp_path / "x.gguf"
    kv, tensors = _sample_file(p)

    lib = ctypes.CDLL(str(require_bin("libggml-base.so")))

    class InitParams(ctypes.Structure):
        _fields_ = [("no_alloc", ctypes.c_bool),
                    ("ctx", ctypes.c_void_p)]

    lib.gguf_init_from_file.restype = ctypes.c_void_p
    lib.gguf_init_from_file.argtypes = [ctypes.c_char_p, InitParams]
    lib.gguf_get_n_tensors.restype = ctypes.c_int64
    lib.gguf_get_n_tensors.argtypes = [ctypes.c_void_p]
    lib.gguf_get_n_kv.restype = ctypes.c_int64
    lib.gguf_get_n_kv.argtypes = [ctypes.c_void_p]
    lib.gguf_find_key.restype = ctypes.c_int64
    lib.gguf_find_key.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.gguf_get_val_u32.restype = ctypes.c_uint32
    lib.gguf_get_val_u32.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.gguf_get_val_str.restype = ctypes.c_char_p
    lib.gguf_get_val_str.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.gguf_get_tensor_name.restype = ctypes.c_char_p
    lib.gguf_get_tensor_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.gguf_free.argtypes = [ctypes.c_void_p]

    ctxp = lib.gguf_init_from_file(str(p).encode(),
                                   InitParams(True, None))
    assert ctxp, "reference gguf failed to open our file"
    try:
        assert lib.gguf_get_n_tensors(ctxp) == 3
        assert lib.gguf_get_n_kv(ctxp) == 8
        kid = lib.gguf_find_key(ctxp, b"whisper.n_audio_layer")
        assert kid >= 0
        assert lib.gguf_get_val_u32(ctxp, kid) == 4
        kid = lib.gguf_find_key(ctxp, b"general.architecture")
        assert lib.gguf_get_val_str(ctxp, kid) == b"whisper"
        names = {lib.gguf_get_tensor_name(ctxp, i) for i in range(3)}
        assert names == {b"enc.w", b"enc.h", b"enc.q"}
    finally:
        lib.gguf_free(ctxp)


def test_bad_magic(tmp_path):
    p = tmp_path / "bad.gguf"
    p.write_bytes(b"NOPE" + b"\x00" * 64)
    with pytest.raises(ValueError):
        gguf.read_gguf(str(p))


def test_v2_files_accepted(tmp_path):
    """GGUF v2 has the identical little-endian layout (v3 only added
    big-endian support); the reference reader accepts both, so must ours."""
    p = tmp_path / "t.gguf"
    _sample_file(p)
    raw = bytearray(p.read_bytes())
    assert raw[4:8] == (3).to_bytes(4, "little")
    raw[4:8] = (2).to_bytes(4, "little")
    p2 = tmp_path / "t2.gguf"
    p2.write_bytes(bytes(raw))
    g = gguf.read_gguf(str(p2))
    assert g.kv["whisper.n_audio_layer"] == 4
    # v1 stays rejected
    raw[4:8] = (1).to_bytes(4, "little")
    p3 = tmp_path / "t1.gguf"
    p3.write_bytes(bytes(raw))
    with pytest.raises(ValueError):
        gguf.read_gguf(str(p3))


def test_nondefault_alignment_recorded(tmp_path):
    """write_gguf(alignment=N) must record general.alignment so readers
    (ours and the reference's) parse the data section correctly."""
    rng = np.random.default_rng(1)
    arr = rng.standard_normal((8, 64)).astype(np.float32)
    p = tmp_path / "a.gguf"
    gguf.write_gguf(str(p), {"general.architecture": "whisper"},
                    [("w", arr, quants.GGML_TYPE_F32)], alignment=128)
    g = gguf.read_gguf(str(p))
    assert g.kv["general.alignment"] == 128
    assert g.alignment == 128
    np.testing.assert_array_equal(g.tensor("w").to_f32(), arr)
