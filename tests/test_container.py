"""Container record I/O and model loading tests."""

import io

import numpy as np

from whisper_tpu.formats import container, quants


def test_tensor_record_roundtrip():
    f = io.BytesIO()
    a = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    b = np.random.default_rng(0).standard_normal((8, 64)).astype(np.float32)
    container.write_tensor_record(f, "a", a, quants.GGML_TYPE_F32)
    container.write_tensor_record(f, "b.q", b, quants.GGML_TYPE_Q5_0)
    f.seek(0)
    recs = list(container.read_tensor_records(f))
    assert [r.name for r in recs] == ["a", "b.q"]
    np.testing.assert_array_equal(recs[0].to_f32(), a)
    assert recs[1].shape == (8, 64)
    assert recs[1].ggml_type == quants.GGML_TYPE_Q5_0
    ref = quants.dequantize(quants.quantize(b, quants.GGML_TYPE_Q5_0),
                            quants.GGML_TYPE_Q5_0, b.size).reshape(8, 64)
    np.testing.assert_array_equal(recs[1].to_f32(), ref)


def test_load_mini_model(mini_model):
    hp = mini_model.hparams
    assert hp.n_vocab == 51864
    assert hp.n_audio_state == 64
    assert mini_model.filters.data.shape == (80, 201)
    assert not mini_model.is_empty
    enc = mini_model.params["enc"]
    assert enc["blocks"]["qkv_w"].shape == (2, 64, 192)
    assert enc["conv1_w"].shape == (64, 80, 3)
    dec = mini_model.params["dec"]
    assert dec["tok_embd"].shape == (51864, 64)
    assert dec["blocks"]["mlp0_w"].shape == (2, 64, 256)


def test_turbo_hparams_naming():
    from whisper_tpu.models.whisper import hparams as H

    assert H.LARGE_V3.model_name == "large-v3"
    assert H.LARGE_V3_TURBO.model_name == "large-v3-turbo"
    assert H.LARGE_V3_TURBO.n_text_layer == 4
    assert H.LARGE_V3_TURBO.n_audio_layer == H.LARGE_V3.n_audio_layer


def test_load_header_only_model():
    from whisper_tpu.models.whisper.load import load_model

    m = load_model("/root/reference/models/for-tests-ggml-tiny.en.bin")
    assert m.is_empty
    assert m.hparams.n_audio_layer == 4
    assert m.hparams.model_name == "tiny"
    assert len(m.vocab.id_to_token) == m.hparams.n_vocab


def test_bad_magic_rejected(tmp_path):
    """Corrupt-model negative test (mirror of the reference's
    for-tests-ggml-parakeet-tdt-bad-nfft0 philosophy, tests/CMakeLists.txt)."""
    import pytest

    from whisper_tpu.models.whisper.load import load_model

    p = tmp_path / "bad.bin"
    p.write_bytes(b"\x00\x01\x02\x03" + b"\x00" * 64)
    with pytest.raises(ValueError, match="bad magic"):
        load_model(str(p))


def test_truncated_model_rejected(mini_model_path, tmp_path):
    import pytest

    from whisper_tpu.models.whisper.load import load_model

    data = open(mini_model_path, "rb").read()
    p = tmp_path / "trunc.bin"
    p.write_bytes(data[: int(len(data) * 0.7)])
    with pytest.raises(Exception):
        load_model(str(p))
