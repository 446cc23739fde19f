"""Converter + parakeet-quantize tests (reference: models/convert-pt-to-ggml.py,
models/convert-h5-to-ggml.py, examples/parakeet-quantize)."""

import pathlib
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))

HEADER_DONOR = pathlib.Path("/root/reference/models/for-tests-ggml-tiny.en.bin")
PARAKEET_MODEL = pathlib.Path(
    "/root/reference/models/for-tests-ggml-parakeet-tdt.bin")

MINI_DIMS = dict(n_vocab=51864, n_audio_ctx=1500, n_audio_state=64,
                 n_audio_head=2, n_audio_layer=2, n_text_ctx=448,
                 n_text_state=64, n_text_head=2, n_text_layer=2, n_mels=80)


def _openai_state_dict(dims, rng):
    """Random tensors with OpenAI checkpoint names/shapes."""
    S, M = dims["n_audio_state"], dims["n_mels"]
    TS = dims["n_text_state"]
    sd = {
        "encoder.conv1.weight": rng.standard_normal((S, M, 3)),
        "encoder.conv1.bias": rng.standard_normal(S),
        "encoder.conv2.weight": rng.standard_normal((S, S, 3)),
        "encoder.conv2.bias": rng.standard_normal(S),
        "encoder.positional_embedding": rng.standard_normal(
            (dims["n_audio_ctx"], S)),
        "encoder.ln_post.weight": rng.standard_normal(S),
        "encoder.ln_post.bias": rng.standard_normal(S),
        "decoder.positional_embedding": rng.standard_normal(
            (dims["n_text_ctx"], TS)),
        "decoder.token_embedding.weight": rng.standard_normal(
            (dims["n_vocab"], TS)),
        "decoder.ln.weight": rng.standard_normal(TS),
        "decoder.ln.bias": rng.standard_normal(TS),
    }
    for i in range(dims["n_audio_layer"]):
        p = f"encoder.blocks.{i}."
        for nm, shape in [("attn.query.weight", (S, S)), ("attn.query.bias", (S,)),
                          ("attn.key.weight", (S, S)),
                          ("attn.value.weight", (S, S)), ("attn.value.bias", (S,)),
                          ("attn.out.weight", (S, S)), ("attn.out.bias", (S,)),
                          ("attn_ln.weight", (S,)), ("attn_ln.bias", (S,)),
                          ("mlp.0.weight", (4 * S, S)), ("mlp.0.bias", (4 * S,)),
                          ("mlp.2.weight", (S, 4 * S)), ("mlp.2.bias", (S,)),
                          ("mlp_ln.weight", (S,)), ("mlp_ln.bias", (S,))]:
            sd[p + nm] = rng.standard_normal(shape)
    for i in range(dims["n_text_layer"]):
        p = f"decoder.blocks.{i}."
        for nm, shape in [("attn.query.weight", (TS, TS)), ("attn.query.bias", (TS,)),
                          ("attn.key.weight", (TS, TS)),
                          ("attn.value.weight", (TS, TS)), ("attn.value.bias", (TS,)),
                          ("attn.out.weight", (TS, TS)), ("attn.out.bias", (TS,)),
                          ("attn_ln.weight", (TS,)), ("attn_ln.bias", (TS,)),
                          ("cross_attn.query.weight", (TS, TS)),
                          ("cross_attn.query.bias", (TS,)),
                          ("cross_attn.key.weight", (TS, TS)),
                          ("cross_attn.value.weight", (TS, TS)),
                          ("cross_attn.value.bias", (TS,)),
                          ("cross_attn.out.weight", (TS, TS)),
                          ("cross_attn.out.bias", (TS,)),
                          ("cross_attn_ln.weight", (TS,)),
                          ("cross_attn_ln.bias", (TS,)),
                          ("mlp.0.weight", (4 * TS, TS)), ("mlp.0.bias", (4 * TS,)),
                          ("mlp.2.weight", (TS, 4 * TS)), ("mlp.2.bias", (TS,)),
                          ("mlp_ln.weight", (TS,)), ("mlp_ln.bias", (TS,))]:
            sd[p + nm] = rng.standard_normal(shape)
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


def test_convert_pt_roundtrip(tmp_path):
    if not HEADER_DONOR.exists():
        pytest.skip("donor header not available")
    from convert_pt_to_ggml import convert, load_assets_from_header
    from whisper_tpu.models.whisper.load import load_model

    rng = np.random.default_rng(0)
    checkpoint = {"dims": MINI_DIMS,
                  "model_state_dict": _openai_state_dict(MINI_DIMS, rng)}
    filters, toks, _ = load_assets_from_header(HEADER_DONOR)
    out = tmp_path / "converted.bin"
    n = convert(checkpoint, filters, toks, str(out))
    assert n == len(checkpoint["model_state_dict"])

    model = load_model(str(out))
    assert model.hparams.n_audio_state == 64
    assert not model.is_empty
    # spot-check a weight survives the f16 round trip
    src = checkpoint["model_state_dict"]["encoder.blocks.0.attn.query.weight"]
    got = model.params["enc"]["blocks"]["qkv_w"][0][:, :64]  # q slice of fused qkv
    np.testing.assert_allclose(np.asarray(got), src.T.astype(np.float16),
                               rtol=1e-3, atol=1e-3)

    # and the converted model transcribes end-to-end
    from whisper_tpu.decoding.full import transcribe
    from whisper_tpu.decoding.params import TranscribeParams
    from whisper_tpu.runtime.context import WhisperContext

    ctx = WhisperContext.from_file(str(out))
    pcm = (0.05 * rng.standard_normal(16000)).astype(np.float32)
    transcribe(ctx, TranscribeParams(language="en", print_progress=False,
                                     temperature_inc=0.0), pcm)


def test_hf_name_mapping():
    from convert_hf_to_ggml import map_name

    assert map_name("model.encoder.conv1.weight") == "encoder.conv1.weight"
    assert (map_name("model.encoder.layers.3.self_attn.q_proj.weight")
            == "encoder.blocks.3.attn.query.weight")
    assert (map_name("model.decoder.layers.0.encoder_attn.k_proj.weight")
            == "decoder.blocks.0.cross_attn.key.weight")
    assert (map_name("model.decoder.layers.1.fc1.weight")
            == "decoder.blocks.1.mlp.0.weight")
    assert (map_name("model.decoder.embed_tokens.weight")
            == "decoder.token_embedding.weight")
    assert map_name("proj_out.weight") is None


def test_convert_hf_tiny(tmp_path):
    """Build a tiny HF whisper offline, convert, reload."""
    if not HEADER_DONOR.exists():
        pytest.skip("donor header not available")
    transformers = pytest.importorskip("transformers")
    from convert_hf_to_ggml import hf_dims, state_dict_to_ggml
    from convert_pt_to_ggml import convert, load_assets_from_header
    from whisper_tpu.models.whisper.load import load_model

    config = transformers.WhisperConfig(
        vocab_size=51864, num_mel_bins=80, d_model=64,
        encoder_layers=2, encoder_attention_heads=2,
        decoder_layers=2, decoder_attention_heads=2,
        encoder_ffn_dim=256, decoder_ffn_dim=256,
        max_source_positions=1500, max_target_positions=448)
    model = transformers.WhisperForConditionalGeneration(config)

    checkpoint = {"dims": hf_dims(config),
                  "model_state_dict": state_dict_to_ggml(model)}
    filters, toks, _ = load_assets_from_header(HEADER_DONOR)
    out = tmp_path / "hf.bin"
    convert(checkpoint, filters, toks, str(out))
    m = load_model(str(out))
    assert not m.is_empty
    assert m.hparams.n_audio_layer == 2


def test_parakeet_quantize(tmp_path):
    from whisper_tpu.cli.parakeet_quantize import quantize_parakeet
    from whisper_tpu.formats import requant
    from whisper_tpu.models.parakeet.context import ParakeetContext
    from whisper_tpu.models.parakeet.hparams import ParakeetHParams
    from whisper_tpu.models.parakeet.load import load_parakeet_model
    from whisper_tpu.models.parakeet.writer import (synth_parakeet_tensors,
                                                    write_parakeet_model)

    # the reference's 8-wide test model cannot hold a 32-elem quant block
    # (ggml_quantize_chunk asserts n_per_row % block == 0); ours rejects it
    if PARAKEET_MODEL.exists():
        with pytest.raises(ValueError):
            quantize_parakeet(str(PARAKEET_MODEL), str(tmp_path / "x.bin"),
                              requant.parse_ftype("q8_0"), verbose=False)

    # synthesize a parakeet model with block-divisible dims and quantize it
    hp = ParakeetHParams(
        n_vocab=32, n_audio_ctx=512, n_audio_state=32, n_audio_head=2,
        n_audio_layer=2, n_mels=16, n_fft=64, subsampling_factor=8,
        n_subsampling_channels=16, n_conv_kernel=3, n_pred_dim=32,
        n_pred_layers=2, n_tdt_durations=2, n_max_tokens=4,
        tdt_durations=(0, 1))
    src = tmp_path / "parakeet-f32.bin"
    filters = np.random.default_rng(0).random((16, 33)).astype(np.float32)
    vocab = [b"<unk>", b"<s>", b"</s>"] + [bytes([97 + i]) for i in range(29)]
    write_parakeet_model(str(src), hp, filters,
                         np.hanning(64).astype(np.float32), vocab,
                         synth_parakeet_tensors(hp))
    out = tmp_path / "parakeet-q8_0.bin"
    rep = quantize_parakeet(str(src), str(out),
                            requant.parse_ftype("q8_0"), verbose=False)
    assert rep.n_quantized > 0
    m = load_parakeet_model(str(out))
    ref = load_parakeet_model(str(src))
    # depthwise conv weights stay f32-identical (skip list)
    np.testing.assert_array_equal(
        m.params["layers"]["conv_dw_w"], ref.params["layers"]["conv_dw_w"])
    # quantized weights are close
    a = m.params["layers"]["attn_q_w"]
    b = ref.params["layers"]["attn_q_w"]
    assert np.abs(a - b).mean() / (np.abs(b).mean() + 1e-9) < 0.02

    # and it still transcribes
    ctx = ParakeetContext.from_file(str(out))
    rng = np.random.default_rng(0)
    assert ctx.full((0.1 * rng.standard_normal(16000)).astype(np.float32)) == 0
