"""Packed (fused dequant-matmul) decode path vs dense path parity."""

import pathlib

import numpy as np
import pytest

JFK = pathlib.Path("/root/reference/samples/jfk.wav")


@pytest.fixture(scope="module")
def q5_model(mini_model_path, tmp_path_factory):
    from whisper_tpu.cli.quantize import quantize_model
    from whisper_tpu.formats import requant

    out = tmp_path_factory.mktemp("q") / "mini-q5_0.bin"
    quantize_model(str(mini_model_path), str(out),
                   requant.parse_ftype("q5_0"), verbose=False)
    return out


def test_packed_overlay_built(q5_model):
    from whisper_tpu.models.whisper.load import (build_qweight_overlay,
                                                 load_model)

    m = load_model(str(q5_model))
    assert m.qparams
    overlay = build_qweight_overlay(m.qparams, m.hparams)
    assert set(overlay["blocks"]) == {"qkv_w", "o_w", "xq_w",
                                      "xo_w", "mlp0_w", "mlp1_w"}
    assert "tok_embd" in overlay
    codes, scales = overlay["blocks"]["qkv_w"]
    S = m.hparams.n_text_state
    assert codes.shape == (m.hparams.n_text_layer, 3 * S, S)
    assert scales.shape == (m.hparams.n_text_layer, 3 * S, S // 32)


def test_packed_transcription_matches_dense(q5_model):
    if not JFK.exists():
        pytest.skip("jfk.wav not available")
    from whisper_tpu.audio.io import load_audio
    from whisper_tpu.decoding.full import transcribe
    from whisper_tpu.decoding.params import TranscribeParams
    from whisper_tpu.runtime.context import WhisperContext
    from whisper_tpu.ops.qmm import QWeight, QWeightT

    samples, _ = load_audio(str(JFK))
    texts = []
    for packed in (False, True):
        ctx = WhisperContext.from_file(str(q5_model),
                                       use_packed_weights=packed)
        if packed:
            bp = ctx.params["dec"]["blocks_packed"]
            assert isinstance(bp[0]["qkv_w"], QWeightT)
            assert "qkv_w" not in ctx.params["dec"]["blocks"]
            assert isinstance(ctx.params["dec"]["tok_embd"], QWeight)
        params = TranscribeParams(language="en", print_progress=False,
                                  temperature_inc=0.0)
        segments = transcribe(ctx, params, samples[:16000 * 5])
        texts.append("".join(s.text for s in segments))
    # off-TPU the packed path dequantizes to the same dense weights ->
    # identical greedy tokens
    assert texts[0] == texts[1]
