"""whisper-quantize tool tests (reference: examples/quantize + common-ggml).

Quantizes the mini synthetic model to each supported ftype, reloads, and
checks: skip-list honored, 1-D tensors untouched, round-trip error bounded,
and the quantized model still transcribes (pipeline smoke).
"""

import io
import pathlib

import numpy as np
import pytest

from whisper_tpu.cli.quantize import quantize_model
from whisper_tpu.formats import container, quants, requant
from whisper_tpu.models.whisper.load import load_model
from whisper_tpu.models.whisper.writer import QUANTIZE_SKIP

FIXTURES = pathlib.Path(__file__).resolve().parents[1] / ".fixtures"


def _records(path):
    with open(path, "rb") as f:
        requant.copy_whisper_header(f, io.BytesIO(), 1)  # skip header
        return {r.name: r for r in container.read_tensor_records(f)}


@pytest.mark.parametrize("ftype_name,qtype", [
    ("q4_0", quants.GGML_TYPE_Q4_0),
    ("q5_0", quants.GGML_TYPE_Q5_0),
    ("q5_1", quants.GGML_TYPE_Q5_1),
    ("q8_0", quants.GGML_TYPE_Q8_0),
    ("mxfp4", quants.GGML_TYPE_MXFP4),
    ("nvfp4", quants.GGML_TYPE_NVFP4),
])
def test_quantize_roundtrip(mini_model_path, ftype_name, qtype, tmp_path):
    out = tmp_path / f"mini-{ftype_name}.bin"
    ftype = requant.parse_ftype(ftype_name)
    rep = quantize_model(str(mini_model_path), str(out), ftype, verbose=False)
    assert rep.n_quantized > 0
    assert rep.total_size_new < rep.total_size_org

    src = _records(mini_model_path)
    dst = _records(out)
    assert set(src) == set(dst)
    for name, rec in dst.items():
        if name in QUANTIZE_SKIP or len(rec.shape) != 2:
            # skip-list and non-2D tensors are byte-identical
            assert rec.ggml_type == src[name].ggml_type, name
            assert rec.data == src[name].data, name
        else:
            assert rec.ggml_type == qtype, name
            ref = src[name].to_f32()
            got = rec.to_f32()
            scale = np.abs(ref).mean() + 1e-8
            tol = {quants.GGML_TYPE_Q4_0: 0.25, quants.GGML_TYPE_Q5_0: 0.12,
                   quants.GGML_TYPE_Q5_1: 0.12, quants.GGML_TYPE_Q8_0: 0.02,
                   quants.GGML_TYPE_MXFP4: 0.35,
                   quants.GGML_TYPE_NVFP4: 0.25}[qtype]
            assert np.abs(got - ref).mean() / scale < tol, name

    # loader accepts the quantized file and reports the right wtype
    model = load_model(str(out))
    assert model.wtype == qtype
    assert model.qparams  # packed planes retained for the fused path


def test_quantized_model_transcribes(mini_model_path, tmp_path):
    """Q8_0 quantization must keep the encoder numerically close to f16 and
    the full pipeline must still run end-to-end on the quantized file."""
    import jax.numpy as jnp

    from whisper_tpu.runtime.context import WhisperContext
    from whisper_tpu.decoding.params import TranscribeParams
    from whisper_tpu.decoding.full import transcribe
    from whisper_tpu.models.whisper import model as M

    out = tmp_path / "mini-q8_0.bin"
    quantize_model(str(mini_model_path), str(out),
                   requant.parse_ftype("q8_0"), verbose=False)

    rng = np.random.default_rng(7)
    pcm = (0.05 * rng.standard_normal(16000 * 2)).astype(np.float32)

    encs = []
    for p in (mini_model_path, out):
        ctx = WhisperContext.from_file(str(p))
        ctx.pcm_to_mel(pcm)
        n_win = 2 * ctx.hp.n_audio_ctx
        mel_w = np.zeros((ctx.hp.n_mels, n_win), np.float32)
        mel_w[:, :min(n_win, ctx.n_len)] = ctx.mel[:, :n_win]
        encs.append(np.asarray(
            M.encode(ctx.params, jnp.asarray(mel_w), ctx.hp,
                     dtype=jnp.float32)))
        # full pipeline smoke on the quantized file
        params = TranscribeParams(language="en", print_progress=False,
                                  no_timestamps=True)
        transcribe(ctx, params, pcm)

    f16, q8 = encs
    rel = np.abs(q8 - f16).mean() / (np.abs(f16).mean() + 1e-8)
    assert rel < 0.05, rel


def test_parse_ftype_errors():
    with pytest.raises(ValueError):
        requant.parse_ftype("q9_9")
    with pytest.raises(ValueError):
        requant.parse_ftype("999")
    assert requant.parse_ftype("8") == quants.GGML_FTYPE_MOSTLY_Q5_0
    assert requant.parse_ftype("q5_0") == quants.GGML_FTYPE_MOSTLY_Q5_0
