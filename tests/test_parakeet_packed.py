"""Packed-quantized Parakeet decode (VERDICT r2 item 5).

The reference quantizes Parakeet incl. K-quants and runs the quantized
files (examples/parakeet-quantize, tests/run-tests.sh:25).  whisper_tpu's
packed path (models/parakeet/model.PQW + load.build_packed_overlay) keeps
the conformer weights block-quantized in HBM with the dequant fused into
the matmuls; these tests prove it equals the dense load-time-dequant path
and that our quantized files match the REFERENCE binary's transcription.
"""

import pathlib
import subprocess

import numpy as np
import pytest

from whisper_tpu.cli.parakeet_quantize import main as pq_main
from whisper_tpu.models.parakeet.context import ParakeetContext
from whisper_tpu.models.parakeet.hparams import ParakeetHParams
from whisper_tpu.models.parakeet.writer import (synth_parakeet_tensors,
                                                write_parakeet_model)

from oracle_paths import find_bin

JFK = pathlib.Path("/root/reference/samples/jfk.wav")


@pytest.fixture(scope="module")
def quantizable_model(tmp_path_factory):
    """Synthetic parakeet model with quantization-friendly dims (every
    quantized in-dim divisible by 256 so q4_k works too)."""
    hp = ParakeetHParams(
        n_vocab=12, n_audio_ctx=512, n_audio_state=256, n_audio_head=4,
        n_audio_layer=2, n_mels=128, n_fft=512, subsampling_factor=8,
        n_subsampling_channels=16, n_conv_kernel=9, n_pred_dim=256,
        n_pred_layers=2, n_tdt_durations=3, n_max_tokens=4,
        tdt_durations=(0, 1, 2))
    rng = np.random.default_rng(0)
    filters = (rng.random((128, 257)).astype(np.float32) * 0.01)
    window = np.hanning(512).astype(np.float32)
    vocab = [b"<unk>", b"<s>", b"</s>"] + [bytes([97 + i]) for i in range(9)]
    path = tmp_path_factory.mktemp("pk") / "parakeet-synth-256.bin"
    write_parakeet_model(str(path), hp, filters, window, vocab,
                         synth_parakeet_tensors(hp), use_f16=True)
    return path


@pytest.fixture(scope="module")
def pcm():
    if not JFK.exists():
        pytest.skip("jfk.wav not available")
    from whisper_tpu.audio.io import load_audio

    return load_audio(str(JFK))[0][: 16000 * 3]


@pytest.mark.parametrize("qtype", ["q5_0", "q4_k"])
def test_packed_equals_dense(quantizable_model, pcm, qtype, tmp_path):
    qfile = tmp_path / f"pk-{qtype}.bin"
    assert pq_main([str(quantizable_model), str(qfile), qtype]) == 0

    texts, encs = {}, {}
    for packed in (False, True):
        ctx = ParakeetContext.from_file(str(qfile),
                                        use_packed_weights=packed)
        assert ctx.use_packed_weights == packed
        if packed:
            from whisper_tpu.models.parakeet.model import PQW

            assert isinstance(ctx.params["layers"]["ff1_lin1_w"], PQW)
            assert isinstance(ctx.params["pre"]["out_w"], PQW)
            if qtype == "q4_k":
                assert ctx.params["layers"]["ff1_lin1_w"].mins is not None
        ctx.pcm_to_mel(pcm)
        import jax.numpy as jnp

        from whisper_tpu.models.parakeet import model as M

        enc = ctx._encode_jit(ctx.params, jnp.asarray(ctx.mel, ctx.dtype),
                              ctx.n_len_org, hp=ctx.hp, dtype=ctx.dtype)
        encs[packed] = np.asarray(enc)
        ctx.full(pcm)
        texts[packed] = ctx.full_text()

    # packed dequant (codes*scale[+min]) must match the dense load-time
    # dequant to float tolerance, and the transcript must be identical
    scale = np.abs(encs[False]).max() + 1e-9
    assert np.abs(encs[True] - encs[False]).max() / scale < 2e-5
    assert texts[True] == texts[False]


@pytest.mark.parametrize("qtype", ["q5_0", "q4_k"])
def test_quantized_text_matches_reference_binary(quantizable_model, pcm,
                                                 qtype, tmp_path):
    """The reference parakeet-cli transcribes OUR quantized file and must
    produce the same text as our packed decode (the reference's own
    verification shape, tests/CMakeLists.txt:143-180)."""
    cli = find_bin("parakeet-cli")
    if cli is None:
        pytest.skip("reference parakeet-cli not built")
    qfile = tmp_path / f"pk-{qtype}.bin"
    assert pq_main([str(quantizable_model), str(qfile), qtype]) == 0

    wav = tmp_path / "in.wav"
    import wave

    with wave.open(str(wav), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((np.clip(pcm, -1, 1) * 32767).astype("<i2").tobytes())

    r = subprocess.run([str(cli), "-m", str(qfile), "-f", str(wav), "-np"],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-500:]
    ref_text = "".join(
        line.split("]", 1)[-1] for line in r.stdout.splitlines()
        if line.strip()).strip()

    ctx = ParakeetContext.from_file(str(qfile), use_packed_weights=True)
    # the reference reads the wav through miniaudio (int16) — feed ourselves
    # the identical int16-rounded samples
    from whisper_tpu.audio.io import load_audio

    ctx.full(load_audio(str(wav))[0])
    ours = ctx.full_text().strip()

    import difflib

    sim = difflib.SequenceMatcher(None, ours, ref_text).ratio()
    assert sim >= 0.9, (ours, ref_text, sim)
