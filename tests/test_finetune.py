"""Whisper fine-tuning (training/finetune.py): overfit a mini model,
freeze-encoder semantics, and save/reload roundtrip through the legacy
ggml container."""

import numpy as np
import pytest

from whisper_tpu.models.whisper.load import load_model
from whisper_tpu.training.finetune import (
    finetune,
    make_finetune_context,
    pytree_to_tensors,
    save_finetuned,
)


def _samples(wm, n=2, n_tok=6, seed=0):
    rng = np.random.default_rng(seed)
    hp, v = wm.hparams, wm.vocab
    out = []
    for i in range(n):
        mel = rng.normal(size=(hp.n_mels, 2 * hp.n_audio_ctx)).astype(
            np.float32) * 0.1
        body = rng.integers(100, 1000, size=n_tok).astype(np.int32)
        toks = np.concatenate([[v.token_sot], body, [v.token_eot]])
        out.append((mel, toks))
    return out


@pytest.fixture(scope="module")
def mini(mini_model_path):
    return load_model(str(mini_model_path))


def test_finetune_overfits(mini):
    samples = _samples(mini)
    params, losses = finetune(mini, samples, steps=24, batch_size=2,
                              lr=8e-3, freeze_encoder=True)
    assert losses[-1] < losses[0] * 0.5, losses
    # encoder untouched, decoder moved
    np.testing.assert_array_equal(
        np.asarray(params["enc"]["blocks"]["mlp0_w"]),
        np.asarray(mini.params["enc"]["blocks"]["mlp0_w"], np.float32))
    assert not np.allclose(
        np.asarray(params["dec"]["blocks"]["mlp0_w"]),
        np.asarray(mini.params["dec"]["blocks"]["mlp0_w"], np.float32))


def test_finetune_trains_encoder_when_unfrozen(mini):
    samples = _samples(mini, n=1)
    ctx = make_finetune_context(mini, freeze_encoder=False)
    from whisper_tpu.training.finetune import _DictBatcher
    batch = _DictBatcher.collate(samples, max(len(t) for _, t in samples))
    ctx.step(batch)
    assert not np.allclose(
        np.asarray(ctx.params["enc"]["blocks"]["mlp0_w"]),
        np.asarray(mini.params["enc"]["blocks"]["mlp0_w"], np.float32))


def test_pytree_tensor_roundtrip(mini, tmp_path):
    """pytree -> named tensors -> f32 file -> load == original pytree."""
    out = tmp_path / "roundtrip-f32.bin"
    save_finetuned(str(out), mini, mini.params, use_f16=False)
    back = load_model(str(out))
    import jax

    leaves0, tree0 = jax.tree_util.tree_flatten(
        jax.tree.map(lambda a: np.asarray(a, np.float32), mini.params))
    leaves1, tree1 = jax.tree_util.tree_flatten(back.params)
    assert tree0 == tree1
    for a, b in zip(leaves0, leaves1):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))
    assert back.vocab.token_sot == mini.vocab.token_sot
    import dataclasses

    # ftype legitimately differs (f32 file vs the f16 original)
    assert dataclasses.replace(back.hparams, ftype=mini.hparams.ftype) == \
        mini.hparams


def test_tensor_names_complete(mini):
    from whisper_tpu.models.whisper.load import expected_tensor_names

    tensors = pytree_to_tensors(mini.params, mini.hparams)
    assert set(tensors) == set(expected_tensor_names(mini.hparams))


def test_finetune_cli(mini_model_path, jfk_pcm, tmp_path):
    """whisper-finetune end to end: wav+txt pair -> tuned loadable model."""
    import pathlib
    import shutil

    from whisper_tpu.cli.finetune import main

    wav = pathlib.Path("/root/reference/samples/jfk.wav")
    data = tmp_path / "clip.wav"
    shutil.copy(wav, data)
    (tmp_path / "clip.txt").write_text("ask not what your country can do")
    out = tmp_path / "tuned.bin"
    assert main(["-m", str(mini_model_path), "-o", str(out),
                 "--steps", "2", "--lr", "1e-3", str(data)]) == 0
    tuned = load_model(str(out))
    assert tuned.n_loaded > 0
