"""Parakeet multi-chip sharding dryrun (8 virtual CPU devices)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from whisper_tpu.models.parakeet import model as PM
from whisper_tpu.models.parakeet.decode import tdt_greedy_decode
from whisper_tpu.models.parakeet.hparams import ParakeetHParams
from whisper_tpu.models.parakeet.load import build_param_pytree
from whisper_tpu.models.parakeet.writer import synth_parakeet_tensors
from whisper_tpu.parallel.mesh import make_mesh
from whisper_tpu.parallel.parakeet_sharding import shard_parakeet_params


def test_parakeet_tp_dp_dryrun():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    hp = ParakeetHParams(
        n_vocab=32, n_audio_ctx=512, n_audio_state=32, n_audio_head=2,
        n_audio_layer=2, n_mels=16, n_fft=64, subsampling_factor=8,
        n_subsampling_channels=16, n_conv_kernel=3, n_pred_dim=32,
        n_pred_layers=2, n_tdt_durations=2, n_max_tokens=4,
        tdt_durations=(0, 1))
    tensors = synth_parakeet_tensors(hp)
    params = jax.tree.map(jnp.asarray, build_param_pytree(tensors, hp))

    mesh = make_mesh(4, 2)
    params = shard_parakeet_params(params, mesh)

    W = 4  # utterances over dp
    mel = jax.device_put(
        jnp.zeros((W, 128, hp.n_mels), jnp.float32),
        NamedSharding(mesh, P("dp", None, None)))

    def encode_all(params, mel):
        return jax.vmap(
            lambda m: PM.encode(params, m, 128, hp, dtype=jnp.float32)
        )(mel)

    with mesh:
        enc = jax.jit(encode_all)(params, mel)
        enc.block_until_ready()
    n_frames = enc.shape[1]
    assert enc.shape == (W, n_frames, hp.n_audio_state)

    # TDT decode of one utterance against the sharded params (prediction +
    # joint are replicated; enc gathers locally)
    h = jnp.zeros((hp.n_pred_layers, hp.n_pred_dim))
    c = jnp.zeros_like(h)
    with mesh:
        out = tdt_greedy_decode(params, enc[0], jnp.int32(n_frames), h, c,
                                hp, max_out=32, dtype=jnp.float32)
        jax.block_until_ready(out)
    assert int(out[6]) >= 0  # n_out
