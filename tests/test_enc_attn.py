"""Encoder fused-QKV attention kernel (ops/enc_attn.py) vs XLA reference.

Runs in Pallas interpret mode on CPU; the kernel itself is exercised on
real TPU by the production encode path (model._encoder_block selects it
for bf16 + 512-padded T + d in {64, 128})."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_tpu.ops.enc_attn import self_attention_qkv


def _ref(qkv, n_head, true_len):
    t, s3 = qkv.shape
    s = s3 // 3
    d = s // n_head
    q, k, v = (qkv[:, i * s:(i + 1) * s].reshape(t, n_head, d)
               .transpose(1, 0, 2).astype(jnp.float32) for i in range(3))
    scores = jnp.einsum("htd,hsd->hts", q, k) / np.sqrt(d)
    mask = jnp.where(jnp.arange(t) < true_len, 0.0, -1e30)[None, None, :]
    p = jax.nn.softmax(scores + mask, axis=-1)
    return jnp.einsum("hts,hsd->htd", p, v).transpose(1, 0, 2).reshape(t, s)


@pytest.mark.parametrize("t,n_head,d,true_len,block_q",
                         [(256, 4, 64, 250, 128),
                          (256, 2, 128, 256, 256),
                          (512, 4, 64, 500, 512)])
def test_kernel_matches_reference(t, n_head, d, true_len, block_q):
    s = n_head * d
    qkv = jax.random.normal(jax.random.PRNGKey(0), (t, 3 * s),
                            jnp.float32) * 0.5
    ref = _ref(qkv.astype(jnp.bfloat16).astype(jnp.float32), n_head,
               true_len)
    got = self_attention_qkv(qkv, n_head, true_len=true_len,
                             block_q=block_q).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(got[:true_len] - ref[:true_len]))
                / (jnp.max(jnp.abs(ref[:true_len])) + 1e-9))
    assert err < 2e-2, err
    # junk rows must stay finite (they ride the residual stream)
    assert bool(jnp.all(jnp.isfinite(got)))


def test_encode_wiring_matches_flash_path(monkeypatch):
    """encode() output is identical whether attention runs through the
    fused-buffer kernel or the XLA fallback (d=64 heads, padded T)."""
    from whisper_tpu.models.whisper.hparams import WhisperHParams
    from whisper_tpu.models.whisper import model as M
    from whisper_tpu.utils.synth import synth_params

    hp = WhisperHParams(
        n_vocab=100, n_audio_ctx=384, n_audio_state=256, n_audio_head=4,
        n_audio_layer=2, n_text_ctx=64, n_text_state=256, n_text_head=4,
        n_text_layer=1, n_mels=80)
    params = synth_params(hp, jnp.bfloat16)
    mel = jax.random.normal(jax.random.PRNGKey(1),
                            (hp.n_mels, 2 * hp.n_audio_ctx),
                            jnp.float32) * 0.1

    monkeypatch.setenv("WTPU_ENC_ATTN", "xla")
    ref = M.encode(params, mel, hp, dtype=jnp.bfloat16, pad_to=512)
    monkeypatch.setenv("WTPU_ENC_ATTN", "pallas")
    got = M.encode(params, mel, hp, dtype=jnp.bfloat16, pad_to=512)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    assert err < 0.05, err


def test_odd_head_count_keeps_fallback(monkeypatch):
    """d=64 heads pair up in the kernel's 128-lane blocks, so an ODD head
    count must route to the flash/XLA fallback instead of crashing."""
    from whisper_tpu.models.whisper.hparams import WhisperHParams
    from whisper_tpu.models.whisper import model as M
    from whisper_tpu.utils.synth import synth_params

    hp = WhisperHParams(
        n_vocab=100, n_audio_ctx=384, n_audio_state=192, n_audio_head=3,
        n_audio_layer=1, n_text_ctx=64, n_text_state=192, n_text_head=3,
        n_text_layer=1, n_mels=80)
    params = synth_params(hp, jnp.bfloat16)
    mel = jax.random.normal(jax.random.PRNGKey(2),
                            (hp.n_mels, 2 * hp.n_audio_ctx),
                            jnp.float32) * 0.1
    monkeypatch.setenv("WTPU_ENC_ATTN", "pallas")
    out = M.encode(params, mel, hp, dtype=jnp.bfloat16, pad_to=512)
    assert out.shape == (hp.n_audio_ctx, hp.n_audio_state)
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))
