"""Padded-resident encoder parity (model.encode pad_to=...).

On TPU the encoder keeps its residual stream padded to a 512 multiple
for the whole block stack (MXU-aligned matmuls, no per-layer pad/slice
around flash attention).  Junk pad rows are isolated in their own
attention segment, so real rows must be numerically identical to the
unpadded graph.  Exercised here on CPU via the explicit `pad_to` knob
(which routes the non-flash path through the same segment mask).
"""

import numpy as np

import jax
import jax.numpy as jnp

from whisper_tpu.models.whisper import model as M
from whisper_tpu.models.whisper.hparams import WhisperHParams
from whisper_tpu.utils.synth import synth_params

HP = WhisperHParams(n_vocab=128, n_audio_ctx=24, n_audio_state=32,
                    n_audio_head=4, n_audio_layer=3, n_text_ctx=64,
                    n_text_state=32, n_text_head=4, n_text_layer=2,
                    n_mels=80)


def _mel(seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed),
                             (HP.n_mels, 2 * HP.n_audio_ctx), jnp.float32)


def test_padded_encode_matches_unpadded_f32():
    params = synth_params(HP, jnp.float32)
    mel = _mel()
    ref = np.asarray(M.encode(params, mel, HP, dtype=jnp.float32))
    pad = np.asarray(M.encode(params, mel, HP, dtype=jnp.float32, pad_to=32))
    assert pad.shape == ref.shape
    np.testing.assert_allclose(pad, ref, rtol=0, atol=1e-5)


def test_padded_encode_no_nan_with_large_pad():
    # pad block much larger than the real rows; junk rows must not make
    # NaN that could poison reductions
    params = synth_params(HP, jnp.float32)
    out = np.asarray(M.encode(params, _mel(1), HP, dtype=jnp.float32,
                              pad_to=64))
    assert np.isfinite(out).all()


def test_segment_mask_blocks_cross_attention():
    m = np.asarray(M._segment_mask(8, 5))[0]
    assert (m[:5, :5] == 0).all()
    assert (m[5:, 5:] == 0).all()
    assert (m[:5, 5:] < -1e8).all()
    assert (m[5:, :5] < -1e8).all()


def test_block_sizes_divide_padded_length():
    from whisper_tpu.ops.attention import _block_sizes

    for tp in (512, 1024, 1536, 2048, 2560):
        bs = _block_sizes(tp)
        assert tp % bs.block_q == 0
        assert tp % bs.block_k == 0
