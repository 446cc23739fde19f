"""Numeric parity of the JAX pipeline vs the reference C++ implementation.

tests/data/mini-jfk.{logits,tokens}.f32 were produced by tools/oracle/oracle_dump.cpp
running the reference build on the deterministic mini model (.fixtures/mini-f16.bin,
seed 0) with samples/jfk.wav: 8 greedy raw-logit decode steps after encoding
window 0.  We teacher-force the reference's token sequence and assert logit
agreement.  Differences are f16-rounding (the reference keeps KV in f16 and
computes in mixed f16/f32; we compute f32 here).
"""

import pathlib

import numpy as np
import pytest

DATA = pathlib.Path(__file__).parent / "data"


@pytest.fixture(scope="module")
def traces():
    lp = DATA / "mini-jfk.logits.f32"
    tp = DATA / "mini-jfk.tokens.f32"
    if not lp.exists():
        pytest.skip("oracle traces not available")
    logits = np.fromfile(lp, dtype="<f4").reshape(8, -1)
    tokens = np.fromfile(tp, dtype="<f4").astype(int)
    return logits, tokens


def test_logit_parity(mini_model, jfk_pcm, traces):
    import jax
    import jax.numpy as jnp

    from whisper_tpu.audio.mel import LogMel
    from whisper_tpu.models.whisper import model as M

    ref_logits, ref_tokens = traces
    m = mini_model
    hp = m.hparams
    mel, _ = LogMel(m.filters.data)(jfk_pcm)
    window = jnp.asarray(mel[:, : 2 * hp.n_audio_ctx])

    params = jax.tree.map(jnp.asarray, m.params)
    enc = M.encode(params, window, hp, dtype=jnp.float32)
    xk, xv = M.compute_cross_kv(params, enc, hp, dtype=jnp.float32)

    cache = M.KVCache.zeros(hp, 1)
    # teacher-force the reference's token trajectory
    seq = [m.vocab.token_sot] + list(ref_tokens[:-1])
    for step, tok in enumerate(seq):
        tokens = jnp.array([[tok]], dtype=jnp.int32)
        pos = jnp.array([[step]], dtype=jnp.int32)
        logits, cache = M.decode_step(
            params, tokens, pos, jnp.int32(step), cache, xk, xv, hp,
            dtype=jnp.float32)
        lg = np.asarray(logits[0, -1])
        ref = ref_logits[step]
        scale = np.abs(ref).max()
        rel = np.abs(lg - ref).max() / scale
        assert rel < 5e-2, f"step {step}: rel logit diff {rel}"
        # top-1 agreement modulo near-ties
        if step < 3:
            assert int(lg.argmax()) == ref_tokens[step]


def test_encoder_shapes(mini_model, jfk_pcm):
    import jax
    import jax.numpy as jnp

    from whisper_tpu.audio.mel import LogMel
    from whisper_tpu.models.whisper import model as M

    m = mini_model
    hp = m.hparams
    mel, n_len_org = LogMel(m.filters.data)(jfk_pcm)
    assert mel.shape[0] == hp.n_mels
    assert n_len_org == 1 + (len(jfk_pcm) + 200 - 400) // 160
    params = jax.tree.map(jnp.asarray, m.params)
    enc = M.encode(params, jnp.asarray(mel[:, : 2 * hp.n_audio_ctx]), hp,
                   dtype=jnp.float32)
    assert enc.shape == (hp.n_audio_ctx, hp.n_audio_state)
    assert np.isfinite(np.asarray(enc)).all()
