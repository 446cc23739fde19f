"""Parakeet-TDT tests (reference: tests/test-parakeet.cpp,
tests/test-parakeet-full.cpp, tests/parakeet-verification.h).

Oracle: the reference's tiny real-structure test model
(for-tests-ggml-parakeet-tdt.bin) transcribes jfk.wav to a deterministic
string; with random weights many decisions are near-ties, so comparison uses
the reference's own similarity-threshold methodology (>= 0.95).
"""

import difflib
import pathlib

import numpy as np
import pytest

from whisper_tpu.models.parakeet.context import FullParams, ParakeetContext
from whisper_tpu.models.parakeet.hparams import ParakeetHParams
from whisper_tpu.models.parakeet.load import load_parakeet_model
from whisper_tpu.models.parakeet.mel import log_mel_spectrogram
from whisper_tpu.models.parakeet import tokenizer as tok
from whisper_tpu.models.parakeet.writer import (synth_parakeet_tensors,
                                                write_parakeet_model)

MODELS = pathlib.Path("/root/reference/models")
TEST_MODEL = MODELS / "for-tests-ggml-parakeet-tdt.bin"
BAD_MODEL = MODELS / "for-tests-ggml-parakeet-tdt-bad-nfft0.bin"
JFK = pathlib.Path("/root/reference/samples/jfk.wav")

# .oracle/build/bin/parakeet-cli -m for-tests-ggml-parakeet-tdt.bin -f jfk.wav
ORACLE_JFK = "beebeeebebeebebeeeeeebebebeebebebebeebeeebeebee"


def similarity(a: str, b: str) -> float:
    return difflib.SequenceMatcher(None, a, b).ratio()


@pytest.fixture(scope="module")
def jfk_samples():
    if not JFK.exists():
        pytest.skip("jfk.wav not available")
    from whisper_tpu.audio.io import load_audio

    samples, _ = load_audio(str(JFK))
    return samples


def test_load_test_model():
    """Mirrors tests/test-parakeet.cpp hparams assertions."""
    if not TEST_MODEL.exists():
        pytest.skip("parakeet test model not available")
    m = load_parakeet_model(str(TEST_MODEL))
    hp = m.hparams
    assert hp.n_vocab == 10 and hp.n_audio_layer == 1
    assert hp.n_fft == 64 and hp.n_mels == 16
    assert hp.tdt_durations == (0, 1)
    assert m.vocab.token_blank == 10
    assert m.vocab.id_to_token[m.vocab.token_blank] == "[BLANK]"
    assert m.vocab.token_unk == 0 and m.vocab.token_bos == 1
    assert m.filters.shape == (16, 33)
    assert len(m.window) == 64
    assert not m.is_empty


def test_bad_model_rejected():
    """Corrupt-model negative test (tests/CMakeLists.txt:126-135)."""
    if not BAD_MODEL.exists():
        pytest.skip("bad parakeet test model not available")
    with pytest.raises(ValueError):
        load_parakeet_model(str(BAD_MODEL))


def test_jfk_similarity_vs_reference(jfk_samples):
    if not TEST_MODEL.exists():
        pytest.skip("parakeet test model not available")
    ctx = ParakeetContext.from_file(str(TEST_MODEL))
    assert ctx.full(jfk_samples) == 0
    text = ctx.full_text()
    sim = similarity(text, ORACLE_JFK)
    assert sim >= 0.95, (text, sim)
    # token data sanity: frames monotone, 10 ms tick timestamps
    tds = ctx.result_all[0].tokens
    frames = [td.frame_index for td in tds]
    assert frames == sorted(frames)
    for td in tds:
        assert td.t0 == td.frame_index * ctx.hp.subsampling_factor
        assert 0.0 <= td.p <= 1.0


def test_chunk_streaming_state(jfk_samples):
    """parakeet_chunk keeps LSTM state across chunks; no_context resets."""
    if not TEST_MODEL.exists():
        pytest.skip("parakeet test model not available")
    ctx = ParakeetContext.from_file(str(TEST_MODEL))
    half = len(jfk_samples) // 2
    ctx.full(jfk_samples[:half])
    n1 = len(ctx.decoded_tokens)
    ctx.chunk(jfk_samples[half:])  # continues state
    assert len(ctx.decoded_tokens) > n1
    # full() with no_context resets everything
    ctx.full(jfk_samples[:half])
    assert len(ctx.decoded_tokens) == n1


def test_tokenize_detokenize():
    if not TEST_MODEL.exists():
        pytest.skip("parakeet test model not available")
    m = load_parakeet_model(str(TEST_MODEL))
    ids = tok.tokenize(m.vocab, "be bag")
    assert all(0 <= i < m.vocab.token_blank for i in ids)
    # this vocab has no meta-space pieces: whitespace falls back to <unk>
    # (greedy longest-match, src/parakeet.cpp:2911-2944)
    assert m.vocab.token_unk in ids
    text = tok.detokenize(m.vocab, ids)
    assert text == "bebag"
    assert tok.piece_to_text("▁abc", True) == "abc"
    assert tok.piece_to_text("▁abc", False) == " abc"
    assert tok.piece_to_text("[BLANK]", False) == ""


def test_synth_model_roundtrip(tmp_path):
    hp = ParakeetHParams(
        n_vocab=16, n_audio_ctx=512, n_audio_state=16, n_audio_head=2,
        n_audio_layer=2, n_mels=16, n_fft=64, subsampling_factor=8,
        n_subsampling_channels=4, n_conv_kernel=3, n_pred_dim=16,
        n_pred_layers=2, n_tdt_durations=3, n_max_tokens=4,
        tdt_durations=(0, 1, 2))
    filters = np.random.default_rng(0).random((16, 33)).astype(np.float32)
    window = np.hanning(64).astype(np.float32)
    vocab = [b"<unk>", b"<s>", b"</s>"] + [bytes([97 + i]) for i in range(13)]
    path = tmp_path / "parakeet-synth.bin"
    write_parakeet_model(str(path), hp, filters, window, vocab,
                         synth_parakeet_tensors(hp))
    ctx = ParakeetContext.from_file(str(path))
    assert ctx.hp.n_pred_layers == 2
    rng = np.random.default_rng(1)
    pcm = (0.1 * rng.standard_normal(16000)).astype(np.float32)
    assert ctx.full(pcm) == 0  # runs end-to-end without error


def test_local_attention_matches_global(monkeypatch):
    """With T <= window+1 every key falls inside the local window, so the
    banded path must match full attention numerically."""
    import jax.numpy as jnp

    from whisper_tpu.models.parakeet import model as M

    rng = np.random.default_rng(2)
    S, n_head, T = 16, 2, 96
    layer = {
        "attn_q_w": rng.standard_normal((S, S)).astype(np.float32) * 0.2,
        "attn_k_w": rng.standard_normal((S, S)).astype(np.float32) * 0.2,
        "attn_v_w": rng.standard_normal((S, S)).astype(np.float32) * 0.2,
        "attn_out_w": rng.standard_normal((S, S)).astype(np.float32) * 0.2,
        "attn_pos_w": rng.standard_normal((S, S)).astype(np.float32) * 0.2,
        "pos_bias_u": rng.standard_normal((n_head, S // n_head)).astype(np.float32) * 0.1,
        "pos_bias_v": rng.standard_normal((n_head, S // n_head)).astype(np.float32) * 0.1,
    }
    layer = {k: jnp.asarray(v) for k, v in layer.items()}
    x = jnp.asarray(rng.standard_normal((T, S)).astype(np.float32))

    mask_1d = jnp.zeros(T)
    valid_1d = jnp.ones(T, bool)
    out_g = M._rel_attention_global(x, layer, n_head, mask_1d, jnp.float32)
    out_l = M._rel_attention_local(x, layer, n_head, valid_1d, jnp.float32)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_l),
                               rtol=2e-4, atol=2e-5)


def test_mel_matches_reference_oracle(jfk_samples, tmp_path):
    """Our mel fed into the REFERENCE pipeline must reproduce the oracle
    text exactly (cross-implementation mel parity)."""
    import subprocess

    oracle = pathlib.Path("/root/repo/.oracle/parakeet_oracle")
    if not (oracle.exists() and TEST_MODEL.exists()):
        pytest.skip("parakeet oracle binary not built")
    m = load_parakeet_model(str(TEST_MODEL))
    mel = log_mel_spectrogram(jfk_samples, m.filters, m.window, m.hparams.n_fft)
    mel_f = tmp_path / "mel.f32"
    mel.astype("<f4").tofile(mel_f)
    r = subprocess.run(
        [str(oracle), str(TEST_MODEL), "mel", str(mel_f),
         str(mel.shape[0]), str(mel.shape[1])],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=300)
    assert r.returncode == 0, r.stderr[-500:]
    assert r.stdout.strip().splitlines()[-1] == ORACLE_JFK


def test_full_batch_matches_sequential(jfk_samples):
    """Batched serving (vmapped encoder + vmapped TDT loop) matches a
    sequential run at the same padded mel shape, utterance by utterance."""
    if not TEST_MODEL.exists():
        pytest.skip("parakeet test model not available")
    ctx = ParakeetContext.from_file(str(TEST_MODEL))
    utts = [jfk_samples, jfk_samples[: len(jfk_samples) // 2],
            jfk_samples[: len(jfk_samples) // 3]]
    results = ctx.full_batch(utts)
    assert len(results) == 3
    # jfk through the batched path still matches the reference oracle
    assert similarity(results[0][0].text, ORACLE_JFK) >= 0.95

    # sequential oracle at the identical padded shape (padding frames shift
    # conv-boundary numerics, so shapes must match for exact comparison)
    mels = [log_mel_spectrogram(s, ctx.model.filters, ctx.model.window,
                                ctx.hp.n_fft) for s in utts]
    bucket = max(64, 1 << (max(m.shape[0] for m in mels) - 1).bit_length())
    seq = ParakeetContext.from_file(str(TEST_MODEL))
    for i, m in enumerate(mels):
        n_org = m.shape[0]
        seq.reset_state()
        seq.result_all.clear()
        seq.set_mel(np.pad(m, ((0, bucket - n_org), (0, 0))))
        seq.n_len_org = n_org
        assert seq.chunk(None) == 0
        assert seq.full_text() == "".join(s.text for s in results[i])
        seq_toks = [td.id for s in seq.result_all for td in s.tokens]
        bat_toks = [td.id for s in results[i] for td in s.tokens]
        assert seq_toks == bat_toks


def test_full_batch_empty_and_state():
    if not TEST_MODEL.exists():
        pytest.skip("parakeet test model not available")
    ctx = ParakeetContext.from_file(str(TEST_MODEL))
    assert ctx.full_batch([]) == []
    # batched path must not disturb the streaming decode state
    assert ctx.decoded_tokens == []


def test_chunked_decode_matches_frame_loop():
    """The chunked TDT loop (decode._tdt_greedy_decode_chunked — probed
    and REJECTED as the production default, which remains the chunk=1
    frame loop; see decode.py) must reproduce the per-frame reference loop
    token-for-token: same tokens, frame indices, durations and LSTM state
    (p/plog/logits may differ at f32 ULP from the batched joint matmul's
    reduction order — bounded here)."""
    if not TEST_MODEL.exists():
        pytest.skip("parakeet test model not available")
    import jax
    import jax.numpy as jnp

    from whisper_tpu.models.parakeet.decode import _tdt_greedy_decode

    m = load_parakeet_model(str(TEST_MODEL))
    hp = m.hparams
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32),
                                    m.params)
    rng = np.random.default_rng(0)
    h0 = jnp.zeros((hp.n_pred_layers, hp.n_pred_dim), jnp.float32)
    c0 = jnp.zeros_like(h0)
    for T in (5, 37, 120):
        enc = jnp.asarray(
            rng.standard_normal((T, hp.n_audio_state)).astype(np.float32))
        a = _tdt_greedy_decode(params, enc, jnp.int32(T), h0, c0, hp,
                               4 * T + 64, capture_logits=True, chunk=1)
        b = _tdt_greedy_decode(params, enc, jnp.int32(T), h0, c0, hp,
                               4 * T + 64, capture_logits=True, chunk=16)
        na, nb = int(a[6]), int(b[6])
        assert na == nb, (T, na, nb)
        for i in (0, 1, 2, 3):   # tok, frame, didx, dval: exact
            assert np.array_equal(np.asarray(a[i][:na]),
                                  np.asarray(b[i][:na])), (T, i)
        for i in (4, 5):         # p, plog: ULP-level
            assert np.allclose(np.asarray(a[i][:na]), np.asarray(b[i][:na]),
                               atol=1e-4), (T, i)
        assert np.array_equal(np.asarray(a[7]), np.asarray(b[7]))  # h
        assert np.array_equal(np.asarray(a[8]), np.asarray(b[8]))  # c
        assert np.allclose(np.asarray(a[9][:na]), np.asarray(b[9][:na]),
                           atol=1e-4)


def test_jax_mel_matches_numpy():
    """Device-path mel (mel.log_mel_spectrogram_jax, ParakeetContext
    mel_backend='jax') vs the oracle-exact numpy path: same shape, FFT/
    accumulation rounding only (the normalized mel is O(1)-scaled, so a
    tight absolute tolerance bounds the relative error)."""
    if not TEST_MODEL.exists():
        pytest.skip("parakeet test model not available")
    from whisper_tpu.audio.io import load_audio
    from whisper_tpu.models.parakeet.mel import (log_mel_spectrogram,
                                                 log_mel_spectrogram_jax)

    m = load_parakeet_model(str(TEST_MODEL))
    samples, _ = load_audio(str(JFK))
    rng = np.random.default_rng(3)
    cases = [samples, samples[: 16000 * 2 + 137],
             rng.standard_normal(16000).astype(np.float32) * 0.1]
    for s in cases:
        a = log_mel_spectrogram(s, m.filters, m.window, m.hparams.n_fft)
        b = np.asarray(log_mel_spectrogram_jax(s, m.filters, m.window,
                                               m.hparams.n_fft))
        assert a.shape == b.shape, (a.shape, b.shape)
        assert np.max(np.abs(a - b)) < 2e-4, np.max(np.abs(a - b))


def test_mel_backend_jax_transcribes():
    """ParakeetContext(mel_backend='jax') end-to-end: the device mel's
    ~1e-6 rounding must not change the test model's transcript."""
    if not TEST_MODEL.exists():
        pytest.skip("parakeet test model not available")
    from whisper_tpu.audio.io import load_audio

    samples, _ = load_audio(str(JFK))
    ref = ParakeetContext.from_file(str(TEST_MODEL))
    ref.full(samples, FullParams())
    jx = ParakeetContext.from_file(str(TEST_MODEL), mel_backend="jax")
    jx.full(samples, FullParams())
    assert jx.full_text() == ref.full_text()
