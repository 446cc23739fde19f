"""Deterministic unit tests of the logit-filter rules
(whisper_process_logits port) using synthetic logits on a real vocab."""

import numpy as np
import pytest

from whisper_tpu.decoding import logits as LF
from whisper_tpu.decoding.params import TranscribeParams
from whisper_tpu.decoding.sampling import TokenData


@pytest.fixture(scope="module")
def tables(mini_model):
    return LF.LogitFilterTables(mini_model.vocab, 1500)


def _run(tables, raw, tokens_cur=(), has_ts=False, seek_delta=3000, t=0.0, **pkw):
    params = TranscribeParams.default()
    for k, v in pkw.items():
        setattr(params, k, v)
    return LF.process_logits(raw, tables, params, t, list(tokens_cur),
                             has_ts, seek_delta)


def test_initial_suppressions(tables):
    v = tables.vocab
    raw = np.zeros(v.n_vocab, np.float32)
    logits, logprobs, probs = _run(tables, raw)
    # blank + EOT suppressed at start
    assert logits[v.token_eot] == -np.inf
    assert logits[tables.space_id] == -np.inf
    # special tokens always suppressed
    for tid in (v.token_not, v.token_sot, v.token_nosp, v.token_solm,
                v.token_translate, v.token_transcribe, v.token_prev):
        assert logits[tid] == -np.inf
    for tid in tables.lang_ids:
        assert logits[tid] == -np.inf
    # max_initial_ts = 1.0 -> timestamps beyond +50 ticks suppressed
    precision = 30.0 / 1500
    tid0 = round(1.0 / precision)
    assert logits[v.token_beg + tid0] > -np.inf
    assert logits[v.token_beg + tid0 + 1] == -np.inf


def test_timestamp_pair_rules(tables):
    v = tables.vocab
    raw = np.zeros(v.n_vocab, np.float32)
    # last was timestamp, penultimate text -> only text+EOT banned; ts allowed
    toks = [TokenData(id=100), TokenData(id=v.token_beg + 5)]
    logits, _, _ = _run(tables, raw, tokens_cur=toks, has_ts=True, seek_delta=10)
    assert np.all(logits[: v.token_eot] == -np.inf)
    # last two both timestamps -> timestamps banned
    toks = [TokenData(id=v.token_beg + 5), TokenData(id=v.token_beg + 5)]
    logits, _, _ = _run(tables, raw, tokens_cur=toks, has_ts=True, seek_delta=10)
    assert np.all(logits[v.token_beg:] == -np.inf)
    assert logits[100] > -np.inf


def test_monotonic_timestamps(tables):
    v = tables.vocab
    raw = np.zeros(v.n_vocab, np.float32)
    # bias towards text so the ts-sum rule doesn't mask everything
    raw[: v.token_beg] = 5.0
    logits, _, _ = _run(tables, raw, tokens_cur=[TokenData(id=100)],
                        has_ts=True, seek_delta=100)
    assert np.all(logits[v.token_beg: v.token_beg + 50] == -np.inf)
    assert logits[v.token_beg + 50] > -np.inf


def test_timestamp_sum_rule(tables):
    """If sum-prob over timestamps beats the max text prob, text is masked."""
    v = tables.vocab
    raw = np.zeros(v.n_vocab, np.float32)
    raw[v.token_beg: v.token_beg + 40] = 4.0  # strong timestamp mass
    logits, logprobs, probs = _run(tables, raw)
    assert np.all(logits[: v.token_beg] == -np.inf)
    assert probs[: v.token_beg].sum() == 0.0
    # the reference does NOT renormalize after this rule: probs keep their
    # pre-mask softmax values (whisper_compute_probs uses the logprobs
    # computed before the text mask), so the sum equals the ts mass < 1
    assert 0.0 < probs.sum() < 1.0
    np.testing.assert_allclose(probs[v.token_beg: v.token_beg + 40],
                               probs[v.token_beg], rtol=1e-5)


def test_no_timestamps_mode(tables):
    v = tables.vocab
    raw = np.zeros(v.n_vocab, np.float32)
    logits, _, _ = _run(tables, raw, no_timestamps=True)
    assert np.all(logits[v.token_beg:] == -np.inf)


def test_temperature_scaling(tables):
    v = tables.vocab
    raw = np.random.default_rng(0).standard_normal(v.n_vocab).astype(np.float32)
    _, lp1, _ = _run(tables, raw, t=0.0)
    _, lp2, _ = _run(tables, raw, t=0.5)
    # t=0.5 doubles logits -> sharper distribution
    assert lp2.max() > lp1.max() - 1e-6


def test_suppress_nst(tables):
    v = tables.vocab
    raw = np.zeros(v.n_vocab, np.float32)
    logits, _, _ = _run(tables, raw, suppress_nst=True)
    for tid in tables.nst_ids:
        assert logits[tid] == -np.inf
    # sanity: the list found a reasonable number of non-speech tokens
    assert len(tables.nst_ids) > 30


def test_logprobs_softmax_consistency(tables):
    v = tables.vocab
    raw = np.random.default_rng(1).standard_normal(v.n_vocab).astype(np.float32)
    raw[: v.token_beg] += 5.0  # keep text branch
    logits, logprobs, probs = _run(tables, raw)
    finite = logits > -np.inf
    assert probs[finite].sum() == pytest.approx(1.0, abs=1e-4)
    np.testing.assert_allclose(probs[finite], np.exp(logprobs[finite]), rtol=1e-5)
