"""Logit filters — bit-faithful port of `whisper_process_logits`
(src/whisper.cpp:6194-6469).  These ~10 interacting rules, not the matmuls,
determine transcription parity with the reference, so they run on host in
float32 numpy with the exact operation order.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import List, Optional, TYPE_CHECKING

import numpy as np

from .languages import LANGUAGES
from .tokenizer import WhisperVocab

if TYPE_CHECKING:
    from .params import TranscribeParams

CHUNK_SIZE = 30  # WHISPER_CHUNK_SIZE

# tokens never allowed mid-transcription (openai tokenizer.py:224-253 via
# src/whisper.cpp:6147-6152)
NON_SPEECH_TOKENS = [
    "\"", "#", "(", ")", "*", "+", "/", ":", ";", "<", "=", ">", "@", "[",
    "\\", "]", "^", "_", "`", "{", "|", "}", "~", "「", "」", "『", "』",
    "<<", ">>", "<<<", ">>>", "--", "---", "-(", "-[", "('", "(\"", "((",
    "))", "(((", ")))", "[[", "]]", "{{", "}}", "♪♪", "♪♪♪", "♩", "♪",
    "♫", "♬", "♭", "♮", "♯",
]

NEG_INF = -np.inf


@dataclass
class LogitFilterTables:
    """Per-vocab constant id tables, computed once at context init."""

    vocab: WhisperVocab
    n_audio_ctx: int
    space_id: Optional[int] = None
    lang_ids: List[int] = field(default_factory=list)
    nst_ids: List[int] = field(default_factory=list)

    def __post_init__(self):
        v = self.vocab
        self.space_id = v.token_to_id.get(b" ")
        self.lang_ids = [v.token_sot + 1 + i for i in range(len(LANGUAGES))]
        ids = set()
        for tok in NON_SPEECH_TOKENS:
            for s in (tok, " " + tok):
                tid = v.token_to_id.get(s.encode("utf-8"))
                if tid is not None:
                    ids.add(tid)
        for s in (b" -", b" '"):
            tid = v.token_to_id.get(s)
            if tid is not None:
                ids.add(tid)
        self.nst_ids = sorted(ids)

    def regex_ids(self, pattern: str) -> List[int]:
        rx = re.compile(pattern)
        out = []
        for tok, tid in self.vocab.token_to_id.items():
            if rx.fullmatch(tok.decode("utf-8", errors="replace")):
                out.append(tid)
        return out


def compute_logprobs(logits: np.ndarray) -> np.ndarray:
    """log_softmax treating -inf as masked (whisper_compute_logprobs,
    src/whisper.cpp:6154-6174)."""
    lmax = np.max(logits)
    finite = logits > NEG_INF
    lse = np.log(np.sum(np.exp(np.where(finite, logits - lmax, NEG_INF)),
                        where=finite, dtype=np.float32)) + lmax
    return np.where(finite, logits - lse, NEG_INF).astype(np.float32)


def compute_probs(logits: np.ndarray, logprobs: np.ndarray) -> np.ndarray:
    """probs[i] = exp(logprob[i]), 0 where suppressed (whisper_compute_probs)."""
    return np.where(logits > NEG_INF, np.exp(logprobs), 0.0).astype(np.float32)


def process_logits(
    raw_logits: np.ndarray,
    tables: LogitFilterTables,
    params: "TranscribeParams",
    temperature: float,
    tokens_cur: list,        # list of TokenData sampled so far this window
    has_ts: bool,
    seek_delta: int,
    grammar=None,
):
    """Apply all filters; returns (logits, logprobs, probs) float32 arrays.

    Operation order matches whisper_process_logits exactly.
    """
    vocab = tables.vocab
    n_logits = len(raw_logits)
    is_initial = len(tokens_cur) == 0

    logits = raw_logits.astype(np.float32).copy()
    if temperature > 0.0:
        logits /= np.float32(temperature)

    # suppress blank at start
    if params.suppress_blank and is_initial:
        logits[vocab.token_eot] = NEG_INF
        if tables.space_id is not None:
            logits[tables.space_id] = NEG_INF

    # suppress <|notimestamps|>
    logits[vocab.token_not] = NEG_INF
    if params.no_timestamps:
        logits[vocab.token_beg:] = NEG_INF

    # force timestamp/EOT when max_tokens reached (whisper.cpp PR 3798)
    if (not params.no_timestamps and not params.single_segment
            and params.max_tokens > 0 and len(tokens_cur) >= params.max_tokens):
        logits[:vocab.token_eot] = NEG_INF

    # suppress special tokens
    logits[vocab.token_sot] = NEG_INF
    logits[vocab.token_nosp] = NEG_INF
    if not params.tdrz_enable:
        logits[vocab.token_solm] = NEG_INF
    logits[vocab.token_translate] = NEG_INF
    logits[vocab.token_transcribe] = NEG_INF
    logits[vocab.token_prev] = NEG_INF
    logits[tables.lang_ids] = NEG_INF

    if params.logits_filter_callback is not None:
        params.logits_filter_callback(tokens_cur, logits)

    if params.suppress_regex:
        logits[tables.regex_ids(params.suppress_regex)] = NEG_INF

    if params.suppress_nst:
        logits[tables.nst_ids] = NEG_INF

    # timestamps appear in pairs, except directly before EOT
    last_was_ts = len(tokens_cur) > 0 and tokens_cur[-1].id >= vocab.token_beg
    penultimate_was_ts = len(tokens_cur) < 2 or tokens_cur[-2].id >= vocab.token_beg
    if last_was_ts:
        if penultimate_was_ts:
            logits[vocab.token_beg:] = NEG_INF
        else:
            logits[:vocab.token_eot] = NEG_INF

    # initial timestamp cap
    if is_initial and params.max_initial_ts > 0.0:
        precision = float(CHUNK_SIZE) / tables.n_audio_ctx
        tid0 = int(round(params.max_initial_ts / precision))
        logits[vocab.token_beg + tid0 + 1:] = NEG_INF

    # monotonic timestamps
    if has_ts:
        tid0 = seek_delta // 2
        logits[vocab.token_beg:vocab.token_beg + tid0] = NEG_INF

    logprobs = compute_logprobs(logits)

    # sample timestamp iff sum-prob over timestamps beats max text prob
    ts_slice = logprobs[vocab.token_beg:]
    finite_ts = ts_slice > NEG_INF
    timestamp_logprob = NEG_INF
    if finite_ts.any():
        m = ts_slice[finite_ts].max()
        lse = np.sum(np.exp(ts_slice[finite_ts] - m))
        if lse > 0.0:
            timestamp_logprob = np.log(lse) + m
    max_text_token_logprob = logprobs[:vocab.token_beg].max()

    if timestamp_logprob > max_text_token_logprob:
        logits[:vocab.token_beg] = NEG_INF
        logprobs[:vocab.token_beg] = NEG_INF
    elif grammar is not None and params.grammar_rules:
        from . import grammar as G

        G.suppress_invalid(vocab, params, logits, grammar)
        logprobs = compute_logprobs(logits)

    probs = compute_probs(logits, logprobs)
    return logits, logprobs, probs
