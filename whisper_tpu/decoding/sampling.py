"""Token sampling and sequence scoring.

Ports of whisper_sample_token / whisper_sample_token_topk / whisper_sequence_score
(src/whisper.cpp:6484-6665).  RNG note: the reference uses std::mt19937 +
std::discrete_distribution; we use numpy's MT19937 with the same per-decoder
seeds — the same generator family but not bit-identical draw order, so
stochastic paths (t > 0 fallbacks, beam candidate draws) can differ from the
C++ binary while remaining distributionally identical.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace
from typing import List, Optional

import numpy as np

from .tokenizer import WhisperVocab


@dataclass
class TokenData:
    """whisper_token_data (include/whisper.h:88-108)."""

    id: int = 0
    tid: int = 0
    p: float = 0.0
    plog: float = 0.0
    pt: float = 0.0
    ptsum: float = 0.0
    t0: int = -1
    t1: int = -1
    t_dtw: int = -1
    vlen: float = 0.0


@dataclass
class Sequence:
    """whisper_sequence (src/whisper.cpp:780-795)."""

    tokens: List[TokenData] = field(default_factory=list)
    result_len: int = 0
    sum_logprobs_all: float = 0.0
    sum_logprobs: float = -math.inf
    avg_logprobs: float = -math.inf
    entropy: float = 0.0
    score: float = -math.inf

    def copy(self) -> "Sequence":
        return Sequence(list(self.tokens), self.result_len, self.sum_logprobs_all,
                        self.sum_logprobs, self.avg_logprobs, self.entropy, self.score)


def _timestamp_stats(probs: np.ndarray, token_beg: int, default_tid: int):
    """default_tid matters only when EVERY timestamp prob is zero (the
    no_timestamps suppression): whisper_sample_token zero-initializes tid
    (src/whisper.cpp:6489 `result = {0, ...}`) while whisper_sample_token_topk
    initializes it to token_beg (:6576) — so greedy -nt segments get
    t0 = seek + 2*(0 - token_beg) (a negative time, reproduced for parity)
    and beam -nt segments get t0 = seek."""
    ts = probs[token_beg:]
    sum_ts = float(ts.sum(dtype=np.float64))
    if ts.size and ts.max() > 0:
        arg = int(ts.argmax())
        max_ts = float(ts[arg])
        tid = token_beg + arg
    else:
        max_ts = 0.0
        tid = default_tid
    pt = max_ts / (sum_ts + 1e-10)
    return tid, pt, sum_ts


def sample_token(vocab: WhisperVocab, probs: np.ndarray, logprobs: np.ndarray,
                 best: bool, rng) -> TokenData:
    """Greedy (best=True) or multinomial sample (whisper_sample_token).

    `rng` is a stdrng.StdRng — the bit-exact emulation of the reference's
    per-decoder std::mt19937 + std::discrete_distribution (raw float probs
    go in; the distribution widens/normalizes internally like libstdc++)."""
    tid, pt, ptsum = _timestamp_stats(probs, vocab.token_beg, default_tid=0)
    if best:
        i = int(probs.argmax())
    else:
        i = rng.discrete(probs)
    res = TokenData(id=i, tid=tid, p=float(probs[i]), plog=float(logprobs[i]),
                    pt=pt, ptsum=ptsum)
    if res.id >= vocab.token_beg:
        res.tid = res.id
        res.pt = res.p
    return res


def sample_token_topk(vocab: WhisperVocab, probs: np.ndarray,
                      logprobs: np.ndarray, k: int,
                      rng) -> List[TokenData]:
    """k stochastic draws from the filtered distribution
    (whisper_sample_token_topk, src/whisper.cpp:6543-6616 — despite the name,
    the reference samples candidates from the full distribution).  Beam
    search calls this even at temperature 0: with decisive margins every
    draw is the argmax, but grammar-flattened distributions expose the
    engine, so `rng` must be the stdrng.StdRng libstdc++ emulation."""
    tid, pt, ptsum = _timestamp_stats(probs, vocab.token_beg,
                                      default_tid=vocab.token_beg)
    has_mass = float(probs.sum()) > 0.0
    out = []
    for _ in range(k):
        i = rng.discrete(probs) if has_mass else 0
        td = TokenData(id=i, tid=tid, p=float(probs[i]), plog=float(logprobs[i]),
                       pt=pt, ptsum=ptsum)
        if td.id >= vocab.token_beg:
            td.tid = td.id
            td.pt = td.p
        out.append(td)
    return out


def sequence_score(seq: Sequence, length_penalty: float) -> None:
    """In-place scoring (whisper_sequence_score, src/whisper.cpp:6619-6665)."""
    if seq.result_len == 0:
        return
    result = float(sum(t.plog for t in seq.tokens[: seq.result_len]))
    seq.sum_logprobs = result
    seq.avg_logprobs = result / seq.result_len

    penalty = float(seq.result_len)
    if length_penalty > 0.0:
        penalty = ((5.0 + penalty) / 6.0) ** length_penalty
    seq.score = result / penalty

    # entropy of the last 32 tokens
    n = 32
    counts = {}
    cnt = 0
    for t in seq.tokens[max(0, seq.result_len - n): seq.result_len]:
        counts[t.id] = counts.get(t.id, 0) + 1
        cnt += 1
    entropy = 0.0
    for c in counts.values():
        p = c / cnt
        entropy -= p * math.log(p)
    seq.entropy = entropy


def sequences_equal(a: Sequence, b: Sequence) -> bool:
    if len(a.tokens) != len(b.tokens):
        return False
    for x, y in zip(reversed(a.tokens), reversed(b.tokens)):
        if x.id != y.id:
            return False
    return True
