"""WER computation + text normalization for the evaluation harnesses.

The reference evaluates with jiwer after OpenAI's EnglishTextNormalizer
(tests/librispeech/eval.py:30-46).  jiwer isn't vendored here; WER is a
plain Levenshtein distance over words, and the normalizer implements the
standard core of the OpenAI normalizer (lowercasing, bracket/parenthesis
removal, punctuation stripping, whitespace collapse, common English
contractions and abbreviation periods) — enough for apples-to-apples
comparisons between this framework's outputs and the reference's on the
same normalizer.
"""

from __future__ import annotations

import re
from typing import Iterable, List, Tuple

_CONTRACTIONS = {
    "won't": "will not", "can't": "can not", "let's": "let us",
    "ain't": "aint", "y'all": "you all", "wanna": "want to",
    "gotta": "got to", "gonna": "going to", "i'ma": "i am going to",
    "imma": "i am going to",
}
_SUFFIXES = [("'s", " s"), ("'re", " are"), ("'ve", " have"),
             ("'m", " am"), ("'ll", " will"), ("'d", " would"),
             ("n't", " not")]


def normalize_english(text: str) -> str:
    s = text.lower()
    s = re.sub(r"[<\[][^>\]]*[>\]]", "", s)   # drop bracketed annotations
    s = re.sub(r"\(([^)]+?)\)", "", s)        # drop parenthesized
    for k, v in _CONTRACTIONS.items():
        s = s.replace(k, v)
    for suf, rep in _SUFFIXES:
        s = re.sub(rf"(\w){re.escape(suf)}\b", rf"\1{rep}", s)
    s = re.sub(r"\b(mr|mrs|ms|dr|prof|st|jr|sr)\.", r"\1", s)
    s = re.sub(r"[^\w\s']", " ", s)           # punctuation -> space
    s = s.replace("'", "")
    s = re.sub(r"\s+", " ", s).strip()
    return s


def _edit_ops(ref: List[str], hyp: List[str]) -> Tuple[int, int, int]:
    """(substitutions, deletions, insertions) of the minimal alignment."""
    n, m = len(ref), len(hyp)
    # dp over (cost, subs, dels, ins)
    import numpy as np

    cost = np.zeros((n + 1, m + 1), np.int32)
    cost[:, 0] = np.arange(n + 1)
    cost[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        prev = cost[i - 1]
        cur = cost[i]
        for j in range(1, m + 1):
            sub = prev[j - 1] + (ref[i - 1] != hyp[j - 1])
            cur[j] = min(sub, prev[j] + 1, cur[j - 1] + 1)
    # backtrace for op counts
    i, j = n, m
    subs = dels = ins = 0
    while i > 0 or j > 0:
        if i > 0 and j > 0 and cost[i, j] == cost[i - 1, j - 1] + \
                (ref[i - 1] != hyp[j - 1]):
            subs += ref[i - 1] != hyp[j - 1]
            i, j = i - 1, j - 1
        elif i > 0 and cost[i, j] == cost[i - 1, j] + 1:
            dels += 1
            i -= 1
        else:
            ins += 1
            j -= 1
    return subs, dels, ins


def wer(references: Iterable[str], hypotheses: Iterable[str],
        normalize: bool = True) -> float:
    """Corpus-level word error rate."""
    total_err = 0
    total_ref = 0
    for ref, hyp in zip(references, hypotheses):
        if normalize:
            ref, hyp = normalize_english(ref), normalize_english(hyp)
        r, h = ref.split(), hyp.split()
        s, d, i = _edit_ops(r, h)
        total_err += s + d + i
        total_ref += len(r)
    return total_err / max(1, total_ref)
