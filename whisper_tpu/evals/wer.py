"""WER computation + text normalization for the evaluation harnesses.

The reference evaluates with jiwer after OpenAI's EnglishTextNormalizer
(tests/librispeech/eval.py:30-46).  jiwer isn't vendored here; WER is a
plain Levenshtein distance over words, and the normalizer implements the
standard core of the OpenAI normalizer (lowercasing, bracket/parenthesis
removal, punctuation stripping, whitespace collapse, common English
contractions, abbreviation periods, and spoken-number collapsing —
cardinals, ordinals, "point" decimals, percent) — enough for
apples-to-apples comparisons between this framework's outputs and the
reference's on the same normalizer.
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


# ---- spoken-number normalization (EnglishNumberNormalizer core) -----------
_ONES = {w: i for i, w in enumerate(
    ["zero", "one", "two", "three", "four", "five", "six", "seven", "eight",
     "nine", "ten", "eleven", "twelve", "thirteen", "fourteen", "fifteen",
     "sixteen", "seventeen", "eighteen", "nineteen"])}
_TENS = {w: 10 * i for i, w in enumerate(
    ["twenty", "thirty", "forty", "fifty", "sixty", "seventy", "eighty",
     "ninety"], start=2)}
_MULTS = {"hundred": 100, "thousand": 10 ** 3, "million": 10 ** 6,
          "billion": 10 ** 9, "trillion": 10 ** 12}
_ORD_ONES = {"first": 1, "second": 2, "third": 3, "fifth": 5, "eighth": 8,
             "ninth": 9, "twelfth": 12}
_ORD_ONES.update({w + "th": v for w, v in _ONES.items()
                  if w not in ("one", "two", "three", "five", "eight",
                               "nine", "twelve", "zero")})
_ORD_TENS = {w[:-1] + "ieth": v for w, v in _TENS.items()}
_ORD_MULTS = {w + "th": v for w, v in _MULTS.items()}


def _ord_suffix(n: int) -> str:
    if 10 <= n % 100 <= 20:
        return "th"
    return {1: "st", 2: "nd", 3: "rd"}.get(n % 10, "th")


def _normalize_numbers(s: str) -> str:
    """Collapse spoken cardinals/ordinals into digits ("one hundred and
    twenty three" -> "123", "twenty-first" -> "21st", "three point five" ->
    "3.5", "ten percent" -> "10%"), the core transformation of the
    reference harness's EnglishTextNormalizer (tests/earnings21/normalizers;
    independent implementation)."""
    toks = re.split(r"\s+", s)
    out: List[str] = []
    value = group = 0
    in_num = False
    frac: List[str] = []
    in_frac = False

    def flush():
        nonlocal value, group, in_num, in_frac, frac
        if in_num:
            num = str(value + group)
            if frac:
                num += "." + "".join(frac)
            out.append(num)
        value = group = 0
        in_num = False
        in_frac = False
        frac = []

    after_mult = False
    i = 0
    while i < len(toks):
        t = toks[i]
        parts = t.split("-") if "-" in t and all(
            p in _ONES or p in _TENS or p in _ORD_ONES or p in _ORD_TENS
            for p in t.split("-")) else [t]
        consumed = False
        for t in parts:
            if in_frac and t in _ONES and _ONES[t] <= 9:
                frac.append(str(_ONES[t]))
                consumed = True
            elif t in _ONES:
                if in_frac or (in_num and group % 10 != 0):
                    flush()
                group += _ONES[t]
                in_num = True
                after_mult = False
                consumed = True
            elif t in _TENS:
                if in_num and group % 100 != 0:
                    flush()          # "nineteen eighty" -> two numbers
                group += _TENS[t]
                in_num = True
                after_mult = False
                consumed = True
            elif t == "hundred" and in_num:
                group = max(group, 1) * 100
                after_mult = True
                consumed = True
            elif t in _MULTS and t != "hundred":
                value += max(group, 1) * _MULTS[t]
                group = 0
                in_num = True
                after_mult = True
                consumed = True
            elif t == "point" and in_num:
                in_frac = True
                consumed = True
            elif t == "and" and after_mult and not in_frac \
                    and i + 1 < len(toks) \
                    and (toks[i + 1] in _ONES or toks[i + 1] in _TENS
                         or toks[i + 1] in _ORD_ONES
                         or toks[i + 1] in _ORD_TENS):
                consumed = True      # "one hundred and five"
            elif t == "percent" and in_num:
                v = str(value + group) + ("." + "".join(frac) if frac else "")
                out.append(v + "%")
                value = group = 0
                in_num = in_frac = False
                frac = []
                consumed = True
            elif t == "second" and not in_num:
                flush()              # time unit, not an ordinal
                out.append(t)
                consumed = True
            elif t in _ORD_ONES or t in _ORD_TENS or t in _ORD_MULTS:
                n = (_ORD_ONES.get(t) or _ORD_TENS.get(t)
                     or max(group, 1) * _ORD_MULTS.get(t, 1))
                if t in _ORD_MULTS:
                    n = max(group, 1) * _ORD_MULTS[t] + value
                    value = group = 0
                else:
                    n = value + group + n
                    value = group = 0
                out.append(str(n) + _ord_suffix(n))
                in_num = False
                consumed = True
            else:
                flush()
                out.append(t)
                consumed = True
        if not consumed:
            flush()
            out.append(t)
        i += 1
    flush()
    return " ".join(x for x in out if x)


def normalize_english(text: str) -> str:
    s = text.lower()
    s = re.sub(r"[<\[][^>\]]*[>\]]", "", s)   # drop bracketed annotations
    s = re.sub(r"\(([^)]+?)\)", "", s)        # drop parenthesized
    for k, v in _CONTRACTIONS.items():
        s = s.replace(k, v)
    for suf, rep in _SUFFIXES:
        s = re.sub(rf"(\w){re.escape(suf)}\b", rf"\1{rep}", s)
    s = re.sub(r"\b(mr|mrs|ms|dr|prof|st|jr|sr)\.", r"\1", s)
    s = re.sub(r"[^\w\s'%.$]", " ", s)        # punctuation -> space
    s = s.replace("'", "")
    s = _normalize_numbers(s)
    # strip the number-carrying symbols when not attached to digits, and
    # trailing periods left by the abbreviation pass
    s = re.sub(r"(?<!\d)[%.$]", " ", s)      # keep digit-attached %, ., $
    s = re.sub(r"\.(?!\d)", " ", s)
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
