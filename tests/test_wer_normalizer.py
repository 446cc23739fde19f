"""Differential test: evals/wer.py's English normalizer vs the reference's
vendored OpenAI EnglishTextNormalizer (reference
tests/librispeech/normalizers/ — pure Python, runnable offline).

The normalizer decides every WER number the eval harness will ever report;
any skew is silent.  This test runs both normalizers over a hand corpus of
the tricky transformations plus a deterministic fuzz corpus of generated
number/currency phrases and requires EXACT agreement (modulo outer
whitespace, which word-level WER cannot see)."""

import itertools
import pathlib
import random
import sys

import pytest

REF_NORM_DIR = pathlib.Path("/root/reference/tests/librispeech")

pytestmark = pytest.mark.skipif(
    not (REF_NORM_DIR / "normalizers" / "english.py").exists(),
    reason="reference normalizers not available")


@pytest.fixture(scope="module")
def ref_normalizer():
    sys.path.insert(0, str(REF_NORM_DIR))
    try:
        from normalizers import EnglishTextNormalizer
    except ImportError as e:  # missing regex/more_itertools
        pytest.skip(f"reference normalizer deps unavailable: {e}")
    finally:
        sys.path.remove(str(REF_NORM_DIR))
    return EnglishTextNormalizer()


HAND_CORPUS = [
    "Hello, World!",
    "I won't be there; he can't either.",
    "Let's meet at ten o'clock.",
    "One hundred and twenty three apples",
    "the twenty-first century",
    "Three point five percent growth",
    "$20 million in revenue",
    "Mr. Brown met Dr. Smith Jr. on 5th Ave.",
    "it's nineteen sixty a.m. [inaudible] (laughs)",
    "He's got one oh one problems",
    "I'm gonna go; y'all wanna come?",
    "naïve façade coöperation",
    "she owes me fifty pounds",
    "the 1960s were wild",
    "one two three four five",
    "a hundred thousand dollars",
    "thirty-seven and a half",
    "um, uh, you know, it's fine",
    "THE QUICK BROWN FOX",
    "couldn't shouldn't wouldn't",
    "two dollars and seven cents",
    "zero point seven nine dollars",
    "minus forty degrees, plus five",
    "double oh seven, triple six",
    "nineteen eighty-four was twenty years after nineteen sixty-four",
    "the one hundred and first airborne",
    "ten per cent of one percent",
    "three million two hundred thousand and twelve",
    "he finished fourth, she finished twenty-second",
    "sixes and sevens, twenties and thirties",
    "one point five billion euros",
    "IP one ninety two point one sixty eight point zero point one",
    "Prof. O'Brien's co-operation with the capt wasn't optional",
    "realise colour flavour theatre organisation",
    "a dozen eggs cost two pound fifty",
    "we'd been there, she's been here, they'd gone home",
    "I'ma do it, imma try",
    "woulda coulda shoulda, ma'am",
    "half past two, two and a half, and a half",
    "the 3rd of March, the 2 nd try, 1 st place",
    "one thousand and one nights",
    "it cost $1,234,567.89 exactly",
    "99.9% pure",
    "the temperature is -5 today",
    "№ 42 § text ™ symbols © everywhere",
    "ONE One oNe ones",
]

# spelled-out-number fuzz: deterministic combinations through the state
# machine's edge paths
_ONES = ["one", "two", "six", "nine", "ten", "eleven", "fifteen",
         "nineteen"]
_TENS = ["twenty", "forty", "ninety"]
_MULTS = ["hundred", "thousand", "million"]
_SUFFIX_WORDS = ["dollars", "cents", "pounds", "euros", "percent", "per",
                 "people"]
_LEAD = ["", "minus", "negative", "plus", "about", "nearly"]


def _fuzz_corpus():
    rng = random.Random(20260819)
    phrases = []
    for lead, a, b, m, suf in itertools.product(
            _LEAD, _ONES[:4], _TENS, _MULTS, _SUFFIX_WORDS):
        if rng.random() < 0.12:
            phrases.append(f"{lead} {b} {a} {m} {suf} total".strip())
    for a, b in itertools.product(_ONES, _ONES):
        phrases.append(f"{a} point {b}")
        phrases.append(f"{a} oh {b}")
        phrases.append(f"double {a} {b}")
    for a in _ONES:
        for m in _MULTS:
            phrases.append(f"{a} {m} and a half")
            phrases.append(f"{a} {m}th time")
            phrases.append(f"{a} {m}s of them")
    for t in _TENS:
        for a in _ONES[:6]:
            phrases.append(f"{t} {a}")
            phrases.append(f"{t} {a}th")
    # mixed arabic/spelled, suffix re-attachment, odd spacing
    phrases += [
        "I have 2 and you have three",
        "chapter 11 verse twelve",
        "the year 1999 and the year two thousand",
        "5 th of november",
        "70 s music, the 70s, 70 s",
        "3.14159 is pi",
        "1 000 000 dollars",
    ]
    return phrases


def _check(ref_normalizer, cases):
    from whisper_tpu.evals.wer import normalize_english

    bad = []
    for c in cases:
        want = ref_normalizer(c).strip()
        want = " ".join(want.split())
        got = normalize_english(c)
        if want != got:
            bad.append((c, want, got))
    assert not bad, "\n".join(
        f"in={c!r}\n  ref={w!r}\n  got={g!r}" for c, w, g in bad[:20])


def test_hand_corpus(ref_normalizer):
    _check(ref_normalizer, HAND_CORPUS)


def test_number_fuzz(ref_normalizer):
    corpus = _fuzz_corpus()
    assert len(corpus) > 300
    _check(ref_normalizer, corpus)


def test_reference_transcripts(ref_normalizer):
    """Real whisper output text: the reference's committed en-*-ref.txt."""
    refs = sorted(pathlib.Path("/root/reference/tests").glob("en-*-ref.txt"))
    if not refs:
        pytest.skip("no committed reference transcripts")
    lines = []
    for p in refs:
        lines += [ln for ln in p.read_text().splitlines() if ln.strip()]
    assert lines
    _check(ref_normalizer, lines)


def test_spelling_table_matches_reference():
    """The vendored British->American table is byte-equal in content to the
    reference's english.json (regenerate with tools/gen_spelling_map.py)."""
    import json

    ours = json.loads(
        (pathlib.Path(__file__).parents[1] / "whisper_tpu" / "evals" /
         "data" / "english_spellings.json").read_text())
    theirs = json.loads(
        (REF_NORM_DIR / "normalizers" / "english.json").read_text())
    assert ours == theirs


def test_wer_computation():
    """WER math sanity on top of the normalizer (jiwer-definition corpus
    WER: (S+D+I)/N over the whole corpus)."""
    from whisper_tpu.evals.wer import wer

    assert wer(["the cat sat"], ["the cat sat"]) == 0.0
    assert wer(["the cat sat"], ["the cat"]) == pytest.approx(1 / 3)
    # normalization folds case/punct/numbers before scoring
    assert wer(["It costs twenty dollars."], ["it costs $20"]) == 0.0
