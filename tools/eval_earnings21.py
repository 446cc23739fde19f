#!/usr/bin/env python
"""Earnings-21 long-form WER evaluation harness.

Mirror of tests/earnings21/{eval.mk,eval.py} (reference): score whisper_tpu
transcripts of the earnings21 media files against the speaker-labelled
`.nlp` reference transcripts, after OpenAI's EnglishTextNormalizer.

The dataset layout matches the reference harness's checkout
(speechcolab/earnings21 under `speech-datasets/`):

  <root>/transcripts/nlp_references/<code>.nlp   pipe-separated: the first
                                                 column is the token, the
                                                 second the speaker label
  <root>/media/<code>.mp3                        the audio
  <code>.mp3.txt next to the media               hypothesis (ours or any
                                                 CLI's -otxt output)

Beyond the reference's corpus WER this also prints a per-speaker WER
breakdown (the `.nlp` speaker column the reference eval discards), which is
what the 39 h earnings calls are labelled for.

Usage:
  # score existing .mp3.txt hypotheses, like the reference eval.py:
  python tools/eval_earnings21.py -d speech-datasets/earnings21 [--csv metadata.csv]
  # or transcribe first with a whisper_tpu model:
  python tools/eval_earnings21.py -d ... -m models/ggml-large-v3.bin
"""

from __future__ import annotations

import argparse
import sys
from collections import defaultdict
from pathlib import Path
from typing import Dict, List, Tuple

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from whisper_tpu.evals.wer import normalize_english, wer


def decode_hypothesis(b: bytes) -> str:
    """Reference eval.py decode_hypothesis: Whisper may emit the
    windows-1252 left-double-quote byte 0x93 (reference issue #3185)."""
    try:
        return b.decode("windows-1252")
    except UnicodeDecodeError:
        return b.decode("utf-8", errors="ignore")


def read_nlp(path: Path) -> List[Tuple[str, str]]:
    """Parse one `.nlp` reference: (token, speaker) per line, header
    skipped (reference eval.py get_reference reads only column 0; the
    speaker label is column 1)."""
    out = []
    with open(path) as fp:
        fp.readline()
        for line in fp:
            cols = line.rstrip("\n").split("|")
            if cols and cols[0]:
                out.append((cols[0], cols[1] if len(cols) > 1 else ""))
    return out


def get_references(root: Path) -> Dict[str, List[Tuple[str, str]]]:
    refs = {}
    for path in sorted((root / "transcripts" / "nlp_references").glob("*.nlp")):
        refs[path.stem] = read_nlp(path)
    return refs


def get_codes(csv_path: Path) -> List[str]:
    codes = []
    with open(csv_path) as fp:
        fp.readline()
        for line in fp:
            if line.strip():
                codes.append(line.split(",")[0])
    return sorted(codes)


def speaker_spans(tokens: List[Tuple[str, str]]) -> List[Tuple[str, str]]:
    """Collapse the token stream into (speaker, utterance-text) spans."""
    spans: List[Tuple[str, List[str]]] = []
    for tok, spk in tokens:
        if spans and spans[-1][0] == spk:
            spans[-1][1].append(tok)
        else:
            spans.append((spk, [tok]))
    return [(spk, " ".join(toks)) for spk, toks in spans]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-d", "--dataset", required=True,
                    help="earnings21 checkout (contains transcripts/ media/)")
    ap.add_argument("--csv", default=None,
                    help="metadata CSV restricting the file list "
                         "(reference eval.py argument)")
    ap.add_argument("-m", "--model", default=None,
                    help="transcribe media/*.mp3 first with this whisper_tpu "
                         "model (otherwise pre-existing .mp3.txt files are "
                         "scored, like the reference eval.py)")
    ap.add_argument("--speakers", action="store_true",
                    help="also print the per-speaker WER breakdown")
    args = ap.parse_args(argv)

    root = Path(args.dataset)
    refs = get_references(root)
    if not refs:
        print(f"error: no .nlp references under {root}", file=sys.stderr)
        return 1
    codes = get_codes(Path(args.csv)) if args.csv else sorted(refs)

    media = root / "media"
    if args.model:
        from whisper_tpu.audio.io import load_audio
        from whisper_tpu.decoding.full import transcribe
        from whisper_tpu.decoding.params import TranscribeParams
        from whisper_tpu.runtime.context import WhisperContext

        ctx = WhisperContext.from_file(args.model)
        for code in codes:
            audio = media / f"{code}.mp3"
            out = media / f"{code}.mp3.txt"
            if out.exists() or not audio.exists():
                continue
            samples, _ = load_audio(str(audio))
            params = TranscribeParams(language="en", print_progress=False)
            segs = transcribe(ctx, params, samples)
            out.write_text("".join(s.text for s in segs).strip() + "\n")
            print(f"transcribed {code} ({len(samples) / 16000:.0f} s)",
                  file=sys.stderr)

    ref_clean, hyp_clean, scored = [], [], []
    for code in codes:
        hyp_path = media / f"{code}.mp3.txt"
        if code not in refs or not hyp_path.exists():
            print(f"skipping {code}: missing reference or hypothesis",
                  file=sys.stderr)
            continue
        scored.append(code)
        ref_clean.append(normalize_english(
            " ".join(tok for tok, _ in refs[code])))
        hyp_clean.append(normalize_english(
            decode_hypothesis(hyp_path.read_bytes()).strip()))

    if not ref_clean:
        print("error: nothing to score", file=sys.stderr)
        return 1
    print(f"files: {len(ref_clean)}")
    print(f"WER: {100 * wer(ref_clean, hyp_clean, normalize=False):.2f}%")

    if args.speakers:
        spk_err: Dict[str, int] = defaultdict(int)
        spk_ref: Dict[str, int] = defaultdict(int)
        for code, rc, hc in zip(scored, ref_clean, hyp_clean):
            # per-word speaker labels survive normalization only
            # approximately; normalize each token stream span-wise so word
            # counts line up with the speaker attribution
            labels: List[str] = []
            ref_words: List[str] = []
            for spk, text in speaker_spans(refs[code]):
                w = normalize_english(text).split()
                ref_words.extend(w)
                labels.extend([spk] * len(w))
            hyp_words = hc.split()
            # word-level alignment via difflib (linear memory on these
            # hour-long files; the headline WER above stays the exact DP)
            import difflib

            sm = difflib.SequenceMatcher(None, ref_words, hyp_words,
                                         autojunk=False)
            for tag, i1, i2, j1, j2 in sm.get_opcodes():
                if tag == "equal":
                    continue
                if tag == "insert":
                    spk = labels[min(i1, len(labels) - 1)] if labels else ""
                    spk_err[spk] += j2 - j1
                else:  # replace / delete: attribute to the reference words
                    for i in range(i1, i2):
                        spk_err[labels[i]] += 1
                    if tag == "replace" and (j2 - j1) > (i2 - i1):
                        spk_err[labels[i2 - 1]] += (j2 - j1) - (i2 - i1)
            for i, spk in enumerate(labels):
                spk_ref[spk] += 1
        print("\nper-speaker WER (errors attributed to the aligned "
              "reference speaker span):")
        for spk in sorted(spk_ref, key=lambda s: -spk_ref[s]):
            print(f"  {spk or '<none>':24s} {spk_ref[spk]:8d} words  "
                  f"WER {100 * spk_err[spk] / max(1, spk_ref[spk]):6.2f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
