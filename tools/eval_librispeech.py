#!/usr/bin/env python
"""LibriSpeech-style WER evaluation harness.

Mirror of tests/librispeech/eval.mk + eval.py (reference): transcribe every
audio file in a dataset directory with the whisper_tpu CLI and score WER
against the transcript files.  Works with the standard LibriSpeech layout
(*.trans.txt files next to .flac/.wav) or a simple `<utt-id> <text>` TSV.

Usage:
  python tools/eval_librispeech.py -m MODEL -d LibriSpeech/test-clean [-n 100]

No network access is assumed; point -d at an existing dataset checkout.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from whisper_tpu.evals.wer import normalize_english, wer


def find_utterances(root: Path):
    """Yield (utt_id, audio_path, reference_text)."""
    for trans in sorted(root.rglob("*.trans.txt")):
        for line in trans.read_text().splitlines():
            if not line.strip():
                continue
            utt, text = line.split(" ", 1)
            for ext in (".flac", ".wav", ".mp3"):
                audio = trans.parent / (utt + ext)
                if audio.exists():
                    yield utt, audio, text
                    break


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-d", "--dataset", required=True)
    ap.add_argument("-n", "--max-utterances", type=int, default=0)
    ap.add_argument("-bo", "--best-of", type=int, default=1)
    ap.add_argument("--parakeet", action="store_true",
                    help="evaluate a Parakeet-TDT model "
                         "(tests/librispeech-parakeet analogue)")
    ap.add_argument("-B", "--batch-size", type=int, default=1,
                    help="parakeet only: transcribe B utterances per "
                         "batched device call (vmapped encoder + TDT loop)")
    ap.add_argument("-o", "--output", default=None,
                    help="write per-utterance hypotheses to this file")
    args = ap.parse_args(argv)

    from whisper_tpu.audio.io import load_audio

    if args.parakeet:
        from whisper_tpu.models.parakeet.context import ParakeetContext

        pctx = ParakeetContext.from_file(args.model)

        def run_one(samples):
            pctx.full(samples)
            return pctx.full_text()
    else:
        from whisper_tpu.decoding.full import transcribe
        from whisper_tpu.decoding.params import TranscribeParams
        from whisper_tpu.runtime.context import WhisperContext

        ctx = WhisperContext.from_file(args.model)

        def run_one(samples):
            params = TranscribeParams(language="en", print_progress=False,
                                      no_timestamps=True)
            params.greedy.best_of = args.best_of
            segs = transcribe(ctx, params, samples)
            return "".join(s.text for s in segs).strip()
    utts = list(find_utterances(Path(args.dataset)))
    if not utts:
        print(f"error: no utterances found under {args.dataset}",
              file=sys.stderr)
        return 1
    if args.max_utterances:
        utts = utts[: args.max_utterances]

    refs, hyps = [], []
    out_f = open(args.output, "w") if args.output else None
    t0 = time.perf_counter()
    audio_s = 0.0
    B = max(1, args.batch_size) if args.parakeet else 1
    for k0 in range(0, len(utts), B):
        group = utts[k0:k0 + B]
        sample_list = []
        for utt, audio, ref in group:
            samples, _ = load_audio(str(audio))
            audio_s += len(samples) / 16000.0
            sample_list.append(samples)
        if B > 1:
            texts = ["".join(s.text for s in segs)
                     for segs in pctx.full_batch(sample_list)]
        else:
            texts = [run_one(s) for s in sample_list]
        for (utt, audio, ref), hyp in zip(group, texts):
            refs.append(ref)
            hyps.append(hyp)
            if out_f:
                out_f.write(f"{utt}\t{hyp}\n")
        k = k0 + len(group) - 1
        if (k + 1) % 20 < len(group):
            print(f"[{k + 1}/{len(utts)}] running WER "
                  f"{100 * wer(refs, hyps):.2f}%", file=sys.stderr)
    if out_f:
        out_f.close()

    wall = time.perf_counter() - t0
    w = wer(refs, hyps)
    print(f"utterances: {len(utts)}")
    print(f"audio: {audio_s:.1f} s, wall: {wall:.1f} s "
          f"({audio_s / max(wall, 1e-9):.1f}x realtime)")
    print(f"WER: {100 * w:.2f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
