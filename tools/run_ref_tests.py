#!/usr/bin/env python
"""Exact-output integration tests against the reference's committed
transcripts (mirror of tests/run-tests.sh).

Downloads (or reuses) the known test audio, transcribes each file with the
whisper_tpu CLI at the reference's settings, and word-diffs the output
against the reference-repo transcripts (tests/en-{0,1,2}-ref.txt,
es-0-ref.txt).  Needs a real ggml model file and, for fresh downloads,
network + ffmpeg — in an offline sandbox point --audio-dir at a directory
that already holds <lang>-<i>-16khz.wav files.

Usage:
  python tools/run_ref_tests.py -m models/ggml-base.en.bin \
      --refs /root/reference/tests --audio-dir ./test-audio
"""

from __future__ import annotations

import argparse
import difflib
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

URLS = {
    "en": [
        "https://upload.wikimedia.org/wikipedia/commons/1/1f/George_W_Bush_Columbia_FINAL.ogg",
        "https://upload.wikimedia.org/wikipedia/en/d/d4/En.henryfphillips.ogg",
        "https://cdn.openai.com/whisper/draft-20220913a/micro-machines.wav",
    ],
    "es": [
        "https://upload.wikimedia.org/wikipedia/commons/c/c1/La_contaminacion_del_agua.ogg",
    ],
}


def ensure_audio(lang: str, i: int, url: str, audio_dir: Path) -> Path:
    dst = audio_dir / f"{lang}-{i}-16khz.wav"
    if dst.exists():
        return dst
    src = audio_dir / f"{lang}-{i}.{url.rsplit('.', 1)[-1]}"
    if not src.exists():
        subprocess.run(["wget", "--quiet", "-O", str(src), url], check=True)
    subprocess.run(["ffmpeg", "-loglevel", "-0", "-y", "-i", str(src),
                    "-ar", "16000", "-ac", "1", "-c:a", "pcm_s16le",
                    str(dst)], check=True)
    return dst


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--refs", default="/root/reference/tests")
    ap.add_argument("--audio-dir", default="./test-audio")
    ap.add_argument("-t", "--threads", type=int, default=4)
    args = ap.parse_args(argv)

    from whisper_tpu.audio.io import load_audio
    from whisper_tpu.cli.transcribe import run as cli_run

    audio_dir = Path(args.audio_dir)
    audio_dir.mkdir(parents=True, exist_ok=True)
    refs = Path(args.refs)

    multilingual = "en.bin" not in args.model
    langs = ["en"] + (["es"] if multilingual else [])

    n_fail = 0
    for lang in langs:
        for i, url in enumerate(URLS[lang]):
            ref_file = refs / f"{lang}-{i}-ref.txt"
            if not ref_file.exists():
                continue
            try:
                wav = ensure_audio(lang, i, url, audio_dir)
            except (subprocess.CalledProcessError, OSError) as e:
                print(f"skip {lang}-{i}: cannot fetch/convert audio ({e})",
                      file=sys.stderr)
                continue
            out = audio_dir / f"{lang}-{i}-16khz.wav"
            print(f"- [{lang}] transcribing {wav.name} ...")
            rc = cli_run(["-m", args.model, "-f", str(wav), "-l", lang,
                          "-otxt", "-np", "-of", str(out)])
            if rc != 0:
                print(f"  transcription FAILED (rc {rc})")
                n_fail += 1
                continue
            hyp = (Path(str(out) + ".txt")).read_text().strip()
            ref = ref_file.read_text().strip()
            if hyp.split() == ref.split():
                print("  OK (exact match)")
            else:
                n_fail += 1
                print("  DIFF:")
                for line in difflib.unified_diff(
                        ref.splitlines(), hyp.splitlines(),
                        "reference", "whisper_tpu", lineterm=""):
                    print("   " + line)
    print(f"\n{'PASS' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
