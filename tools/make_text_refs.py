#!/usr/bin/env python
"""Generate committed full-pipeline text-parity references with the REFERENCE
whisper-cli binary (the analogue of tests/run-tests.sh:92-160 regenerating
tests/en-*-ref.txt).

For every case in whisper_tpu.evals.text_parity.CASES, runs
`.oracle/build-portable/bin/whisper-cli` on the deterministic mini models
over jfk.wav (and the 33 s concat), parses the -oj JSON, and writes
tests/data/text_parity/<case>.json with the model SHA-256 so the pytest can
prove it is transcribing the *identical* file.

Usage: python tools/make_text_refs.py   (requires the portable oracle build;
run tools/oracle/build_oracles.sh first)
"""

from __future__ import annotations

import hashlib
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from whisper_tpu.evals import text_parity as TP  # noqa: E402

FIXTURES = REPO / ".fixtures"
OUT_DIR = REPO / "tests" / "data" / "text_parity"
ORACLE_BIN = REPO / ".oracle" / "build-portable" / "bin"
JFK = Path("/root/reference/samples/jfk.wav")


def sha256(p: Path) -> str:
    return hashlib.sha256(p.read_bytes()).hexdigest()


def ensure_models() -> dict:
    models = {}
    for base in ("f16", "ml-f16", "tdrz-f16", "fd-f16", "fd-ml-f16",
                 "kq-f16", "race-f16"):
        models[base] = FIXTURES / TP.model_filename(base)
        if not models[base].exists():
            donor, margs = TP.model_recipe(base)
            subprocess.run(
                [sys.executable, str(REPO / "tools" / "make_test_model.py"),
                 "--header-from", donor,
                 "--out", str(models[base]), *margs], check=True)
    for q, src in (("q5_0", "f16"), ("q8_0", "f16"), ("fd-q5_0", "fd-f16"),
                   ("kq-q5_k", "kq-f16")):
        out = FIXTURES / TP.model_filename(q)
        if not out.exists():
            # quantized with the REFERENCE binary here; the pytest re-creates
            # the same file with OUR quantize tool and asserts the SHA-256
            # matches (the tools are byte-identical at file level)
            subprocess.run(
                [str(ORACLE_BIN / "whisper-quantize"),
                 str(models[src]), str(out), q.split("-")[-1]],
                check=True, capture_output=True)
        models[q] = out
    return models


def main() -> int:
    models = ensure_models()
    audio = {"jfk": JFK,
             "jfk3": TP.make_long_audio(str(JFK), FIXTURES / "jfk3.wav"),
             "jfk3st": TP.make_stereo_audio(str(JFK),
                                            FIXTURES / "jfk3-stereo.wav")}
    OUT_DIR.mkdir(parents=True, exist_ok=True)

    only = set(sys.argv[1:])  # optional case-name filter
    # statistical tiers: greedy -nf refs on NON-decisive-margin models
    # (mini dims at --boost 3; full dims at --boost 4 — each sits just
    # above its scale's measured noise floor)
    stat_tiers = (
        [(f"stat-s{s}", TP.stat_model_filename(s), TP.STAT_MODEL_ARGS, s)
         for s in TP.STAT_SEEDS] +
        [(f"fd-stat-s{s}", TP.fd_stat_model_filename(s),
          TP.FD_STAT_MODEL_ARGS, s) for s in TP.FD_STAT_SEEDS])
    for name, mfile, margs, seed in stat_tiers:
        if only and name not in only:
            continue
        model = FIXTURES / mfile
        if not model.exists():
            subprocess.run(
                [sys.executable, str(REPO / "tools" / "make_test_model.py"),
                 "--header-from", TP.EN_DONOR, "--out", str(model),
                 *margs, "--seed", str(seed)], check=True)
        out_base = FIXTURES / f"textref-{name}"
        args = ["-m", str(model), "-f", str(JFK), "-np", "-oj",
                "-of", str(out_base), "-nf", "-bo", "1", "-bs", "1"]
        r = subprocess.run([str(ORACLE_BIN / "whisper-cli"), *args],
                           capture_output=True, text=True, timeout=600)
        if r.returncode != 0:
            print(f"FAIL {name}: {r.stderr[-800:]}")
            return 1
        rows = TP.parse_cli_json(Path(f"{out_base}.json"))
        doc = {"case": name, "model": mfile,
               "model_sha256": sha256(model), "audio": "jfk",
               "audio_sha256": sha256(JFK), "cli_args": args[4:],
               "oracle": "whisper-cli (build-portable, GGML_NATIVE=OFF)",
               "segments": rows}
        (OUT_DIR / f"{name}.json").write_text(
            json.dumps(doc, indent=1, ensure_ascii=False) + "\n")
        print(f"{name:18s} {len(rows):3d} segments")

    for case in TP.CASES:
        if only and case.name not in only:
            continue
        model = models[case.model]
        wav = audio[case.audio]
        out_base = FIXTURES / f"textref-{case.name}"
        args = TP.cli_args(case, model, wav, out_base)
        r = subprocess.run([str(ORACLE_BIN / "whisper-cli"), *args],
                           capture_output=True, text=True, timeout=600)
        if r.returncode != 0:
            print(f"FAIL {case.name}: {r.stderr[-800:]}")
            return 1
        out_json = Path(f"{out_base}.json")
        rows = TP.parse_cli_json(out_json, tokens=bool(case.dtw))
        doc = {
            "case": case.name,
            "model": TP.model_filename(case.model),
            "model_sha256": sha256(model),
            "audio": case.audio,
            "audio_sha256": sha256(wav),
            "cli_args": args[4:],  # drop -m/-f values (machine-local paths)
            "oracle": "whisper-cli (build-portable, GGML_NATIVE=OFF)",
            "segments": rows,
        }
        if case.language == "auto":
            # cli.cpp result.language — what whisper_lang_auto_detect chose
            cli_doc = json.loads(out_json.read_text(), strict=False)
            doc["result_language"] = cli_doc["result"]["language"]
        ref = OUT_DIR / f"{case.name}.json"
        ref.write_text(json.dumps(doc, indent=1, ensure_ascii=False) + "\n")
        text = "".join(s["text"] for s in rows)
        print(f"{case.name:18s} {len(rows):3d} segments  "
              f"text[:60]={text[:60]!r}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
