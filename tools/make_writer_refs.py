#!/usr/bin/env python
"""Generate committed OUTPUT-WRITER byte-parity references with the REFERENCE
whisper-cli binary.

The text-parity tier (tools/make_text_refs.py) proves segment text/timestamps
match; this tier proves the FILE WRITERS (-otxt/-osrt/-ovtt/-ocsv/-olrc/-oj/
-ojf/-owts, examples/cli/cli.cpp:560-960) produce byte-identical files.

Three oracle runs on the decisive f16 mini model over jfk.wav:
  plain  -otxt -osrt -ovtt -ocsv -olrc -oj
  wts    -owts -fp tests/data/writer_parity/mono.ttf   (implies -ml 60 +
         token timestamps, cli.cpp:1227-1229)
  full   -ojf                                          (implies token ts)

Byte-compare caveats handled by the pytest, not here:
  * the "systeminfo" JSON line is implementation-identifying by design;
  * full-json token "p" is %f-printed float whose low digits depend on
    backend arithmetic — compared numerically instead.

Usage: python tools/make_writer_refs.py   (requires the portable oracle
build; run tools/oracle/build_oracles.sh first)
"""

from __future__ import annotations

import hashlib
import json
import shutil
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from whisper_tpu.evals import text_parity as TP  # noqa: E402

FIXTURES = REPO / ".fixtures"
OUT_DIR = REPO / "tests" / "data" / "writer_parity"
ORACLE_BIN = REPO / ".oracle" / "build-portable" / "bin"
JFK = Path("/root/reference/samples/jfk.wav")
FONT = "tests/data/writer_parity/mono.ttf"  # placeholder; existence-checked
                                            # by the oracle, embedded in .wts

BASE = ["-np", "-nf", "-bo", "1", "-bs", "1"]
RUNS = {
    # run name -> (extra cli args, produced extensions)
    "plain": (["-otxt", "-osrt", "-ovtt", "-ocsv", "-olrc", "-oj"],
              ["txt", "srt", "vtt", "csv", "lrc", "json"]),
    "wts": (["-owts", "-fp", FONT], ["wts"]),
    "full": (["-ojf"], ["json"]),
    # -di on a panned single-jfk stereo fixture (channel SUM == mono jfk, so
    # the decisive trajectory is unchanged): every writer that embeds
    # "(speaker N)" labels (cli.cpp write_txt/srt/vtt/csv/lrc + json)
    "diarize": (["-di", "-otxt", "-osrt", "-ovtt", "-ocsv", "-olrc", "-oj"],
                ["txt", "srt", "vtt", "csv", "lrc", "json"]),
    # -tdrz: JSON must carry speaker_turn_next for EVERY segment
    # (cli.cpp:803-805), true and false (uses the tdrz mini model)
    "tdrz": (["-tdrz", "-otxt", "-olrc", "-oj"], ["txt", "lrc", "json"]),
    # -nt produces the reference's tid-zero NEGATIVE-t0 quirk — exercises
    # C-truncation division in every time formatter (srt/vtt/csv/lrc/json);
    # -nfa because that's the graph the committed -nt parity case pins
    "nt": (["-nt", "-nfa", "-osrt", "-ovtt", "-ocsv", "-olrc", "-oj"],
           ["srt", "vtt", "csv", "lrc", "json"]),
}


def sha256(p: Path) -> str:
    return hashlib.sha256(p.read_bytes()).hexdigest()


def ensure_model(base: str) -> Path:
    model = FIXTURES / TP.model_filename(base)
    if not model.exists():
        donor, margs = TP.model_recipe(base)
        subprocess.run(
            [sys.executable, str(REPO / "tools" / "make_test_model.py"),
             "--header-from", donor, "--out", str(model), *margs], check=True)
    return model


def main() -> None:
    model = ensure_model("f16")
    model_tdrz = ensure_model("tdrz-f16")
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    (OUT_DIR / "mono.ttf").touch()
    jfkst = TP.make_stereo_audio(str(JFK), FIXTURES / "jfk-stereo.wav",
                                 repeats=1)

    meta = {
        "model": model.name,
        "model_sha256": sha256(model),
        "tdrz_model": model_tdrz.name,
        "tdrz_model_sha256": sha256(model_tdrz),
        "audio": str(JFK),
        "audio_sha256": sha256(JFK),
        "oracle": "whisper-cli (build-portable, GGML_NATIVE=OFF)",
        "runs": {},
    }
    meta["stereo_audio"] = str(jfkst.relative_to(REPO))
    meta["stereo_sha256"] = sha256(jfkst)
    for name, (extra, exts) in RUNS.items():
        prefix = FIXTURES / f"writerref-{name}"
        wav = jfkst if name == "diarize" else JFK
        mdl = model_tdrz if name == "tdrz" else model
        args = ["-m", str(mdl.relative_to(REPO)), "-f", str(wav),
                *BASE, *extra, "-of", str(prefix)]
        r = subprocess.run([str(ORACLE_BIN / "whisper-cli"), *args],
                           cwd=REPO, capture_output=True, text=True)
        if r.returncode != 0:
            raise SystemExit(f"{name}: oracle failed: {r.stderr[-800:]}")
        for ext in exts:
            src = prefix.with_name(prefix.name + f".{ext}")
            dst = OUT_DIR / f"{name}.{ext}"
            shutil.copyfile(src, dst)
            print(f"  {dst.relative_to(REPO)}  {dst.stat().st_size} bytes")
        meta["runs"][name] = {"cli_args": args, "files": exts}
    (OUT_DIR / "meta.json").write_text(json.dumps(meta, indent=2) + "\n")
    print(f"wrote {OUT_DIR / 'meta.json'}")


if __name__ == "__main__":
    main()
