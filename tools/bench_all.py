#!/usr/bin/env python
"""Sweep benchmark over model sizes — analogue of scripts/bench-all.sh +
scripts/bench.py (reference), which sweep models x threads x processors and
curate the results into bench-all-gg.txt-style tables.

On TPU there is no thread axis; the sweep is over model sizes (and the
columns mirror the reference's Enc. / Dec. / Bch5 / PP table).

Usage:
  python tools/bench_all.py [--models tiny,base,...] [-o results.csv]
"""

from __future__ import annotations

import argparse
import csv
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # repo-root bench.py


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="tiny,base,small,medium,large-v3")
    ap.add_argument("-n", "--dec-tokens", type=int, default=64)
    ap.add_argument("-o", "--output", default=None, help="also write CSV here")
    args = ap.parse_args(argv)

    names = [m.strip() for m in args.models.split(",") if m.strip()]
    unknown = [m for m in names if m not in bench.DIMS]
    if unknown:
        print(f"error: unknown models {unknown} "
              f"(have {sorted(bench.DIMS)})", file=sys.stderr)
        return 1

    cols = ["model", "enc_ms", "dec_ms", "dec_q_ms", "bch5_ms", "prompt_ms",
            "dec_b_ms", "n_windows", "rtf", "rtf_batched"]
    rows = []
    print(f"| {' | '.join(cols)} |")
    print(f"|{'---|' * len(cols)}")
    for name in names:
        r = bench.bench_model(name, bench.DIMS[name],
                              n_dec_tokens=args.dec_tokens)
        rows.append(r)
        print("| " + " | ".join(str(r.get(c, "")) for c in cols) + " |",
              flush=True)

    if args.output:
        with open(args.output, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=cols, extrasaction="ignore")
            w.writeheader()
            w.writerows(rows)
        print(f"wrote {args.output}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
