#!/usr/bin/env python
"""2-process localhost multi-host dryrun (CI-runnable, CPU backend).

Spawns N worker processes that bring up the JAX multi-controller runtime
over localhost (Gloo collectives on CPU), each transcribes its share of the
audio chunks against the mini model, and every process all-gathers + merges
the identical final segment list — exercising the full multi-host path
(init, global mesh, DP chunk scheduler, cross-process segment exchange)
without TPU pod hardware.

Role-equivalent to the reference's RPC backend smoke path
(ggml/src/ggml-rpc/); real-pod usage: run the same worker once per host with
WTPU_COORDINATOR / WTPU_NUM_PROCESSES / WTPU_PROCESS_ID (or rely on TPU pod
auto-detection by passing no args).

Usage:
  python tools/multihost_dryrun.py                 # launcher: spawns 2 procs
  python tools/multihost_dryrun.py --worker <pid>  # (internal) one process
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

COORD = "127.0.0.1:29511"
NPROC = 2


def worker(pid: int, model: str, wav: str) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from whisper_tpu.parallel.multihost import (init_distributed,
                                                make_global_mesh,
                                                transcribe_multihost)

    init_distributed(COORD, NPROC, pid)
    assert jax.process_count() == NPROC

    # global mesh sanity: tp within host, dp across
    mesh = make_global_mesh(n_tp=1)
    assert mesh.devices.shape[0] == len(jax.devices())

    from whisper_tpu.audio.io import load_audio
    from whisper_tpu.decoding.params import TranscribeParams
    from whisper_tpu.runtime.context import WhisperContext

    samples, _ = load_audio(wav)
    ctx = WhisperContext.from_file(model)
    p = TranscribeParams(language="en", print_progress=False,
                         temperature_inc=0.0)
    segs = transcribe_multihost(ctx, p, samples)
    for s in segs:
        print(f"[proc {pid}] {s.t0} {s.t1} {s.text}", flush=True)
    print(f"[proc {pid}] n_segments={len(segs)}", flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--model", default=str(REPO / ".fixtures" / "mini-f16.bin"))
    ap.add_argument("--wav", default="/root/reference/samples/jfk.wav")
    args = ap.parse_args()

    if args.worker is not None:
        worker(args.worker, args.model, args.wav)
        return 0

    procs = [subprocess.Popen(
        [sys.executable, __file__, "--worker", str(i),
         "--model", args.model, "--wav", args.wav],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(NPROC)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    rc = max(p.returncode for p in procs)
    for i, o in enumerate(outs):
        sys.stdout.write(o)
    # both processes must have produced the SAME merged segment list
    def seg_lines(o):
        return sorted(ln.split("]", 1)[1] for ln in o.splitlines()
                      if ln.startswith("[proc") and " n_segments=" not in ln)
    if rc == 0 and seg_lines(outs[0]) != seg_lines(outs[1]):
        print("MISMATCH: processes disagree on merged segments")
        return 1
    print("multihost dryrun", "ok" if rc == 0 else "FAILED")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
