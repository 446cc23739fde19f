"""Multi-host dryrun CI test — the TPU-native analogue of the reference's
RPC remote-device backend smoke path (ggml/src/ggml-rpc/ggml-rpc.cpp:34-75).

Spawns 2 localhost processes under the JAX multi-controller runtime (Gloo on
CPU), each transcribes its share of the DP chunk split, and both must merge
the IDENTICAL final segment list.  This exercises init_distributed,
make_global_mesh, the DP-over-hosts chunk scheduler, and the cross-process
segment all-gather without pod hardware.
"""

import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
MINI_MODEL = REPO / ".fixtures" / "mini-f16.bin"
JFK_WAV = pathlib.Path("/root/reference/samples/jfk.wav")


def test_two_process_dryrun_produces_identical_merged_segments():
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "multihost_dryrun.py"),
         "--model", str(MINI_MODEL), "--wav", str(JFK_WAV)],
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "multihost dryrun ok" in proc.stdout, proc.stdout
    # both workers printed >=1 segment and the launcher verified equality
    assert "n_segments=" in proc.stdout
