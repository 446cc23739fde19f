"""Multi-host execution — the TPU-native replacement for the reference's
RPC remote-device backend (ggml/src/ggml-rpc/ggml-rpc.cpp:34-75).

The reference ships a hand-rolled TCP transport that serializes tensors and
graphs to remote device servers.  On TPU none of that is built by hand: each
host runs the same program under the JAX multi-controller runtime
(`jax.distributed`), every process sees the GLOBAL device list, and
collectives ride ICI within a slice and DCN across hosts.  What this module
adds on top:

  * :func:`init_distributed` — one-call process-group bring-up from env vars
    (works for real pods via megascale env, and for CI dryruns via explicit
    coordinator/rank arguments; CPU processes talk Gloo).
  * :func:`make_global_mesh` — DCN-aware (dp, tp) mesh: 'tp' is laid out
    within a host (ICI), 'dp' across hosts (DCN) — data parallelism
    tolerates the slow axis, tensor parallelism does not.
  * :func:`transcribe_multihost` — DP-over-hosts chunk scheduler: the audio
    is split into per-host chunks (whisper_full_parallel's split,
    src/whisper.cpp:7811-7939), each process transcribes its own chunks
    locally, and the segment lists are all-gathered and merged with the
    reference's offset fix-up + non-overlap clamp.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, List, Optional

import numpy as np

SAMPLE_RATE = 16000


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize the JAX multi-controller runtime.

    With no arguments, defers to jax.distributed's auto-detection (TPU pod
    metadata / megascale env).  Explicit arguments (or WTPU_COORDINATOR /
    WTPU_NUM_PROCESSES / WTPU_PROCESS_ID env vars) support generic launchers
    and localhost CI dryruns."""
    import jax

    coordinator = coordinator or os.environ.get("WTPU_COORDINATOR")
    if num_processes is None and "WTPU_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["WTPU_NUM_PROCESSES"])
    if process_id is None and "WTPU_PROCESS_ID" in os.environ:
        process_id = int(os.environ["WTPU_PROCESS_ID"])

    if coordinator is None:
        jax.distributed.initialize()          # pod auto-detection
    else:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_global_mesh(n_dp: Optional[int] = None, n_tp: int = 1):
    """A (dp, tp) mesh over the GLOBAL device list, laid out so 'tp' stays
    within a host (ICI) and 'dp' spans hosts (DCN).

    The reference's analogue decision is which tensors go to RPC remote
    devices vs local ones; here it is which mesh axis tolerates DCN latency
    (only the data-parallel one — per-chunk work is independent)."""
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    n_local = len(jax.local_devices())
    n_proc = jax.process_count()
    if n_tp > n_local:
        raise ValueError(
            f"tp={n_tp} exceeds the {n_local} devices local to one host — "
            "tensor parallelism must not cross DCN")
    if n_dp is None:
        n_dp = len(devices) // n_tp

    # validate before the reshape throws something opaque: real pods can be
    # ragged (a down host) or sized so dp*tp misses devices
    counts: dict = {}
    for d in devices:
        counts[d.process_index] = counts.get(d.process_index, 0) + 1
    if len(set(counts.values())) > 1:
        raise ValueError(
            "hosts expose unequal device counts "
            f"({dict(sorted(counts.items()))}) — the (dp, tp) mesh needs a "
            "uniform per-host layout; pass an explicit device list or drop "
            "the ragged host")
    if n_local % n_tp != 0:
        raise ValueError(
            f"tp={n_tp} does not divide the {n_local} devices per host — "
            "tp groups would straddle hosts (DCN)")
    if n_dp * n_tp != len(devices):
        raise ValueError(
            f"mesh dp={n_dp} x tp={n_tp} = {n_dp * n_tp} does not cover the "
            f"{len(devices)} global devices ({n_proc} hosts x "
            f"{n_local} devices); pick dp*tp == n_devices")

    # order devices host-major so reshape(dp, tp) puts tp within a host
    by_proc: List[Any] = sorted(devices, key=lambda d: (d.process_index, d.id))
    arr = np.array(by_proc).reshape(n_dp, n_tp)
    return Mesh(arr, ("dp", "tp"))


def _allgather_pyobj(obj: Any) -> List[Any]:
    """All-gather an arbitrary picklable object across processes (the merge
    step's segment exchange; rides the same collectives as the tensors)."""
    import jax
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return [obj]
    data = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = multihost_utils.process_allgather(
        np.array([data.size], np.int32))
    maxlen = int(np.max(sizes))
    padded = np.zeros(maxlen, np.uint8)
    padded[: data.size] = data
    gathered = multihost_utils.process_allgather(padded)
    return [pickle.loads(gathered[i, : int(sizes[i][0])].tobytes())
            for i in range(jax.process_count())]


def transcribe_multihost(ctx, params, samples: np.ndarray,
                         chunks_per_host: int = 1) -> List[Any]:
    """DP-over-hosts transcription: host p takes chunks {p, p+P, ...} of the
    whisper_full_parallel split; results are all-gathered so EVERY process
    returns the same complete, merged segment list."""
    import jax

    from ..decoding.parallel import replace_params, transcribe_parallel
    from ..decoding.full import full_with_state

    n_proc = jax.process_count()
    pid = jax.process_index()
    n_chunks = n_proc * chunks_per_host
    if n_chunks <= 1:
        return transcribe_parallel(ctx, params, samples, 1)

    if params.vad:
        from ..models.vad.pipeline import filter_speech

        filtered = filter_speech(ctx, params, samples)
        if filtered is None:
            return []
        samples, _, _ = filtered

    n_samples = len(samples)
    offset_samples = (SAMPLE_RATE * params.offset_ms) // 1000
    n_per = (n_samples - offset_samples) // n_chunks

    local: List[Any] = []   # (chunk_idx, segments)
    for i in range(n_chunks):
        if i % n_proc != pid:
            continue
        if i == 0:
            chunk = samples[: offset_samples + n_per]
            p = replace_params(params)
        else:
            start = offset_samples + i * n_per
            n_cur = n_samples - start if i == n_chunks - 1 else n_per
            chunk = samples[start: start + n_cur]
            p = replace_params(params, clear_offset=True)
        segs = full_with_state(ctx, p, chunk)
        ctx.prompt_past0, ctx.prompt_past1 = [], []
        local.append((i, segs))

    # exchange + deterministic merge (identical on every process)
    gathered = _allgather_pyobj(local)
    by_chunk = {i: segs for part in gathered for (i, segs) in part}

    all_segments: List[Any] = []
    offset_t = params.offset_ms // 10
    for i in range(n_chunks):
        segs = by_chunk.get(i, [])
        if i == 0:
            all_segments.extend(segs)
            continue
        shift = 100 * (i * n_per) // SAMPLE_RATE + offset_t
        for s in segs:
            s.t0 += shift
            s.t1 += shift
            if all_segments:
                s.t0 = max(s.t0, all_segments[-1].t1)
            all_segments.append(s)
    return all_segments
