"""Continuous batching of window decodes across parallel transcriptions.

TPU-native `whisper_full_parallel` (reference: src/whisper.cpp:7811-7939
runs N CPU threads): here N audio chunks each run the unmodified decoding
state machine in a worker thread, and a batching gate intercepts their
`decode_window_device` calls.  When every *active* worker is waiting,
compatible requests execute as ONE batched device call — the decoder
weights are read from HBM once per step for the whole batch instead of
once per chunk, which is where single-stream decode throughput goes on a
bandwidth-bound chip.  Encodes deliberately stay solo: the encoder is
compute-bound at T=1500, so vmapping W encodes saves no weight traffic and
its W-times working set measures ~27% SLOWER per window (bench.py).

Workers that fall off the common path (temperature fallback with a different
lane count, beam search, grammar) execute their request solo in the same
round; the batch continues without them.
"""

from __future__ import annotations

import threading
from collections import defaultdict
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


class _Request:
    __slots__ = ("key", "args", "result", "error", "event")

    def __init__(self, key, args):
        self.key = key
        self.args = args
        self.result = None
        self.error: Optional[BaseException] = None
        self.event = threading.Event()


class WindowBatcher:
    """Barrier + dispatcher for lockstep window decoding.

    Workers call submit() (blocking); the batcher fires when all live
    workers are waiting, groups requests by jit signature, executes each
    group (vmapped when >1), and wakes the workers.
    """

    def __init__(self, ctx, n_workers: int, max_wait_s: float = 0.25):
        self.ctx = ctx
        self.lock = threading.Condition()
        self.n_live = n_workers
        self.pending: List[_Request] = []
        self._vmapped: Dict[Any, Callable] = {}
        # straggler bound: a queued request never waits longer than this for
        # the batch to fill — after the deadline the partial batch dispatches
        # (the late worker simply runs in the next round), so one slow or
        # wedged stream cannot stall the whole server
        self.max_wait_s = max_wait_s
        # dispatch stats (observability + tests): rounds run, rounds with
        # >1 request coalesced, max requests in one round
        self.n_rounds = 0
        self.n_coalesced_rounds = 0
        self.max_round_size = 0

    # -- worker side -----------------------------------------------------------

    def worker_enter(self):
        """Register a dynamically-arriving worker (server requests join and
        leave at any time; whisper_full_parallel-style workers are counted
        up front via n_workers)."""
        with self.lock:
            self.n_live += 1

    def submit(self, key, args):
        """Queue a decode_window request; blocks until its batch ran.

        Dispatch is event-driven: every state transition (request arrival,
        worker exit) happens under the lock and triggers the batch when all
        live workers are waiting.  The only timed wake-up is the straggler
        deadline above — not a poll for missed dispatches."""
        req = _Request(key, args)
        with self.lock:
            self.pending.append(req)
            if len(self.pending) >= self.n_live:
                self._dispatch_locked()
        while not req.event.wait(timeout=self.max_wait_s):
            with self.lock:
                if req.event.is_set():
                    break
                if req in self.pending:
                    # deadline expired with the batch still unfilled —
                    # run what we have
                    self._dispatch_locked()
        if req.error is not None:
            raise req.error
        return req.result

    def worker_done(self):
        with self.lock:
            self.n_live -= 1
            if self.pending and len(self.pending) >= self.n_live > 0:
                self._dispatch_locked()
            elif self.pending and self.n_live == 0:
                self._dispatch_locked()

    # -- dispatch ----------------------------------------------------------------

    def _dispatch_locked(self):
        batch, self.pending = self.pending, []
        self.n_rounds += 1
        if len(batch) > 1:
            self.n_coalesced_rounds += 1
        self.max_round_size = max(self.max_round_size, len(batch))
        groups: Dict[Any, List[_Request]] = defaultdict(list)
        for r in batch:
            groups[r.key].append(r)
        for key, reqs in groups.items():
            try:
                self._run_group(key, reqs)
            except BaseException as e:  # noqa: BLE001 — propagate to workers
                for r in reqs:
                    r.error = e
            finally:
                for r in reqs:
                    r.event.set()

    def _run_group(self, key, reqs: List[_Request]):
        ctx = self.ctx
        if len(reqs) == 1:
            reqs[0].result = ctx._decode_window_exec(key, *reqs[0].args)
            return
        from ..decoding import device_loop as DL

        (n_beams, bt, no_ts, single_seg, strategy) = key[:5]
        # ALL groups run NATIVELY batched: windows x lanes ride the
        # decode_step beam axis (in-place cache — the fast path), with
        # best-of sampling lanes independent and beam groups selecting
        # group-locally (device_loop._beam_select_grouped); the vmapped
        # mode remains only as an escape hatch
        native = True
        # graph cache keys off key[:5] (the digest tail only affects
        # grouping, not the compiled graph)
        vkey = ((key[:5], "native", len(reqs)) if native
                else (key[:5], "vmap"))
        fn = ctx._window_jit.get(vkey)
        if fn is None:
            fn = DL.make_window_decoder(
                ctx.hp, n_beams, bt, ctx.compute_dtype, no_ts, single_seg,
                ctx.vocab.token_eot, ctx.vocab.token_beg,
                vmap_windows=not native, kv_itype=ctx.kv_itype,
                strategy=strategy, n_windows=len(reqs) if native else 1,
                parity=getattr(ctx, "parity", False))
            ctx._window_jit[vkey] = fn

        # args per request: (prompt_padded, prompt_len, xk, xv, base_mask,
        #                    initial_mask, temperature, seek, seek_end,
        #                    max_tokens, rng)
        stacked = []
        for i in range(len(reqs[0].args)):
            vals = [r.args[i] for r in reqs]
            if i in (4, 5, 9):  # base_mask, initial_mask, max_tokens: shared
                stacked.append(vals[0])
            else:
                # tree-aware: xk/xv leaves may be XK8 int8 planes
                stacked.append(jax.tree.map(
                    lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                    *vals))
        res = fn(ctx.params, *stacked)
        res = jax.tree.map(np.asarray, res)
        for j, r in enumerate(reqs):
            r.result = jax.tree.map(lambda a, j=j: a[j], res)


def transcribe_batched(ctx, params, samples: np.ndarray,
                       n_processors: int,
                       batcher: Optional[WindowBatcher] = None,
                       vad_mapping=None):
    """Lockstep data-parallel transcription: N chunks, one device batch per
    decode round.  Same splitting/merge semantics as transcribe_parallel.

    `batcher`: join an external (e.g. server-wide) WindowBatcher so this
    call's chunk workers coalesce with OTHER concurrent transcriptions'
    window decodes; by default a private batcher covers just this call."""
    from ..decoding.full import full_with_state
    from ..decoding.parallel import SAMPLE_RATE, replace_params

    n_samples = len(samples)
    offset_samples = (SAMPLE_RATE * params.offset_ms) // 1000
    n_per = (n_samples - offset_samples) // n_processors

    if batcher is not None:
        for _ in range(n_processors):
            batcher.worker_enter()
    else:
        batcher = WindowBatcher(ctx, n_processors)
    workers = []
    results: List[Any] = [None] * n_processors
    errors: List[Any] = [None] * n_processors

    def run(i):
        sub = ctx.clone_state()
        sub.batcher = batcher
        try:
            if i == 0:
                chunk = samples[: offset_samples + n_per]
                p = replace_params(params)
            else:
                start = offset_samples + i * n_per
                n_cur = n_samples - start if i == n_processors - 1 else n_per
                chunk = samples[start: start + n_cur]
                p = replace_params(params, clear_offset=True)
            results[i] = full_with_state(sub, p, chunk)
        except BaseException as e:  # noqa: BLE001
            errors[i] = e
        finally:
            batcher.worker_done()

    for i in range(n_processors):
        t = threading.Thread(target=run, args=(i,), daemon=True)
        workers.append(t)
        t.start()
    for t in workers:
        t.join()
    for e in errors:
        if e is not None:
            raise e

    # merge with offset fix-up + non-overlap clamp (src/whisper.cpp:7900-7933)
    # (note: with an external batcher, workers re-register next call).
    # vad_mapping: the filtered->original remap runs AFTER the whole merge
    # (the reference's read-time accessor semantics) — the mapping's
    # original times can step backward across entries, so the non-overlap
    # clamp must compare filtered-time values; see parallel._remap_vad.
    all_segments = list(results[0] or [])
    offset_t = params.offset_ms // 10
    for i in range(1, n_processors):
        shift = 100 * (i * n_per) // SAMPLE_RATE + offset_t
        for s in results[i] or []:
            s.t0 += shift
            s.t1 += shift
            if all_segments:
                s.t0 = max(s.t0, all_segments[-1].t1)
            all_segments.append(s)
            if params.new_segment_callback:
                params.new_segment_callback(ctx, all_segments, 1)
    if vad_mapping:
        from ..models.vad.pipeline import remap_segment_times

        remap_segment_times(all_segments, vad_mapping)
    return all_segments


def transcribe_joining(ctx, params, samples: np.ndarray,
                       batcher: WindowBatcher):
    """One transcription whose window decodes join a SHARED (server-wide)
    batcher: concurrent requests' windows coalesce into one lockstep device
    call instead of serializing (the reference server serializes on
    whisper_mutex, examples/server/server.cpp:1219 — this is the TPU-first
    improvement over parity).  Returns (segments, per-request ctx clone)."""
    from ..decoding.full import transcribe

    sub = ctx.clone_state()
    sub.batcher = batcher
    batcher.worker_enter()
    try:
        return transcribe(sub, params, samples), sub
    finally:
        batcher.worker_done()
