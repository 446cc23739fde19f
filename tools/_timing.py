"""Shared chain-timing helpers for the perf tools.

The TPU is reached over a tunnel whose host round-trip dwarfs small
kernels and whose buffer-ready events resolve optimistically, so every
measurement runs the op K times chained inside one jit (data dependency
between iterations), forces a scalar readback, and derives per-op time
from two chain lengths — the RTT cancels (docs/PERF.md "Measurement
methodology").
"""

from __future__ import annotations

import time

import numpy as np


def timed(fn, *args, reps: int = 4) -> float:
    """min wall seconds of fn(*args) ending in a scalar readback."""
    np.asarray(fn(*args))  # warm / compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def per_op_ms(chain, k1: int, k2: int, args, reps: int = 4) -> float:
    """Per-op milliseconds from two chain lengths.  `chain` takes the
    iteration count as its first (traced) argument so both lengths share
    one compile.  The max(0, .) clamp floors run-to-run noise at zero —
    a 0.00 result means the delta was below the noise floor, not that
    the op is free; lengthen the chains."""
    import jax.numpy as jnp

    t1 = timed(chain, jnp.int32(k1), *args, reps=reps)
    t2 = timed(chain, jnp.int32(k2), *args, reps=reps)
    return max(0.0, (t2 - t1) / (k2 - k1)) * 1000
