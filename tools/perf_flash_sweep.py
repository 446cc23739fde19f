#!/usr/bin/env python
"""Robust flash-attention block-size sweep at whisper encoder shapes.

tools/perf_encoder.py's short chains (4/16 iters) showed 5x scatter
between runs for the same config over the tunnel; this sweep uses long
chains (32/96 iters, reps=5) so per-op error is < a few us.  Reports
each config against the 12.1 GFLOP bf16 floor (~68 us at 178 TFLOPS
measured mul_mat peak).
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

H, T, D = 20, 1500, 64  # large-v3 encoder
DT = jnp.bfloat16


def _timed(fn, *args, reps=5):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        best = min(best, (np.asarray(fn(*args)), time.perf_counter() - t0)[1])
    return best


def per_op_us(chain, k1, k2, args, reps=5):
    t1 = _timed(chain, jnp.int32(k1), *args, reps=reps)
    t2 = _timed(chain, jnp.int32(k2), *args, reps=reps)
    return max(0.0, (t2 - t1) / (k2 - k1)) * 1e6


def main():
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)

    print(f"devices: {jax.devices()}", flush=True)
    tp = 1536
    pad = tp - T
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (1, H, tp, D), DT)
    seg = jnp.where(jnp.arange(tp) < T, 1, 2).astype(jnp.int32)[None]

    flops = 2 * 2 * H * tp * tp * D

    def make_chain(bq, bk):
        bs = BlockSizes(block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
                        block_q_major_dkv=bq, block_k_major_dkv=bk,
                        block_k_dkv=bk, block_q_dkv=bq,
                        block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq)

        @jax.jit
        def chain(K, q):
            def body(i, x):
                o = flash_attention(
                    x, x, x, segment_ids=SegmentIds(q=seg, kv=seg),
                    causal=False, sm_scale=1.0 / math.sqrt(D),
                    block_sizes=bs)
                return x + o.astype(DT) * 1e-6
            return jax.lax.fori_loop(0, K, body, q).sum()
        return chain

    results = {}
    for bq in (128, 256, 512, 768, 1536):
        for bk in (256, 512, 768, 1536):
            if bq > tp or bk > tp:
                continue
            try:
                us = per_op_us(make_chain(bq, bk), 32, 96, (q,))
            except Exception as e:
                print(f"bq={bq:5d} bk={bk:5d}  FAILED {type(e).__name__}",
                      flush=True)
                continue
            results[(bq, bk)] = us
            print(f"bq={bq:5d} bk={bk:5d}  {us:7.1f} us  "
                  f"({flops/us/1e6:6.1f} TFLOPS)", flush=True)

    if results:
        (bq, bk), us = min(results.items(), key=lambda kv: kv[1])
        print(f"\nbest: bq={bq} bk={bk} at {us:.1f} us", flush=True)


if __name__ == "__main__":
    main()
