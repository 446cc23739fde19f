#!/usr/bin/env python
"""In-graph packed-matmul comparison at serving shapes.

The isolated-kernel probe (perf_ablate.py) says the blockconv Pallas kernel
beats dense bf16 at T=16, yet the full serving step measures SLOWER with
packed weights.  This probe reproduces the in-graph conditions one at a
time: weights sliced from an (L, ...) stack, bias+GELU+residual around each
matmul, several matmuls chained per "layer" — for dense / XLA-fused-dequant
/ qmmt-kernel paths.
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from whisper_tpu.ops.qmm import QWeight, QWeightT, qmm_auto, qmmt_auto

L_ROT = 8
S = 1280
FF = 5120


def _timed(fn, *args, reps=5):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def per_op_us(chain, k1, k2, args, reps=5):
    t1 = _timed(chain, jnp.int32(k1), *args, reps=reps)
    t2 = _timed(chain, jnp.int32(k2), *args, reps=reps)
    return max(0.0, (t2 - t1) / (k2 - k1)) * 1e6


def make_layer_chain(mm_fn):
    """One 'layer': x->(S,FF) mm, +bias, gelu, ->(FF,S) mm, +bias, residual.
    Weights sliced from (L, ...) stacks like the unrolled decode graph."""
    @jax.jit
    def chain(n, x, *stacks):
        def body(i, x):
            li = i % L_ROT

            def sl(a):
                return jax.tree.map(
                    lambda t: jax.lax.dynamic_index_in_dim(t, li, 0, False),
                    a)
            w0, b0, w1, b1 = (sl(s) for s in stacks)
            h = mm_fn(x, w0) + b0
            h = jax.nn.gelu(h)
            y = mm_fn(h, w1) + b1
            return x + y.astype(x.dtype) * 1e-3
        return jax.lax.fori_loop(0, n, body, x).sum()
    return chain


def main():
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    for T in (1, 16):
        key, *ks = jax.random.split(key, 8)
        x = jax.random.normal(ks[0], (T, S), jnp.float32)

        w0_d = jax.random.normal(ks[1], (L_ROT, S, FF), jnp.bfloat16) * 0.02
        w1_d = jax.random.normal(ks[2], (L_ROT, FF, S), jnp.bfloat16) * 0.02
        b0 = jnp.zeros((L_ROT, FF), jnp.float32)
        b1 = jnp.zeros((L_ROT, S), jnp.float32)

        c0 = jax.random.randint(ks[3], (L_ROT, FF, S), -16, 16, jnp.int8)
        s0 = jax.random.uniform(ks[4], (L_ROT, FF, S // 32), jnp.float32) * .02
        c1 = jax.random.randint(ks[5], (L_ROT, S, FF), -16, 16, jnp.int8)
        s1 = jax.random.uniform(ks[6], (L_ROT, S, FF // 32), jnp.float32) * .02

        dense = per_op_us(
            make_layer_chain(lambda a, w: jnp.matmul(
                a.astype(jnp.bfloat16), w,
                preferred_element_type=jnp.float32)),
            16, 64, (x, w0_d, b0, w1_d, b1))
        print(f"T={T:2d} dense      {dense:8.1f} us/layer", flush=True)

        xla = per_op_us(
            make_layer_chain(lambda a, w: qmm_auto(a, w)),
            16, 64, (x, QWeight(c0, s0), b0, QWeight(c1, s1), b1))
        print(f"T={T:2d} xla-fused  {xla:8.1f} us/layer", flush=True)

        c0t = jnp.swapaxes(c0, 1, 2) + 0
        s0t = jnp.swapaxes(s0, 1, 2) + 0
        c1t = jnp.swapaxes(c1, 1, 2) + 0
        s1t = jnp.swapaxes(s1, 1, 2) + 0
        qmmt = per_op_us(
            make_layer_chain(lambda a, w: qmmt_auto(a, w)),
            16, 64, (x, QWeightT(c0t, s0t), b0, QWeightT(c1t, s1t), b1))
        print(f"T={T:2d} qmmt       {qmmt:8.1f} us/layer", flush=True)

        # roofline: int8 reads 2*S*FF = 13.1 MB -> 16 us; bf16 26 MB -> 32 us
        print(f"T={T:2d} floors: packed 16us, dense 32us/layer", flush=True)


if __name__ == "__main__":
    main()
