#!/usr/bin/env python
"""Microbenchmark probe: quantized-matmul kernel variants at whisper decode
shapes, on the real TPU.

The decode step is the north-star config's hot path (BASELINE.md: large-v3
Q5_0).  Round-1 finding (docs/PERF.md): the fused dequant-matmul kernel
(ops/qmm.py) wins at 4096^2 but LOSES to dense bf16 at decode shapes
((1..16) x 1280 activations).  This probe measures candidate redesigns
head-to-head so the winning formulation becomes the packed path.

Timing: chained execution inside one jit (tunnel RTT cancels, see bench.py),
weights rotated across L distinct copies so VMEM caching can't lie.

Usage: python tools/perf_probe.py [qmm|step] [--shapes small|all]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QK = 32
L_ROT = 8  # distinct weight copies per shape to defeat VMEM caching


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


# ---------------------------------------------------------------------------
# variants
# ---------------------------------------------------------------------------

def dense_mm(x, w):  # w (K, R) bf16
    return jnp.matmul(x.astype(jnp.bfloat16), w,
                      preferred_element_type=jnp.float32)


def qmm_v1(x, codes, scales):
    """Round-1 kernel: codes (R, K), scales (R, nb); MXU scale expansion."""
    from whisper_tpu.ops.qmm import qmm
    return qmm(x, codes, scales)


def _v2_kernel(x_ref, codes_ref, scales_ref, out_ref):
    """Transposed layout: codes (K, BR) int8, scales (nb, BR) f32.
    Scales expand along SUBLANES via broadcast+reshape (no lane shuffle,
    no expansion matmul)."""
    K = codes_ref.shape[0]
    nb = scales_ref.shape[0]
    qk = K // nb
    s = scales_ref[:].astype(jnp.bfloat16)          # (nb, BR)
    s_full = jnp.broadcast_to(s[:, None, :], (nb, qk, s.shape[-1]))
    s_full = s_full.reshape(K, s.shape[-1])         # sublane expand
    w = codes_ref[:].astype(jnp.bfloat16) * s_full  # (K, BR)
    out_ref[:] = jnp.dot(x_ref[:].astype(jnp.bfloat16), w,
                         preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("block_r",))
def qmm_v2(x, codes_t, scales_t, block_r: int = 1280):
    """codes_t (K, R) int8, scales_t (nb, R) f32 -> (T, R) f32."""
    T, K = x.shape
    Kc, R = codes_t.shape
    nb = scales_t.shape[0]
    block_r = min(block_r, R)
    grid = (R // block_r,)
    return pl.pallas_call(
        _v2_kernel,
        out_shape=jax.ShapeDtypeStruct((T, R), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((T, K), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, block_r), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, block_r), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T, block_r), lambda j: (0, j),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * R * K,
            bytes_accessed=K * R + nb * R * 4 + T * K * 4 + T * R * 4,
            transcendentals=0),
    )(x, codes_t, scales_t)


def _v3_kernel(x_ref, codes_ref, scales_ref, out_ref, *, nb, qk):
    """K-block loop: out += (x[:, b] @ codes[b]) * s[b] per 32-block —
    scales apply to PARTIAL PRODUCTS (T x BR each), so the VPU does
    T*nb*BR work instead of K*BR dequant work."""
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    xb = x_ref[:].astype(jnp.bfloat16)
    cb = codes_ref[:].astype(jnp.bfloat16)  # one convert pass (K, BR)
    for b in range(nb):
        part = jnp.dot(xb[:, b * qk:(b + 1) * qk], cb[b * qk:(b + 1) * qk],
                       preferred_element_type=jnp.float32)
        acc = acc + part * scales_ref[b, :][None, :]
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("block_r",))
def qmm_v3(x, codes_t, scales_t, block_r: int = 1280):
    T, K = x.shape
    _, R = codes_t.shape
    nb = scales_t.shape[0]
    qk = K // nb
    block_r = min(block_r, R)
    return pl.pallas_call(
        functools.partial(_v3_kernel, nb=nb, qk=qk),
        out_shape=jax.ShapeDtypeStruct((T, R), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(R // block_r,),
            in_specs=[
                pl.BlockSpec((T, K), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, block_r), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, block_r), lambda j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T, block_r), lambda j: (0, j),
                                   memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * R * K,
            bytes_accessed=K * R + nb * R * 4 + T * K * 4 + T * R * 4,
            transcendentals=0),
    )(x, codes_t, scales_t)


@jax.jit
def qmm_v4(x, codes_t, scales_t):
    """XLA-native blocked formulation (no Pallas): batched per-block matmul
    then scale-reduce."""
    T, K = x.shape
    _, R = codes_t.shape
    nb = scales_t.shape[0]
    qk = K // nb
    xb = x.reshape(T, nb, qk).astype(jnp.bfloat16)
    cbl = codes_t.reshape(nb, qk, R).astype(jnp.bfloat16)
    part = jnp.einsum("tbk,bkr->btr", xb, cbl,
                      preferred_element_type=jnp.float32)   # (nb, T, R)
    return jnp.einsum("btr,br->tr", part, scales_t)


def make_chain(apply_fn, T, K):
    """Chain: y = f(x, w_i) rotating i over L_ROT weights; x kept live via a
    tiny data dependency on y."""
    @jax.jit
    def chain(n, x, *stacked):
        def body(i, x):
            w_i = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, i % L_ROT, 0,
                                                       keepdims=False),
                tuple(stacked))
            y = apply_fn(x, *w_i)
            return x + (y.sum() * 1e-30).astype(x.dtype)
        return jax.lax.fori_loop(0, n, body, x).sum()
    return chain


def bench_qmm(shapes):
    key = jax.random.PRNGKey(0)
    print(f"{'shape':>22} {'dense':>8} {'v1 RK':>8} {'v2 KR':>8} "
          f"{'v3 kblk':>8} {'v4 xla':>8}  (us/op; HBM-bound dense/packed)", flush=True)
    for (T, K, R) in shapes:
        nb = K // QK
        key, k1, k2, k3 = jax.random.split(key, 4)
        x = jax.random.normal(k1, (T, K), jnp.float32)
        codes = jax.random.randint(k2, (L_ROT, R, K), -16, 16, jnp.int8)
        scales = jax.random.uniform(k3, (L_ROT, R, nb), jnp.float32) * .02
        codes_t = jnp.swapaxes(codes, 1, 2).copy()       # (L, K, R)
        scales_t = jnp.swapaxes(scales, 1, 2).copy()     # (L, nb, R)
        dense = (codes.astype(jnp.float32) *
                 jnp.repeat(scales, QK, axis=2)).astype(jnp.bfloat16)
        dense_t = jnp.swapaxes(dense, 1, 2).copy()       # (L, K, R) bf16

        # chain lengths sized so the k2-k1 delta is ~10 ms >> tunnel jitter
        big = K * R > 3e7
        k1, k2 = (16, 128) if big else (64, 1024)
        import sys as _s; print(f"  measuring ({T},{K},{R})...", file=_s.stderr, flush=True)
        res = {}
        res["dense"] = per_op_us(make_chain(dense_mm, T, K), k1, k2,
                                 (x, dense_t))
        res["v1"] = per_op_us(make_chain(qmm_v1, T, K), k1, k2,
                              (x, codes, scales))
        res["v2"] = per_op_us(make_chain(qmm_v2, T, K), k1, k2,
                              (x, codes_t, scales_t))
        res["v3"] = per_op_us(make_chain(qmm_v3, T, K), k1, k2,
                              (x, codes_t, scales_t))
        res["v4"] = per_op_us(make_chain(qmm_v4, T, K), k1, k2,
                              (x, codes_t, scales_t))
        hbm_dense = (2 * K * R) / 819e9 * 1e6
        hbm_packed = (1.125 * K * R) / 819e9 * 1e6
        print(f"({T:>3},{K:>5})x({K:>5},{R:>5}) "
              f"{res['dense']:8.1f} {res['v1']:8.1f} {res['v2']:8.1f} "
              f"{res['v3']:8.1f} {res['v4']:8.1f}   "
              f"[{hbm_dense:.1f} / {hbm_packed:.1f}]", flush=True)


SHAPES_DECODE = [
    (1, 1280, 1280), (1, 1280, 3840), (1, 1280, 5120), (1, 5120, 1280),
    (16, 1280, 1280), (16, 1280, 3840), (16, 1280, 5120), (16, 5120, 1280),
    (16, 1280, 51872),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("what", nargs="?", default="qmm")
    args = ap.parse_args()
    print(f"devices: {jax.devices()}")
    if args.what == "qmm":
        bench_qmm(SHAPES_DECODE)


if __name__ == "__main__":
    main()
