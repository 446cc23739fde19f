#!/usr/bin/env python
"""Kernel-internal ablations for the packed matmul at decode shapes.

Isolates where the packed kernel's time goes: DMA floor, int8->bf16 convert,
scale application variants, dot issue count.  Informs ops/qmm.py's redesign.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QK = 32
L_ROT = 8


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


def make_chain(apply_fn):
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


# kernels parameterized by mode ------------------------------------------------

def _kern(x_ref, codes_ref, scales_ref, out_ref, *, mode, nb, qk):
    K, BR = codes_ref.shape
    if mode == "convdot":        # convert + single dot, no scales
        w = codes_ref[:].astype(jnp.bfloat16)
        out_ref[:] = jnp.dot(x_ref[:].astype(jnp.bfloat16), w,
                             preferred_element_type=jnp.float32)
        return
    if mode == "bcast":          # scales via broadcast+reshape (v2)
        s = scales_ref[:].astype(jnp.bfloat16)
        s_full = jnp.broadcast_to(s[:, None, :], (nb, qk, BR)).reshape(K, BR)
        w = codes_ref[:].astype(jnp.bfloat16) * s_full
        out_ref[:] = jnp.dot(x_ref[:].astype(jnp.bfloat16), w,
                             preferred_element_type=jnp.float32)
        return
    if mode == "xscale":         # scale the partial-product side per 32-block
        acc = jnp.zeros(out_ref.shape, jnp.float32)
        xb = x_ref[:].astype(jnp.bfloat16)
        cb = codes_ref[:].astype(jnp.bfloat16)
        for b in range(nb):
            part = jnp.dot(xb[:, b * qk:(b + 1) * qk],
                           cb[b * qk:(b + 1) * qk],
                           preferred_element_type=jnp.float32)
            acc = acc + part * scales_ref[b, :][None, :]
        out_ref[:] = acc
        return
    if mode == "blockconv":      # per-block convert INSIDE the loop: VMEM
        # holds only int8 codes -> much larger br tiles / grid=1
        acc = jnp.zeros(out_ref.shape, jnp.float32)
        xb = x_ref[:].astype(jnp.bfloat16)
        for b in range(nb):
            cb = codes_ref[b * qk:(b + 1) * qk, :].astype(jnp.bfloat16)
            part = jnp.dot(xb[:, b * qk:(b + 1) * qk], cb,
                           preferred_element_type=jnp.float32)
            acc = acc + part * scales_ref[b, :][None, :]
        out_ref[:] = acc
        return
    if mode == "chunkconv":      # per-chunk (8 blocks) convert + bcast scale
        CH = 8 * qk
        acc = jnp.zeros(out_ref.shape, jnp.float32)
        xb = x_ref[:].astype(jnp.bfloat16)
        BR = codes_ref.shape[1]
        for c in range(K // CH):
            cb = codes_ref[c * CH:(c + 1) * CH, :].astype(jnp.bfloat16)
            s = scales_ref[c * 8:(c + 1) * 8, :].astype(jnp.bfloat16)
            s_full = jnp.broadcast_to(s[:, None, :], (8, qk, BR)
                                      ).reshape(CH, BR)
            acc = acc + jnp.dot(xb[:, c * CH:(c + 1) * CH], cb * s_full,
                                preferred_element_type=jnp.float32)
        out_ref[:] = acc
        return
    if mode == "i8x":            # ggml-faithful: quantize x per 32-block to
        # int8 in-kernel, int8 MXU dots, per-block scale on partial products
        # (no bf16 convert of the codes AT ALL)
        acc = jnp.zeros(out_ref.shape, jnp.float32)
        x = x_ref[:]
        for b in range(nb):
            xb = x[:, b * qk:(b + 1) * qk]
            amax = jnp.max(jnp.abs(xb), axis=-1, keepdims=True)
            d = amax / 127.0
            inv = jnp.where(d > 0, 1.0 / jnp.where(d == 0, 1, d), 0.0)
            xq = jnp.round(xb * inv).astype(jnp.int8)
            part = jax.lax.dot_general(
                xq, codes_ref[b * qk:(b + 1) * qk],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc = acc + (part.astype(jnp.float32) * d
                         * scales_ref[b, :][None, :])
        out_ref[:] = acc
        return
    raise ValueError(mode)


@functools.partial(jax.jit, static_argnames=("mode", "block_r"))
def run_kern(x, codes_t, scales_t, mode="convdot", block_r=1280):
    T, K = x.shape
    _, R = codes_t.shape
    nb = scales_t.shape[0]
    qk = K // nb
    block_r = min(block_r, R)
    if mode == "xla":            # no pallas: let XLA fuse dequant into dot
        s_full = jnp.repeat(scales_t, qk, axis=0).astype(jnp.bfloat16)
        w = codes_t.astype(jnp.bfloat16) * s_full
        return jnp.dot(x.astype(jnp.bfloat16), w,
                       preferred_element_type=jnp.float32)
    return pl.pallas_call(
        functools.partial(_kern, mode=mode, nb=nb, qk=qk),
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
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * R * K,
            bytes_accessed=K * R + nb * R * 4 + T * K * 4 + T * R * 4,
            transcendentals=0),
    )(x, codes_t, scales_t)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    shapes = [(1, 1280, 5120), (16, 1280, 5120), (16, 1280, 51200)]
    modes = ["xla", "convdot", "blockconv"]
    blocks = [2560, 5120]
    for (T, K, R) in shapes:
        nb = K // QK
        key, k1, k2, k3 = jax.random.split(key, 4)
        x = jax.random.normal(k1, (T, K), jnp.float32)
        codes_t = jax.random.randint(k2, (L_ROT, K, R), -16, 16, jnp.int8)
        scales_t = jax.random.uniform(k3, (L_ROT, nb, R), jnp.float32) * .02
        big = K * R > 3e7
        kk1, kk2 = (16, 128) if big else (64, 1024)
        hbm = (K * R + nb * R * 4) / 819e9 * 1e6
        print(f"\n({T},{K})x({K},{R})  hbm-floor {hbm:.1f}us", flush=True)
        for mode in modes:
            for br in blocks:
                if br > R:
                    continue
                if R % br:
                    continue
                fn = functools.partial(run_kern, mode=mode, block_r=br)
                us = per_op_us(make_chain(lambda x, c, s: fn(x, c, s)),
                               kk1, kk2, (x, codes_t, scales_t))
                print(f"  {mode:>8} br={br:<5} {us:8.1f} us", flush=True)


if __name__ == "__main__":
    main()
