#!/usr/bin/env python
"""Prototype: fused Pallas cross-attention over int8 XK8 planes.

The W=16 serving step's cross-attention costs 3.5 ms vs a 2.6 ms int8
byte floor (tools/perf_serving.py no_cross ablation after the self-attn
kernel landed).  This prototypes a per-layer kernel with grid (W,): each
instance DMAs one window's (H, T, d) K and V code planes (~1.9 MB each)
and runs the H-batched QK^T -> scale -> softmax -> PV chain in VMEM.

Compares ms/step for 32 layers: XLA cross_attend vs the kernel, plus a
variant with T padded to 1536 (lane-aligned scores).
"""

from __future__ import annotations

import functools
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from whisper_tpu.models.whisper import model as M

L, W, H, T, D = 32, 16, 20, 1500, 64
DT = jnp.bfloat16


def _timed(fn, *args, reps=4):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def per_op_ms(chain, k1, k2, args):
    t1 = _timed(chain, jnp.int32(k1), *args)
    t2 = _timed(chain, jnp.int32(k2), *args)
    return max(0.0, (t2 - t1) / (k2 - k1)) * 1000


def _kernel(kc_ref, ks_ref, vc_ref, vs_ref, q_ref, o_ref, *, dtype):
    kc = kc_ref[0]                            # (H, T, d) int8
    vc = vc_ref[0]
    q = q_ref[0]                              # (H, G, d) bf16
    sk = ks_ref[0]                            # (H, T) f32
    sv = vs_ref[0]
    d = q.shape[-1]
    scores = jax.lax.dot_general(
        q.astype(dtype), kc.astype(dtype), (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)   # (H, G, T)
    scores = scores * sk[:, None, :] * (1.0 / math.sqrt(d))
    mx = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - mx)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    p = (p * sv[:, None, :]).astype(dtype)
    o_ref[0] = jax.lax.dot_general(
        p, vc.astype(dtype), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)   # (H, G, d)


@functools.partial(jax.jit, static_argnames=("dtype",))
def cross_kernel(kc, ks, vc, vs, qh, dtype=DT):
    """kc/vc (W, H, T, d) int8; ks/vs (W, H, T) f32; qh (W, H, G, d)."""
    Wn, Hn, Tn, d = kc.shape
    G = qh.shape[2]
    return pl.pallas_call(
        functools.partial(_kernel, dtype=dtype),
        out_shape=jax.ShapeDtypeStruct((Wn, Hn, G, d), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(Wn,),
            in_specs=[
                pl.BlockSpec((1, Hn, Tn, d), lambda w: (w, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hn, Tn), lambda w: (w, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hn, Tn, d), lambda w: (w, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hn, Tn), lambda w: (w, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hn, G, d), lambda w: (w, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, Hn, G, d), lambda w: (w, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )(kc, ks, vc, vs, qh.astype(dtype))


def main():
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    q0 = jax.random.normal(k1, (W, H, D), DT)
    kc = jax.random.randint(k2, (L, W, H, T, D), -127, 127, jnp.int8)
    ks = jnp.abs(jax.random.normal(k3, (L, W, H, T), jnp.float32)) * 0.1
    vs = ks * 0.5
    gb = (2 * L * W * H * T * D + 2 * 4 * L * W * H * T) / 1e9

    def chain_xla():
        @jax.jit
        def chain(K, q0, kc, ks, vs):
            def body(i, q):
                acc = q
                for l in range(L):      # python l like the unrolled decode
                    ck = M.XK8(kc[l], ks[l])
                    cv = M.XK8(kc[l], vs[l])
                    out = M.cross_attend(acc[:, :, None, :], ck, cv, DT)
                    acc = acc + out[:, :, 0, :].astype(DT) * 1e-6
                return acc
            return jax.lax.fori_loop(0, K, body, q0).sum()
        return chain

    def chain_pl():
        @jax.jit
        def chain(K, q0, kc, ks, vs):
            def body(i, q):
                acc = q
                for l in range(L):
                    out = cross_kernel(kc[l], ks[l], kc[l], vs[l],
                                       acc[:, :, None, :])
                    acc = acc + out[:, :, 0, :].astype(DT) * 1e-6
                return acc
            return jax.lax.fori_loop(0, K, body, q0).sum()
        return chain

    ms = per_op_ms(chain_xla(), 2, 6, (q0, kc, ks, vs))
    print(f"xla   {ms:7.3f} ms/step  ({gb/ms*1000:6.1f} GB/s eff)", flush=True)
    ms = per_op_ms(chain_pl(), 2, 6, (q0, kc, ks, vs))
    print(f"pallas{ms:7.3f} ms/step  ({gb/ms*1000:6.1f} GB/s eff)", flush=True)

    # numeric check at one layer
    got = np.asarray(cross_kernel(kc[0], ks[0], kc[0], vs[0],
                                  q0[:, :, None, :]))
    ref = np.asarray(M.cross_attend(q0[:, :, None, :].astype(jnp.float32),
                                    M.XK8(kc[0], ks[0]), M.XK8(kc[0], vs[0]),
                                    DT))
    d = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    print(f"max rel diff vs XLA: {d:.2e}", flush=True)


if __name__ == "__main__":
    main()
