#!/usr/bin/env python
"""Probe: is int4 cross-KV attention bandwidth-limited like int8 is?

The serving step's largest HBM stream is the int8 cross-KV read
(3.2 ms of the 11.5 ms W=16 step, tools/perf_serving.py).  Per-position
scales factor out of both attention matmuls for ANY integer code width,
so int4 codes would halve the stream — IF XLA reads jnp.int4 planes at
the packed byte rate instead of materializing a bf16 (or int8) expansion
to HBM first.  This probe measures one serving-shaped cross-attention
stack (L=32 distinct planes, W=16, H=20, T=1500, d=64) per code type.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

L, W, H, T, D = 32, 16, 20, 1500, 64
DT = jnp.bfloat16


def _timed(fn, *args, reps=3):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def per_op_ms(chain, k1, k2, args, reps=3):
    t1 = _timed(chain, jnp.int32(k1), *args, reps=reps)
    t2 = _timed(chain, jnp.int32(k2), *args, reps=reps)
    return max(0.0, (t2 - t1) / (k2 - k1)) * 1000


def attend(qh, kc, ks, vc, vs):
    """qh (W,H,1,D); codes (W,H,T,D) any int dtype; scales (W,H,T) f32."""
    scores = jnp.matmul(qh.astype(DT), jnp.swapaxes(kc, -1, -2).astype(DT),
                        preferred_element_type=jnp.float32)
    scores = scores * ks[:, :, None, :] * (1.0 / np.sqrt(D))
    probs = jax.nn.softmax(scores, axis=-1)
    pv = probs * vs[:, :, None, :]
    return jnp.matmul(pv.astype(DT), vc.astype(DT),
                      preferred_element_type=jnp.float32)


def make_chain():
    @jax.jit
    def chain(K, q0, kc, ks, vc, vs):
        def body(i, q):
            def layer(l, acc):
                out = attend(acc[:, :, None, :],
                             kc[l], ks[l], vc[l], vs[l])
                return acc + out[:, :, 0, :].astype(DT) * 1e-6
            return jax.lax.fori_loop(0, L, layer, q)
        return jax.lax.fori_loop(0, K, body, q0).sum()
    return chain


def main():
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    q0 = jax.random.normal(key, (W, H, D), DT)
    ks = jnp.abs(jax.random.normal(key, (L, W, H, T), jnp.float32)) * 0.1
    vs = ks * 0.5
    codes8 = jax.random.randint(key, (L, W, H, T, D), -127, 127, jnp.int8)

    gb = 2 * L * W * H * T * D / 1e9
    chain = make_chain()
    ms8 = per_op_ms(chain, 2, 6, (q0, codes8, ks, codes8, vs))
    print(f"int8  {ms8:7.3f} ms/step  ({gb/ms8*1000:6.1f} GB/s eff, "
          f"{gb:.2f} GB int8)", flush=True)

    # jnp.int4 arrays cannot be passed as jit arguments over this tunnel
    # (device_put recursion on S4 layouts) — convert INSIDE the jit; the
    # converted planes are loop-invariant temps that XLA stores packed in
    # HBM, so the loop body still measures the int4 read rate.
    @jax.jit
    def chain4(K, q0, kc8, ks_, vc8, vs_):
        kc4 = kc8.astype(jnp.int4)
        vc4 = vc8.astype(jnp.int4)

        def body(i, q):
            def layer(l, acc):
                out = attend(acc[:, :, None, :],
                             kc4[l], ks_[l], vc4[l], vs_[l])
                return acc + out[:, :, 0, :].astype(DT) * 1e-6
            return jax.lax.fori_loop(0, L, layer, q)
        return jax.lax.fori_loop(0, K, body, q0).sum()

    ms4 = per_op_ms(chain4, 2, 6, (q0, codes8, ks, codes8, vs))
    print(f"int4  {ms4:7.3f} ms/step  ({gb/2/ms4*1000:6.1f} GB/s eff, "
          f"{gb/2:.2f} GB packed int4)", flush=True)

    # nibble-packed int8 variant: two int4 codes per int8 byte on the D
    # axis, unpacked with shift/and on the VPU before the matmul.  Code
    # values are irrelevant to timing, so generate the packed planes
    # directly at half size (packing codes8 eagerly OOMs on int32 temps).
    packed = jax.random.randint(key, (L, W, H, T, D // 2), -128, 127,
                                jnp.int8)

    def attend_nib(qh, kp, ks_, vp, vs_):
        def unpack(p):
            lo = (p.astype(jnp.int32) << 28) >> 28
            hi = p.astype(jnp.int32) >> 4
            return jnp.stack([lo, hi], axis=-1).reshape(
                p.shape[:-1] + (p.shape[-1] * 2,)).astype(DT)
        kc = unpack(kp)
        vc = unpack(vp)
        scores = jnp.matmul(qh.astype(DT), jnp.swapaxes(kc, -1, -2),
                            preferred_element_type=jnp.float32)
        scores = scores * ks_[:, :, None, :] * (1.0 / np.sqrt(D))
        probs = jax.nn.softmax(scores, axis=-1)
        pv = probs * vs_[:, :, None, :]
        return jnp.matmul(pv.astype(DT), vc,
                          preferred_element_type=jnp.float32)

    @jax.jit
    def chain_nib(K, q0, kp, ks_, vp, vs_):
        def body(i, q):
            def layer(l, acc):
                out = attend_nib(acc[:, :, None, :],
                                 kp[l], ks_[l], vp[l], vs_[l])
                return acc + out[:, :, 0, :].astype(DT) * 1e-6
            return jax.lax.fori_loop(0, L, layer, q)
        return jax.lax.fori_loop(0, K, body, q0).sum()

    msn = per_op_ms(chain_nib, 2, 6, (q0, packed, ks, packed, vs))
    print(f"nib8  {msn:7.3f} ms/step  ({gb/2/msn*1000:6.1f} GB/s eff, "
          f"{gb/2:.2f} GB nibble-packed)", flush=True)


if __name__ == "__main__":
    main()
