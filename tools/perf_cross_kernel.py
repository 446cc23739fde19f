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
    q = q_ref[0]                              # (Hb, G, d) bf16
    sk = ks_ref[0, 0]                         # (Hb, T) f32
    sv = vs_ref[0, 0]
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
    # head-blocked grid: a whole-window (H, T, d) int8 block lane-pads
    # d=64 -> 128 in VMEM (2x), OOMing the 16 MB budget at T=1500; half
    # the heads per instance fits with double buffering
    Hb = Hn if Hn * Tn * 128 * 2 * 2 * 2 <= 12 * 2**20 else Hn // 2
    ng = Hn // Hb
    # scales reshape to (W, ng, Hb, T) so their block covers full
    # trailing dims (a (1, Hb, T) block with Hb=10 violates the
    # divisible-by-8-or-full sublane rule)
    ks4 = ks.reshape(Wn, ng, Hb, Tn)
    vs4 = vs.reshape(Wn, ng, Hb, Tn)
    return pl.pallas_call(
        functools.partial(_kernel, dtype=dtype),
        out_shape=jax.ShapeDtypeStruct((Wn, Hn, G, d), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(Wn, ng),
            in_specs=[
                pl.BlockSpec((1, Hb, Tn, d), lambda w, g: (w, g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, Hb, Tn), lambda w, g: (w, g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hb, Tn, d), lambda w, g: (w, g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, Hb, Tn), lambda w, g: (w, g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hb, G, d), lambda w, g: (w, g, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, Hb, G, d), lambda w, g: (w, g, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )(kc, ks4, vc, vs4, qh.astype(dtype))


def _kernel2(kt_ref, ks_ref, vf_ref, vs_ref, q_ref, o_ref, *, dtype):
    kt = kt_ref[0]                            # (Hb, d, T) int8
    vf = vf_ref[0, 0]                         # (Hb//2, T, 2d) int8
    q = q_ref[0]                              # (Hb, G, d) bf16
    sk = ks_ref[0, 0]                         # (Hb, T) f32
    sv = vs_ref[0, 0]
    Hb, d, T = kt.shape
    G = q.shape[1]
    scores = jax.lax.dot_general(
        q.astype(dtype), kt.astype(dtype), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)   # (Hb, G, T)
    scores = scores * sk[:, None, :] * (1.0 / math.sqrt(d))
    mx = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - mx)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    p = (p * sv[:, None, :]).astype(dtype)
    # head-pair fold: rows [p_2i; p_2i+1] x V_fold (T, [v_2i | v_2i+1]);
    # the diagonal (G, d) blocks of the result are the two heads' outputs
    p2 = p.reshape(Hb // 2, 2 * G, T)
    res = jax.lax.dot_general(
        p2, vf.astype(dtype), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)   # (Hb/2, 2G, 2d)
    out = jnp.stack([res[:, 0:G, 0:d], res[:, G:2 * G, d:2 * d]],
                    axis=1)                   # (Hb/2, 2, G, d)
    o_ref[0] = out.reshape(Hb, G, d)


@functools.partial(jax.jit, static_argnames=("dtype", "hb", "dma_only"))
def cross_kernel2(kt, ks, vf, vs, qh, dtype=DT, hb=None, dma_only=False):
    """kt (W, H, d, T) int8; vf (W, H//2, T, 2d) int8; ks/vs (W, H, T) f32;
    qh (W, H, G, d)."""
    Wn, Hn, d, Tn = kt.shape
    G = qh.shape[2]
    Hb = hb or (Hn if Hn * Tn * d * 2 * 2 * 2 <= 12 * 2**20 else Hn // 2)
    ng = Hn // Hb
    ks4 = ks.reshape(Wn, ng, Hb, Tn)
    vs4 = vs.reshape(Wn, ng, Hb, Tn)
    vf5 = vf.reshape(Wn, ng, Hb // 2, Tn, 2 * d)
    return pl.pallas_call(
        functools.partial(_kernel2_dma if dma_only else _kernel2,
                          dtype=dtype),
        out_shape=jax.ShapeDtypeStruct((Wn, Hn, G, d), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(Wn, ng),
            in_specs=[
                pl.BlockSpec((1, Hb, d, Tn), lambda w, g: (w, g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, Hb, Tn), lambda w, g: (w, g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, Hb // 2, Tn, 2 * d),
                             lambda w, g: (w, g, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, Hb, Tn), lambda w, g: (w, g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Hb, G, d), lambda w, g: (w, g, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, Hb, G, d), lambda w, g: (w, g, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )(kt, ks4, vf5, vs4, qh.astype(dtype))


def _kernel2_dma(kt_ref, ks_ref, vf_ref, vs_ref, q_ref, o_ref, *, dtype):
    # pure-DMA floor: touch every input block, near-zero compute
    s = (jnp.sum(kt_ref[0][:, 0, :1].astype(jnp.float32))
         + jnp.sum(vf_ref[0, 0][:, 0, :1].astype(jnp.float32))
         + jnp.sum(ks_ref[0, 0][:, :1]) + jnp.sum(vs_ref[0, 0][:, :1]))
    o_ref[0] = q_ref[0].astype(jnp.float32) + s


def fold_v(vc):
    """(W, H, T, d) -> (W, H//2, T, 2d) lane-fold of head pairs."""
    Wn, Hn, Tn, d = vc.shape
    return (vc.reshape(Wn, Hn // 2, 2, Tn, d)
              .transpose(0, 1, 3, 2, 4)
              .reshape(Wn, Hn // 2, Tn, 2 * d))


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="check",
                    choices=["check", "xla", "pl", "check2", "pl2", "dma2"],
                    help="check: numeric check only; xla/pl: time one chain;"
                         " *2: transposed-K / folded-V layout kernel;"
                         " dma2: kernel2 blocks, compute stripped")
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--G", type=int, default=1,
                    help="queries per head (compute/DMA-bound diagnostic)")
    ap.add_argument("--padt", action="store_true",
                    help="pad audio ctx T 1500 -> 1536 (128-aligned rows)")
    ap.add_argument("--hb", type=int, default=None,
                    help="override head-block size for kernel2")
    ap.add_argument("--fold", action="store_true",
                    help="synthetic head-pair fold: H=10, d=128 (lane-"
                         "aligned, same bytes) to test d=64 padding cost")
    a = ap.parse_args()
    global L, H, D, T
    L = a.layers
    if a.padt:
        T = 1536
    if a.fold:
        H, D = H // 2, D * 2
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    q0 = jax.random.normal(k1, (W, H, a.G, D), DT)
    kc = jax.random.randint(k2, (L, W, H, T, D), -127, 127, jnp.int8)
    ks = jnp.abs(jax.random.normal(k3, (L, W, H, T), jnp.float32)) * 0.1
    vs = ks * 0.5
    gb = (2 * L * W * H * T * D + 2 * 4 * L * W * H * T) / 1e9
    print(f"L={L} H={H} D={D} G={a.G} data built", flush=True)

    if a.mode in ("check", "check2"):
        if a.mode == "check":
            got = np.asarray(cross_kernel(kc[0], ks[0], kc[0], vs[0], q0))
        else:
            got = np.asarray(cross_kernel2(
                jnp.transpose(kc[0], (0, 1, 3, 2)), ks[0],
                fold_v(kc[0]), vs[0], q0))
        ref = np.asarray(M.cross_attend(q0.astype(jnp.float32),
                                        M.XK8(kc[0], ks[0]),
                                        M.XK8(kc[0], vs[0]), DT))
        d = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        print(f"max rel diff vs XLA: {d:.2e}", flush=True)
        return

    def chain_xla():
        @jax.jit
        def chain(K, q0, kc, ks, vs):
            def body(i, q):
                acc = q
                for l in range(L):      # python l like the unrolled decode
                    ck = M.XK8(kc[l], ks[l])
                    cv = M.XK8(kc[l], vs[l])
                    out = M.cross_attend(acc, ck, cv, DT)
                    acc = acc + out.astype(DT) * 1e-6
                return acc
            return jax.lax.fori_loop(0, K, body, q0).sum()
        return chain

    def chain_pl():
        @jax.jit
        def chain(K, q0, kc, ks, vs):
            def body(i, q):
                acc = q
                for l in range(L):
                    out = cross_kernel(kc[l], ks[l], kc[l], vs[l], acc)
                    acc = acc + out.astype(DT) * 1e-6
                return acc
            return jax.lax.fori_loop(0, K, body, q0).sum()
        return chain

    def chain_pl2():
        kt = jnp.transpose(kc, (0, 1, 2, 4, 3))   # (L, W, H, d, T)
        vf = jnp.stack([fold_v(kc[l]) for l in range(L)])
        dma = a.mode == "dma2"

        @jax.jit
        def chain(K, q0, kt, ks, vf, vs):
            def body(i, q):
                acc = q
                for l in range(L):
                    out = cross_kernel2(kt[l], ks[l], vf[l], vs[l], acc,
                                        hb=a.hb, dma_only=dma)
                    acc = acc + out.astype(DT) * 1e-6
                return acc
            return jax.lax.fori_loop(0, K, body, q0).sum()
        return chain, (q0, kt, ks, vf, vs)

    if a.mode in ("pl2", "dma2"):
        chain, cargs = chain_pl2()
        ms = per_op_ms(chain, 2, 6, cargs)
        print(f"{a.mode:6s}{ms:7.3f} ms/step  ({gb/ms*1000:6.1f} GB/s eff)",
              flush=True)
        return

    chain = chain_xla() if a.mode == "xla" else chain_pl()
    ms = per_op_ms(chain, 2, 6, (q0, kc, ks, vs))
    print(f"{a.mode:6s}{ms:7.3f} ms/step  ({gb/ms*1000:6.1f} GB/s eff)",
          flush=True)


if __name__ == "__main__":
    main()
