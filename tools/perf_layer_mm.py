#!/usr/bin/env python
"""Per-matmul overhead probe at decode shapes (large-v3, W=16 rows).

tools/perf_serving.py attributes ~242 us/layer to the six packed matmuls
plus attention; the weight DMA floor is only ~36 us/layer.  This chains
JUST the per-layer matmul sequence (qkv, o, xq, xo, mlp0+mlp1) with the
fused-epilogue kernels over 32 layers of distinct synthetic weights to
separate fixed per-call cost from bytes.  Also measures an MLP-pair
variant (one call for mlp0+mlp1) to price call-merging.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from whisper_tpu.ops.qmm import QWeightT
from whisper_tpu.models.whisper.model import _mm_fused

L, W, S, M = 32, 16, 1280, 5120
DT = jnp.bfloat16


def _timed(fn, *args, reps=3):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        best = min(best, (np.asarray(fn(*args)), time.perf_counter() - t0)[1])
    return best


def per_op_ms(chain, k1, k2, args, reps=3):
    t1 = _timed(chain, jnp.int32(k1), *args, reps=reps)
    t2 = _timed(chain, jnp.int32(k2), *args, reps=reps)
    return max(0.0, (t2 - t1) / (k2 - k1)) * 1000


def synth_qt(key, k_dim, r_dim):
    k1, k2 = jax.random.split(key)
    return QWeightT(jax.random.randint(k1, (k_dim, r_dim), -16, 16, jnp.int8),
                    jax.random.uniform(k2, (k_dim // 32, r_dim),
                                       jnp.float32) * 0.02)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, L * 6).reshape(L, 6, 2)
    layers = []
    for l in range(L):
        kk = [jax.random.fold_in(key, l * 6 + i) for i in range(6)]
        layers.append(dict(
            qkv=synth_qt(kk[0], S, 3 * S), o=synth_qt(kk[1], S, S),
            xq=synth_qt(kk[2], S, S), xo=synth_qt(kk[3], S, S),
            mlp0=synth_qt(kk[4], S, M), mlp1=synth_qt(kk[5], M, S),
            ln=(jnp.ones((S,), jnp.float32), jnp.zeros((S,), jnp.float32)),
            b3=jnp.zeros((3 * S,), jnp.float32),
            b1=jnp.zeros((S,), jnp.float32),
            bm=jnp.zeros((M,), jnp.float32)))

    gb = sum(float(np.prod(w[k].codes_t.shape)) for w in layers
             for k in ("qkv", "o", "xq", "xo", "mlp0", "mlp1")) / 1e9

    @jax.jit
    def chain(K, x0, layers):
        def body(i, x):
            for w in layers:
                qkv = _mm_fused(x, w["qkv"], DT, ln=w["ln"], bias=w["b3"])
                x = _mm_fused(qkv[..., :S].astype(jnp.float32) * 1e-3,
                              w["o"], DT, bias=w["b1"], res=x)
                q = _mm_fused(x, w["xq"], DT, ln=w["ln"], bias=w["b1"])
                x = _mm_fused(q * 1e-3, w["xo"], DT, bias=w["b1"], res=x)
                h = _mm_fused(x, w["mlp0"], DT, ln=w["ln"], bias=w["bm"],
                              act="gelu")
                x = _mm_fused(h, w["mlp1"], DT, bias=w["b1"], res=x)
            return x * (1.0 / (1.0 + 1e-6))
        return jax.lax.fori_loop(0, K, body, x0).sum()

    x0 = jax.random.normal(key, (W, S), jnp.float32) * 0.1
    ms = per_op_ms(chain, 4, 12, (x0, layers))
    n_calls = L * 6
    print(f"6-call layer seq   {ms:7.3f} ms/step  "
          f"({ms*1000/n_calls:5.1f} us/call, floor {gb/0.638/ms:4.1f}x, "
          f"{gb:.2f} GB)", flush=True)


if __name__ == "__main__":
    main()
