#!/usr/bin/env python
"""Root-cause the batched-encode regression (VERDICT r2 weak #3 / next #3).

bench.py r2 measured vmapped W=16 encodes 27% SLOWER per window than solo
(26.1 vs 20.5 ms incl. cross-KV).  This probe attributes where the loss
goes by sweeping W x {attention backend} x {encode vs cross-KV}:

  python tools/perf_enc_batch.py [--model large-v3] [--w 1 4 16]

Run alone on the TPU — concurrent processes make tunnel timings garbage.
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from whisper_tpu.models.whisper import hparams as H
from whisper_tpu.models.whisper import model as M
from whisper_tpu.utils.synth import synth_params

DT = jnp.bfloat16


def _timed(fn, *args, reps=4):
    np.asarray(jax.block_until_ready(fn(*args)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jax.block_until_ready(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    return best


def per_op_ms(chain, k1, k2, *args):
    t1 = _timed(chain, jnp.int32(k1), *args)
    t2 = _timed(chain, jnp.int32(k2), *args)
    return max(0.0, (t2 - t1) / (k2 - k1)) * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="large-v3")
    ap.add_argument("--w", type=int, nargs="+", default=[1, 4, 16])
    ap.add_argument("--cross", action="store_true",
                    help="include cross-KV precompute in the chain")
    args = ap.parse_args()

    hp = getattr(H, args.model.upper().replace("-", "_"))
    params = synth_params(hp, DT)
    mel = jax.random.normal(jax.random.PRNGKey(1),
                            (hp.n_mels, 2 * hp.n_audio_ctx), jnp.float32)

    def make_solo(with_cross):
        @jax.jit
        def chain(K, params, mel):
            def body(i, m):
                enc = M.encode(params, m, hp, dtype=DT)
                r = enc
                if with_cross:
                    xk, _ = M.compute_cross_kv(params, enc, hp, dtype=DT)
                    r = xk
                return m + (r.mean() * 1e-12).astype(m.dtype)
            return jax.lax.fori_loop(0, K, body, mel).mean()
        return chain

    def make_vmap(with_cross, w):
        @jax.jit
        def chain(K, params, melb):
            def body(i, m):
                enc = jax.vmap(lambda mm: M.encode(params, mm, hp,
                                                   dtype=DT))(m)
                r = enc
                if with_cross:
                    xk, _ = jax.vmap(lambda e: M.compute_cross_kv(
                        params, e, hp, dtype=DT))(enc)
                    r = xk
                return m + (r.mean() * 1e-12).astype(m.dtype)
            return jax.lax.fori_loop(0, K, body, melb).mean()
        return chain

    for backend in ("auto", "flash", "xla"):
        os.environ["WTPU_ENC_ATTN"] = backend
        solo = per_op_ms(make_solo(args.cross), 2, 6, params, mel)
        line = f"[{backend:5s}] solo {solo:7.2f} ms"
        for w in args.w:
            if w == 1:
                continue
            melb = jnp.broadcast_to(mel, (w,) + mel.shape) * (
                1.0 + jnp.arange(w, dtype=jnp.float32)[:, None, None] * 1e-3)
            t = per_op_ms(make_vmap(args.cross, w), 2, 6, params, melb)
            line += f" | W={w}: {t / w:7.2f} ms/win"
        print(line, flush=True)


if __name__ == "__main__":
    main()
