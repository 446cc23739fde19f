#!/usr/bin/env python
"""Batch-width (W) sweep of the production serving step.

The round-1 sweep (docs/PERF.md: W=16 454x, W=24 393x, W=32 349x) predates
three serving-step changes that shrank the per-window HBM working set and
the fixed per-step cost: packed q5_0 decoder weights (ops/qmm.py), the
head-major int8 self-cache, and the bucket-128 segmented attention context
(device_loop.segmented_loop).  Those shift the optimum W: the cross-KV read
scales with W while the (now smaller) weight stream amortizes over it, so
the knee where the working set thrashes may have moved.

Replicates bench.py's batched_chain exactly (int8 cross+self KV, packed
Q5_0 decoder, first-bucket attn_ctx) and reports ms/tok/window plus the
implied end-to-end RTF charging the measured solo-encode time per window.

Run on the real chip:  python tools/perf_wsweep.py --widths 8,16,24,32,48
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from whisper_tpu.models.whisper import hparams as H
from whisper_tpu.models.whisper import model as M
from whisper_tpu.models.whisper.load import PACKED_DEC_KEYS
from whisper_tpu.ops.qmm import QWeight, QWeightT
from whisper_tpu.utils.synth import synth_params


def _timed(fn, *args, reps=3):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def per_op_ms(chain, k1, k2, args_fn, reps=3):
    t1 = _timed(chain, jnp.int32(k1), *args_fn(), reps=reps)
    t2 = _timed(chain, jnp.int32(k2), *args_fn(), reps=reps)
    return max(0.0, (t2 - t1) / (k2 - k1)) * 1000


def synth_packed(params, hp):
    key = jax.random.PRNGKey(2)

    def synth_qweight(shape_out_in):
        nonlocal key
        key, k1, k2 = jax.random.split(key, 3)
        r, k = shape_out_in
        codes = jax.random.randint(k1, (r, k), -16, 16, jnp.int8)
        scales = jax.random.uniform(k2, (r, k // 32), jnp.float32) * 0.02
        return QWeight(codes, scales)

    packed = dict(params)
    packed["dec"] = dict(params["dec"])
    packed["dec"]["blocks"] = dict(params["dec"]["blocks"])
    L = params["dec"]["blocks"]["qkv_b"].shape[0]
    blocks_packed = [dict() for _ in range(L)]
    for kname in PACKED_DEC_KEYS:
        w = params["dec"]["blocks"][kname]
        _, i_dim, o_dim = w.shape
        for l in range(L):
            q = synth_qweight((o_dim, i_dim))
            blocks_packed[l][kname] = QWeightT(
                jnp.swapaxes(q.codes, 0, 1) + 0,
                jnp.swapaxes(q.scales, 0, 1) + 0)
        del packed["dec"]["blocks"][kname]
    packed["dec"]["blocks_packed"] = blocks_packed
    te = synth_qweight(params["dec"]["tok_embd"].shape)
    packed["dec"]["tok_embd"] = te
    packed["dec"]["tok_embd_t"] = QWeightT(te.codes.T + 0, te.scales.T + 0)
    return packed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="large-v3")
    ap.add_argument("--widths", default="8,16,24,32,48")
    ap.add_argument("--enc-ms", type=float, default=None,
                    help="charge this solo-encode ms/window for RTF "
                         "(default: skip RTF if not given)")
    ap.add_argument("--tokens", type=int, default=64)
    args = ap.parse_args()

    hp = {"tiny": H.TINY, "base": H.BASE, "small": H.SMALL,
          "medium": H.MEDIUM, "large-v3": H.LARGE_V3,
          "large-v3-turbo": H.LARGE_V3_TURBO}[args.model]
    dtype = jnp.bfloat16
    params = synth_params(hp, dtype)
    packed = synth_packed(params, hp)

    Tc = hp.n_audio_ctx
    d = hp.n_text_state // hp.n_text_head
    key = jax.random.PRNGKey(0)
    xk = jax.random.normal(
        key, (hp.n_text_layer, hp.n_text_head, Tc, d), dtype)
    xv = xk * 0.5

    @jax.jit
    def quantize_cross(xk, xv):
        from whisper_tpu.models.whisper.model import _quantize_rows, XK8
        kq, ks = _quantize_rows(xk)
        vq, vs = _quantize_rows(xv)
        return XK8(kq, ks), XK8(vq, vs)

    xk8, xv8 = quantize_cross(xk, xv)
    bucket0 = M.attn_ctx_buckets(hp.n_text_ctx)[0]

    for W in [int(w) for w in args.widths.split(",")]:

        @jax.jit
        def batched_chain(K, params, xkb, xvb):
            def body(i, carry):
                cache, tok = carry
                pos = jnp.clip(i, 0, hp.n_text_ctx - 1) * jnp.ones(
                    (W, 1), jnp.int32)
                logits, cache = M.decode_step(
                    params, tok, pos, i, cache, xkb, xvb, hp,
                    dtype=dtype, attn_ctx=bucket0)
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return cache, tok

            cache0 = M.new_cache(hp, W, dtype, itype="q8")
            cache, tok = jax.lax.fori_loop(
                0, K, body, (cache0, jnp.zeros((W, 1), jnp.int32)))
            return tok.sum()

        def per_window(t):
            return jax.tree.map(
                lambda a: jnp.broadcast_to(
                    a[:, None], (a.shape[0], W) + a.shape[1:]) + 0, t)

        xkb, xvb = per_window(xk8), per_window(xv8)
        try:
            ms = per_op_ms(batched_chain, 16, 64,
                           lambda: (packed, xkb, xvb))
        except Exception as e:  # OOM at large W
            print(json.dumps({"W": W, "error": str(e)[:200]}))
            continue
        per_win = ms / W
        out = {"W": W, "step_ms": round(ms, 3),
               "ms_per_tok_per_window": round(per_win, 4)}
        if args.enc_ms is not None:
            window_s = (args.enc_ms + args.tokens * per_win) / 1000.0
            out["rtf"] = round(30.0 / window_s, 1)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
