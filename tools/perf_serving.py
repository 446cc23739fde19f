#!/usr/bin/env python
"""Serving-step decomposition at large-v3, W=16, q8 caches, packed weights.

Ablates the lockstep decode step by nulling one subsystem at a time:
  full           — the real step (bench.py's batched_chain)
  no_cross       — cross-attention output replaced by zeros (skips the
                   ~2 GB/step int8 cross-KV read)
  no_self        — self-attention skipped (skips cache write/read)
  no_logits      — logits head replaced (skips the 66 MB embedding read)
Differences attribute the step time to streams; guides whether a custom
attention kernel / 4-bit KV formats are worth building.
"""

from __future__ import annotations

import dataclasses
import functools
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

hp = H.LARGE_V3
DT = jnp.bfloat16
W = 16


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


def build_params(packed: bool):
    params = synth_params(hp, DT)
    if not packed:
        return params
    key = jax.random.PRNGKey(2)

    def synth_q(shape_out_in):
        nonlocal key
        key, k1, k2 = jax.random.split(key, 3)
        r, k = shape_out_in
        return QWeight(jax.random.randint(k1, (r, k), -16, 16, jnp.int8),
                       jax.random.uniform(k2, (r, k // 32),
                                          jnp.float32) * 0.02)

    packed_p = dict(params)
    packed_p["dec"] = dict(params["dec"])
    packed_p["dec"]["blocks"] = dict(params["dec"]["blocks"])
    L = params["dec"]["blocks"]["qkv_b"].shape[0]
    bp = [dict() for _ in range(L)]
    for kname in PACKED_DEC_KEYS:
        w = params["dec"]["blocks"][kname]
        _, i_dim, o_dim = w.shape
        for l in range(L):
            q = synth_q((o_dim, i_dim))
            bp[l][kname] = QWeightT(jnp.swapaxes(q.codes, 0, 1) + 0,
                                    jnp.swapaxes(q.scales, 0, 1) + 0)
        del packed_p["dec"]["blocks"][kname]
    packed_p["dec"]["blocks_packed"] = bp
    te = synth_q(params["dec"]["tok_embd"].shape)
    packed_p["dec"]["tok_embd"] = te
    packed_p["dec"]["tok_embd_t"] = QWeightT(te.codes.T + 0, te.scales.T + 0)
    return packed_p


def main():
    print(f"devices: {jax.devices()}", flush=True)
    params = build_params(packed=True)

    key = jax.random.PRNGKey(0)
    d = hp.n_text_state // hp.n_text_head
    xk = jax.random.normal(key, (hp.n_text_layer, hp.n_text_head,
                                 hp.n_audio_ctx, d), DT)
    xv = xk * 0.5

    @jax.jit
    def quantize_cross(xk, xv):
        kq, ks = M._quantize_rows(xk)
        vq, vs = M._quantize_rows(xv)
        return M.XK8(kq, ks), M.XK8(vq, vs)

    xk8, xv8 = quantize_cross(xk, xv)

    def per_window(t):
        return jax.tree.map(
            lambda a: jnp.broadcast_to(
                a[:, None], (a.shape[0], W) + a.shape[1:]) + 0, t)

    xkb, xvb = per_window(xk8), per_window(xv8)

    import whisper_tpu.models.whisper.model as Mod

    def measure(mode):
        hp_m = (dataclasses.replace(hp, n_text_ctx=112)
                if mode == "ctx112" else hp)
        orig_cross = Mod.cross_attend
        orig_mm = Mod._mm
        orig_fused_g = Mod._mm_fused
        if mode == "no_cross":
            Mod.cross_attend = (
                lambda qh, ck, cv, dtype, return_probs=False:
                jnp.zeros(qh.shape, jnp.float32))
        elif mode == "no_logits":
            def mm(x, w, dtype):
                if isinstance(w, (QWeight, QWeightT)) and \
                        w.shape[0] > 50000:
                    return jnp.zeros(x.shape[:-1] + (w.shape[0],),
                                     jnp.float32)
                return orig_mm(x, w, dtype)
            Mod._mm = mm

            orig_fused = Mod._mm_fused

            def mmf(x, w, dtype, **kw):
                if isinstance(w, (QWeight, QWeightT)) and \
                        w.shape[0] > 50000:
                    return jnp.zeros(x.shape[:-1] + (w.shape[0],),
                                     jnp.float32)
                return orig_fused(x, w, dtype, **kw)
            Mod._mm_fused = mmf
        try:
            @jax.jit
            def chain(K, params, xkb, xvb):
                def body(i, carry):
                    cache, tok = carry
                    pos = jnp.clip(i, 0, hp_m.n_text_ctx - 1) * jnp.ones(
                        (W, 1), jnp.int32)
                    logits, cache = M.decode_step(
                        params, tok, pos, i, cache, xkb, xvb, hp_m, dtype=DT,
                        attn_ctx=None if mode == "full448" else min(
                            128, hp_m.n_text_ctx))
                    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                    return cache, tok
                cache0 = M.new_cache(hp_m, W, DT, itype="q8")
                cache, tok = jax.lax.fori_loop(
                    0, K, body, (cache0, jnp.zeros((W, 1), jnp.int32)))
                # fold the cache into the output so DCE cannot delete the
                # loop when an ablation makes `tok` constant
                leaves = jax.tree.leaves(cache)
                return tok.sum() + sum(l[..., :1, :1].sum().astype(jnp.int32)
                                       for l in leaves if l.ndim >= 2)
            return per_op_ms(chain, 16, 64, (params, xkb, xvb))
        finally:
            Mod.cross_attend = orig_cross
            Mod._mm = orig_mm
            Mod._mm_fused = orig_fused_g

    # all modes except full448 run the production bucket-128 regime
    # (device_loop.segmented_loop's first segment)
    for mode in ("full448", "full", "no_cross", "no_logits", "ctx112"):
        ms = measure(mode)
        print(f"{mode:10s} {ms:7.3f} ms/step  "
              f"({ms/W*1000:6.1f} us/tok/window)", flush=True)


if __name__ == "__main__":
    main()
