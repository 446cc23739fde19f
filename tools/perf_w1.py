#!/usr/bin/env python
"""Single-stream (W=1) decode-step attribution (VERDICT r3 weak #5).

BENCH_r03: packed-q5_0 large-v3 decode at W=1 costs 2.62 ms/tok while the
measured HBM stream rate (654 GB/s effective, docs/PERF.md) over the packed
decoder weights + per-token KV implies ~1.3 ms.  This tool knocks pieces out
of the EXACT chain bench.py times (fori_loop of decode_step, argmax feedback,
attn_ctx=first bucket) so the W=1 gap is attributed in the production graph:

  full       — bench.py's packed W=1 chain verbatim
  dense      — same chain, bf16 dense weights (bench dec_ms)
  novocab    — logits head (51866-row packed matmul) shrunk to 512 rows
  logitsonly — JUST the packed logits head on a (1,1,S) activation
  nocross    — cross-KV truncated 1500 -> 8 frames (stream + matmul cost)
  selfctx16  — attn_ctx 128 -> 16 (self-cache read cost at bucket-128)
  tinystate  — identical op graph at n_state=128 (op-dispatch/launch floor:
               every matmul is tiny, so what remains is per-op latency)
  w16        — the W=16 serving chain / 16 (amortization reference)

Roofline context: packed decoder weights ~690 MB + int8 cross-KV 123 MB +
self-cache ~10 MB => ~1.26 ms at 654 GB/s.
"""

from __future__ import annotations

import sys
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

from _timing import per_op_ms

DT = jnp.bfloat16


def pack_decoder(params, hp, n_vocab=None):
    """bench.py's packed-decoder synthesis (QWeightT per-layer planes)."""
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
    nv = n_vocab or params["dec"]["tok_embd"].shape[0]
    te = synth_qweight((nv, params["dec"]["tok_embd"].shape[1]))
    packed["dec"]["tok_embd"] = te
    packed["dec"]["tok_embd_t"] = QWeightT(te.codes.T + 0, te.scales.T + 0)
    return packed


def make_chain(hp, n_beam, attn_ctx, q8cache=False):
    @jax.jit
    def chain(K, params, xk, xv):
        cache = (M.new_cache(hp, n_beam, DT, itype="q8") if q8cache
                 else M.KVCache.zeros(hp, n_beam, DT))

        def body(i, carry):
            cache, tok = carry
            pos = jnp.clip(i, 0, hp.n_text_ctx - 1) * jnp.ones(
                (n_beam, 1), jnp.int32)
            logits, cache = M.decode_step(
                params, tok, pos, i, cache, xk, xv, hp, dtype=DT,
                attn_ctx=attn_ctx)
            tok = (jnp.argmax(logits, axis=-1) % 256).astype(jnp.int32)
            return cache, tok

        cache, tok = jax.lax.fori_loop(
            0, K, body, (cache, jnp.zeros((n_beam, 1), jnp.int32)))
        return tok.sum()
    return chain


def main():
    print(f"devices: {jax.devices()}", flush=True)
    hp = H.LARGE_V3
    params = synth_params(hp, DT)
    mel = jax.random.normal(jax.random.PRNGKey(1),
                            (hp.n_mels, 2 * hp.n_audio_ctx), jnp.float32)

    @jax.jit
    def encode_fn(params, mel):
        enc = M.encode(params, mel, hp, dtype=DT)
        return M.compute_cross_kv(params, enc, hp, dtype=DT)

    xk, xv = encode_fn(params, mel)
    packed = pack_decoder(params, hp)
    bucket0 = M.attn_ctx_buckets(hp.n_text_ctx)[0]

    variants = sys.argv[1:] or ("full", "dense", "novocab", "logitsonly",
                                "nocross", "selfctx16", "tinystate", "q8kv")
    for v in variants:
        if v == "full":
            ms = per_op_ms(make_chain(hp, 1, bucket0), 32, 128,
                           (packed, xk, xv))
        elif v == "q8kv":
            # int8 self-cache (engages the Pallas decode-attn kernel) +
            # int8 cross-KV planes — the serving path's cache formats at W=1
            @jax.jit
            def quantize_cross(xk, xv):
                from whisper_tpu.models.whisper.model import (XK8,
                                                              _quantize_rows)
                kq, ks = _quantize_rows(xk)
                vq, vs = _quantize_rows(xv)
                return XK8(kq, ks), XK8(vq, vs)

            xk8, xv8 = quantize_cross(xk, xv)
            ms = per_op_ms(make_chain(hp, 1, bucket0, q8cache=True), 32, 128,
                           (packed, xk8, xv8))
        elif v == "dense":
            ms = per_op_ms(make_chain(hp, 1, bucket0), 32, 128,
                           (params, xk, xv))
        elif v == "novocab":
            p512 = pack_decoder(params, hp, n_vocab=512)
            ms = per_op_ms(make_chain(hp, 1, bucket0), 32, 128,
                           (p512, xk, xv))
        elif v == "logitsonly":
            from whisper_tpu.ops.qmm import qmmt_auto
            te_t = packed["dec"]["tok_embd_t"]

            @jax.jit
            def lchain(K, te_t):
                x0 = jnp.ones((1, hp.n_text_state), DT)

                def body(i, x):
                    lg = qmmt_auto(x, te_t, DT)
                    return x + (lg.sum() * 1e-12).astype(x.dtype)
                return jax.lax.fori_loop(0, K, body, x0).sum()

            ms = per_op_ms(lchain, 32, 128, (te_t,))
        elif v == "nocross":
            xk8 = jax.tree.map(lambda a: a[:, :, :8] + 0, xk)
            xv8 = jax.tree.map(lambda a: a[:, :, :8] + 0, xv)
            ms = per_op_ms(make_chain(hp, 1, bucket0), 32, 128,
                           (packed, xk8, xv8))
        elif v == "selfctx16":
            ms = per_op_ms(make_chain(hp, 1, 16), 32, 128, (packed, xk, xv))
        elif v == "tinystate":
            import dataclasses
            hpt = dataclasses.replace(
                hp, n_audio_state=128, n_text_state=128,
                n_audio_head=2, n_text_head=2, n_vocab=512)
            pt = synth_params(hpt, DT)

            @jax.jit
            def enc_t(pt, melt):
                e = M.encode(pt, melt, hpt, dtype=DT)
                return M.compute_cross_kv(pt, e, hpt, dtype=DT)

            melt = mel[: hpt.n_mels]
            xkt, xvt = enc_t(pt, melt)
            pkt = pack_decoder(pt, hpt)
            ms = per_op_ms(make_chain(hpt, 1, bucket0), 32, 128,
                           (pkt, xkt, xvt))
        else:
            print(f"unknown variant {v}")
            continue
        print(f"{v:10s} {ms:7.3f} ms/tok", flush=True)


if __name__ == "__main__":
    main()
