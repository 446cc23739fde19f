#!/usr/bin/env python
"""Encoder MFU ablation at large-v3 dims (T=1500, S=1280, H=20, L=32).

Times the conv stem, per-block attention/MLP pieces, flash block-size
variants, and a fused-QKV block variant to find where the ~20 ms/window
encode (57% MFU) goes.  Chain-timed like bench.py so the tunnel RTT
cancels.
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

from whisper_tpu.models.whisper import hparams as H
from whisper_tpu.models.whisper import model as M
from whisper_tpu.utils.synth import synth_params

hp = H.LARGE_V3
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


def chain_of(fn):
    @jax.jit
    def chain(K, x, *rest):
        def body(i, c):
            y = fn(c, *rest)
            return c + (y.sum() * 1e-12).astype(c.dtype)
        return jax.lax.fori_loop(0, K, body, x).sum()
    return chain


def main():
    # section selection: pass names (stem/block/parts/flash/xla/fused/full)
    # to run a subset; default skips the slow flash sweep (already tuned,
    # commit d896bac) and the xla reference
    want = set(sys.argv[1:]) or {"stem", "block", "parts", "fused", "full"}
    print(f"devices: {jax.devices()}", flush=True)
    params = synth_params(hp, DT)
    enc = params["enc"]
    blk = jax.tree.map(lambda a: a[0], enc["blocks"])
    mel = jax.random.normal(jax.random.PRNGKey(0),
                            (hp.n_mels, 2 * hp.n_audio_ctx), jnp.float32)
    T, S, Hh = hp.n_audio_ctx, hp.n_audio_state, hp.n_audio_head
    x = jax.random.normal(jax.random.PRNGKey(1), (T, S), jnp.float32)
    L = hp.n_audio_layer

    def sect(label, fn):
        try:
            v = fn()
            print(label % (v * 1000), flush=True)
            return v
        except Exception as e:
            print(f"{label.split('%')[0]} FAILED: {type(e).__name__}",
                  flush=True)
            return None

    if "stem" in want:
        sect("conv stem               %8.0f us",
             lambda: per_op_ms(chain_of(
                 lambda m: M.conv_stem(enc, m, DT)), 2, 8, (mel,)))

    if "block" in want:
        sect(f"one block (x{L})         %8.0f us",
             lambda: per_op_ms(chain_of(
                 lambda c: M._encoder_block(c, blk, Hh, hp.eps, DT)),
                 4, 16, (x,)))

    # un-fused baseline: three separate (S,S) projections (pre-round-2 layout)
    sep = {n: blk["qkv_w"][:, i * S:(i + 1) * S] + 0 for i, n in
           enumerate(("q_w", "k_w", "v_w"))}
    sep.update({n: blk["qkv_b"][i * S:(i + 1) * S] + 0 for i, n in
                enumerate(("q_b", "k_b", "v_b"))})

    def attn_only(c):
        h = M.layer_norm(c, blk["attn_ln_w"], blk["attn_ln_b"], hp.eps)
        q = M._mm(h, sep["q_w"], DT) + sep["q_b"]
        k = M._mm(h, sep["k_w"], DT)
        v = M._mm(h, sep["v_w"], DT) + sep["v_b"]
        from whisper_tpu.ops.attention import flash_self_attention

        out = flash_self_attention(*(M._split_heads(t, Hh)
                                     for t in (q, k, v)))
        return c + M._mm(M._merge_heads(out), blk["o_w"], DT) + blk["o_b"]

    def mlp_only(c):
        h = M.layer_norm(c, blk["mlp_ln_w"], blk["mlp_ln_b"], hp.eps)
        h = M._gelu(M._mm(h, blk["mlp0_w"], DT) + blk["mlp0_b"])
        return c + M._mm(h, blk["mlp1_w"], DT) + blk["mlp1_b"]

    if "parts" in want:
        sect("  attn part             %8.0f us",
             lambda: per_op_ms(chain_of(attn_only), 4, 16, (x,)))
        sect("  mlp part              %8.0f us",
             lambda: per_op_ms(chain_of(mlp_only), 4, 16, (x,)))

    # flash attention variants
    qh = jax.random.normal(jax.random.PRNGKey(2), (Hh, T, S // Hh),
                           jnp.float32)

    def flash_var(bq, bk):
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, SegmentIds, flash_attention)

        tp = 1536
        pad = tp - T

        def p(t):
            return jnp.pad(t.astype(jnp.bfloat16),
                           ((0, 0), (0, pad), (0, 0)))[None]

        bs = BlockSizes(block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
                        block_q_major_dkv=bq, block_k_major_dkv=bk,
                        block_k_dkv=bk, block_q_dkv=bq, block_k_major_dq=bk,
                        block_k_dq=bk, block_q_dq=bq)

        def run(q3):
            seg = jnp.where(jnp.arange(tp) < T, 1, 2).astype(jnp.int32)[None]
            out = flash_attention(
                p(q3), p(q3), p(q3), segment_ids=SegmentIds(q=seg, kv=seg),
                causal=False, sm_scale=1.0 / math.sqrt(S // Hh),
                block_sizes=bs)
            return out[0, :, :T, :]
        return run

    for bq in (256, 512, 768) if "flash" in want else ():
        for bk in (512, 768, 1536):
            if bk % 512 and bk != 768:
                continue
            try:
                ms = per_op_ms(chain_of(flash_var(bq, bk)), 4, 16, (qh,))
                print(f"  flash bq={bq:<4} bk={bk:<5} {ms*1000:8.0f} us",
                      flush=True)
            except Exception as e:
                print(f"  flash bq={bq} bk={bk}: {type(e).__name__}",
                      flush=True)

    # XLA (non-flash) attention for reference
    def xla_attn(q3):
        return M.attention(q3, q3, q3, None, DT)

    if "xla" in want:
        sect("  xla attention         %8.0f us",
             lambda: per_op_ms(chain_of(xla_attn), 2, 8, (qh,)))

    # fused QKV variant: one (S -> 3S) matmul (the production layout)
    def attn_fused(c):
        h = M.layer_norm(c, blk["attn_ln_w"], blk["attn_ln_b"], hp.eps)
        qkv = M._mm(h, blk["qkv_w"], DT) + blk["qkv_b"]
        from whisper_tpu.ops.attention import flash_self_attention

        out = flash_self_attention(*(M._split_heads(qkv[..., i*S:(i+1)*S], Hh)
                                     for i in range(3)))
        return c + M._mm(M._merge_heads(out), blk["o_w"], DT) + blk["o_b"]

    if "fused" in want:
        sect("  attn fused-qkv        %8.0f us",
             lambda: per_op_ms(chain_of(attn_fused), 4, 16, (x,)))

    if "full" in want:
        sect("encode full             %8.0f us",
             lambda: per_op_ms(chain_of(
                 lambda m: M.encode(params, m, hp, dtype=DT)), 2, 5, (mel,)))

    # roofline context
    flops_blk = (4 * S * S + 2 * 4 * S * S) * T * 2 + 2 * 2 * T * T * S
    print(f"\nper-block roofline @197T: {flops_blk/197e12*1e6:.0f} us; "
          f"x{L} + stem = speed of light", flush=True)


if __name__ == "__main__":
    main()
