#!/usr/bin/env python
"""A/B the encoder block attention designs at production shapes
(large-v3, padded-resident T=1536, true_len=1500, bf16):

  A. separate q/k/v matmuls + head split transposes + upstream flash
     (the committed round-1 design)
  B. fused (S->3S) qkv matmul + lane slices + transposes + flash
     (regressed end-to-end: 24.8 vs 19.3 ms encode — the slices and
     transposes of the 11.8 MB fused output don't fuse)
  C. fused qkv matmul + enc_attn Pallas kernel (reads q/k/v straight
     from the fused buffer per head-pair; zero transposes)

Chain-timed; run alone on the TPU.
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from _timing import per_op_ms

from whisper_tpu.models.whisper import hparams as H
from whisper_tpu.models.whisper import model as M
from whisper_tpu.ops.attention import flash_self_attention
from whisper_tpu.ops.enc_attn import self_attention_qkv
from whisper_tpu.utils.synth import synth_params

hp = H.LARGE_V3
DT = jnp.bfloat16
TP, TL = 1536, 1500



def chain_of(fn):
    @jax.jit
    def chain(K, x, *rest):
        def body(i, c):
            y = fn(c, *rest)
            return c + (y.sum() * 1e-12).astype(c.dtype)
        return jax.lax.fori_loop(0, K, body, x).sum()
    return chain


def main():
    print(f"devices: {jax.devices()}", flush=True)
    params = synth_params(hp, DT)
    blk = jax.tree.map(lambda a: a[0], params["enc"]["blocks"])
    S, Hh = hp.n_audio_state, hp.n_audio_head
    x = jax.random.normal(jax.random.PRNGKey(1), (TP, S), jnp.float32) * 0.1
    qkv_w, qkv_b = blk["qkv_w"], blk["qkv_b"]
    sep_w = [qkv_w[:, i * S:(i + 1) * S] + 0 for i in range(3)]
    sep_b = [qkv_b[i * S:(i + 1) * S] + 0 for i in range(3)]

    def attn_A(c):
        h = M.layer_norm(c, blk["attn_ln_w"], blk["attn_ln_b"], hp.eps)
        q = M._mm(h, sep_w[0], DT) + sep_b[0]
        k = M._mm(h, sep_w[1], DT)
        v = M._mm(h, sep_w[2], DT) + sep_b[2]
        qh, kh, vh = (M._split_heads(t, Hh) for t in (q, k, v))
        out = flash_self_attention(qh, kh, vh, true_len=TL)
        return c + M._mm(M._merge_heads(out), blk["o_w"], DT) + blk["o_b"]

    def attn_B(c):
        h = M.layer_norm(c, blk["attn_ln_w"], blk["attn_ln_b"], hp.eps)
        qkv = M._mm(h, qkv_w, DT) + qkv_b
        qh, kh, vh = (M._split_heads(qkv[..., i * S:(i + 1) * S], Hh)
                      for i in range(3))
        out = flash_self_attention(qh, kh, vh, true_len=TL)
        return c + M._mm(M._merge_heads(out), blk["o_w"], DT) + blk["o_b"]

    def kern_variant(bq, smdt):
        def attn(c):
            h = M.layer_norm(c, blk["attn_ln_w"], blk["attn_ln_b"], hp.eps)
            qkv = M._mm(h, qkv_w, DT) + qkv_b
            out = self_attention_qkv(qkv, Hh, true_len=TL, block_q=bq,
                                     softmax_dtype=smdt)
            return c + M._mm(out, blk["o_w"], DT) + blk["o_b"]
        return attn

    attn_C = kern_variant(768, jnp.float32)

    # numeric sanity vs A on real rows (both bf16)
    a = attn_A(x)[:TL]
    for nm, fn in (("C f32/768 ", attn_C),
                   ("D bf16/768", kern_variant(768, jnp.bfloat16))):
        c = fn(x)[:TL]
        err = float(jnp.max(jnp.abs(a - c)) / (jnp.max(jnp.abs(a)) + 1e-9))
        print(f"{nm} vs A max rel diff (real rows): {err:.2e}", flush=True)

    for name, fn in (("A sep+flash   ", attn_A), ("B fused+flash ", attn_B),
                     ("C kern f32/768", attn_C),
                     ("D kern b16/768", kern_variant(768, jnp.bfloat16)),
                     ("E kern b16/1536", kern_variant(1536, jnp.bfloat16)),
                     ("F kern f32/1536", kern_variant(1536, jnp.float32))):
        try:
            ms = per_op_ms(chain_of(fn), 16, 96, (x,))
            print(f"{name} {ms * 1000:8.0f} us/block", flush=True)
        except Exception as e:
            print(f"{name} FAILED: {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
