#!/usr/bin/env python
"""Real-graph encoder attribution: run the FULL 32-layer padded encode
with pieces of each block knocked out, so per-block costs are measured
in the production graph (32 distinct weight sets streaming from HBM,
real scheduling) instead of a one-block chain that caches its weights
in VMEM (tools/perf_enc_kernel.py measures ~120 us less per block than
the real encode shows).

Variants:
  full   — production block (fused qkv + enc_attn kernel + mlp)
  noattn — residual + mlp only (attention knocked out)
  nomlp  — attention only (mlp knocked out)
  nokern — qkv and o projections kept, kernel replaced by a lane slice
           (isolates the attention kernel's real-graph cost)
  nowt   — all four matmuls replaced by x*scalar (weight streaming gone;
           what's left is ln/gelu/elementwise + loop plumbing)
"""

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
from whisper_tpu.ops.enc_attn import self_attention_qkv
from whisper_tpu.utils.synth import synth_params

hp = H.LARGE_V3
DT = jnp.bfloat16
TP, TL = 1536, 1500



def make_block(variant):
    S, Hh = hp.n_audio_state, hp.n_audio_head

    def block(x, blk):
        h = M.layer_norm(x, blk["attn_ln_w"], blk["attn_ln_b"], hp.eps)
        if variant == "nowt":
            x = x + h * 1e-3
        elif variant == "noattn":
            pass
        else:
            qkv = M._mm(h, blk["qkv_w"], DT) + blk["qkv_b"]
            if variant == "nokern":
                merged = qkv[..., S:2 * S]
            else:
                merged = self_attention_qkv(qkv, Hh, true_len=TL,
                                            block_q=768)
            x = x + M._mm(merged, blk["o_w"], DT) + blk["o_b"]
        h = M.layer_norm(x, blk["mlp_ln_w"], blk["mlp_ln_b"], hp.eps)
        if variant in ("nomlp", "nowt"):
            return x + h * 1e-3
        h = M._gelu(M._mm(h, blk["mlp0_w"], DT) + blk["mlp0_b"])
        return x + M._mm(h, blk["mlp1_w"], DT) + blk["mlp1_b"]

    return block


def encode_variant(params, mel, variant):
    enc = params["enc"]
    x = M.conv_stem(enc, mel, DT)
    x = x + enc["pos_embd"][:x.shape[0]]
    x = jnp.pad(x, ((0, TP - x.shape[0]), (0, 0)))
    block = make_block(variant)
    L = enc["blocks"]["attn_ln_w"].shape[0]
    for l in range(L):
        x = block(x, jax.tree.map(lambda a: a[l], enc["blocks"]))
    x = x[:TL]
    return M.layer_norm(x, enc["ln_post_w"], enc["ln_post_b"], hp.eps)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    params = synth_params(hp, DT)
    mel = jax.random.normal(jax.random.PRNGKey(0),
                            (hp.n_mels, 2 * hp.n_audio_ctx), jnp.float32)

    for variant in ("full", "noattn", "nomlp", "nokern", "nowt"):
        @jax.jit
        def chain(K, params, mel, _v=variant):
            def body(i, m):
                e = encode_variant(params, m, _v)
                return m + (e.sum() * 1e-12).astype(m.dtype)
            return jax.lax.fori_loop(0, K, body, mel).sum()

        ms = per_op_ms(chain, 2, 8, (params, mel))
        print(f"{variant:7s} {ms:8.2f} ms/encode", flush=True)


if __name__ == "__main__":
    main()
