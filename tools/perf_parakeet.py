#!/usr/bin/env python
"""Real-graph Parakeet encoder attribution (VERDICT r3 weak #1).

Runs the FULL 24-layer conformer encode at parakeet-tdt-0.6b dims on a
30 s utterance (mel 3001x128 -> T=376 post-subsample) with pieces knocked
out, so per-piece costs are measured in the production graph — same
methodology as tools/perf_enc_real.py (chain timing, RTT cancels).

Variants:
  full     — production encode (models/parakeet/model.encode)
  nopre    — conv-subsampling stem skipped (random (T,S) fed directly)
  preonly  — stem only, conformer stack skipped
  noattn   — rel-pos MHA knocked out of every block
  noshift  — MHA kept, Transformer-XL take_along_axis shift replaced by a
             static slice (isolates the gather)
  nopos    — MHA without the pos projection + shift (content scores only)
  noconv   — conv module knocked out
  nodw     — conv module kept, depthwise 9-tap conv replaced by identity
  noffn    — both macaron FFN halves knocked out
  nowt     — every matmul replaced by x*1e-3 (weight streaming gone)
  unroll   — full block, python-unrolled layer loop instead of lax.scan
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from _timing import per_op_ms

from whisper_tpu.models.parakeet import model as PM
from whisper_tpu.models.parakeet.hparams import ParakeetHParams
from whisper_tpu.models.parakeet.load import build_param_pytree
from whisper_tpu.models.parakeet.writer import synth_parakeet_tensors

hp = ParakeetHParams()
DT = jnp.bfloat16
N_MEL_T = 3001  # 30 s at 10 ms hop


def _attention_variant(x, layer, n_head, mask_1d, dtype, variant):
    import math
    T, S = x.shape
    d_head = S // n_head
    scale = 1.0 / math.sqrt(d_head)

    q = PM._pmm(x, layer["attn_q_w"], dtype).reshape(T, n_head, d_head)
    k = PM._pmm(x, layer["attn_k_w"], dtype).reshape(T, n_head, d_head)
    v = PM._pmm(x, layer["attn_v_w"], dtype).reshape(T, n_head, d_head)

    q_u = q + layer["pos_bias_u"].astype(dtype)[None]
    content = jnp.einsum("qhd,khd->hqk", q_u, k)

    if variant == "nopos":
        scores = content * scale + mask_1d[None, None, :]
    else:
        window = 2 * T - 1
        pos_emb = PM._pos_embedding(window, T - 1, S, dtype)
        pos = PM._pmm(pos_emb, layer["attn_pos_w"], dtype)
        pos = pos.reshape(window, n_head, d_head)
        q_v = q + layer["pos_bias_v"].astype(dtype)[None]
        rel = jnp.einsum("qhd,whd->hqw", q_v, pos)
        if variant == "noshift":
            rel_shifted = rel[:, :, :T]
        else:
            idx = (T - 1) - jnp.arange(T)[:, None] + jnp.arange(T)[None, :]
            rel_shifted = jnp.take_along_axis(
                rel, jnp.broadcast_to(idx[None], (n_head, T, T)), axis=2)
        scores = (content + rel_shifted) * scale + mask_1d[None, None, :]

    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("hqk,khd->qhd", probs, v).reshape(T, S)
    return PM._pmm(out, layer["attn_out_w"], dtype)


def _conv_module_variant(x, layer, dtype, variant):
    T, S = x.shape
    cur = PM._ln(x, layer["norm_conv_w"].astype(dtype),
                 layer["norm_conv_b"].astype(dtype), hp.eps)
    cur = PM._pmm(cur, layer["conv_pw1_w"], dtype)
    signal, gate = cur[:, :S], cur[:, S:]
    cur = signal * jax.nn.sigmoid(gate)
    if variant != "nodw":
        pad = (hp.n_conv_kernel - 1) // 2
        padded = jnp.pad(cur, ((pad, pad), (0, 0)))
        kk = layer["conv_dw_w"].astype(dtype)
        cur = sum(padded[j:j + T, :] * kk[:, j][None, :]
                  for j in range(hp.n_conv_kernel))
    cur = (cur - layer["conv_bn_mean"].astype(dtype)) / jnp.sqrt(
        layer["conv_bn_var"].astype(dtype))
    cur = cur * layer["conv_bn_w"].astype(dtype) + layer["conv_bn_b"].astype(dtype)
    cur = PM._silu(cur)
    return PM._pmm(cur, layer["conv_pw2_w"], dtype)


def _block_variant(x, layer, mask_1d, variant):
    if variant == "nowt":
        h = PM._ln(x, layer["norm_ff1_w"].astype(DT),
                   layer["norm_ff1_b"].astype(DT), hp.eps)
        return x + h * 1e-3
    fc = 0.5
    if variant != "noffn":
        x = x + fc * PM._ffn(x, layer["norm_ff1_w"], layer["norm_ff1_b"],
                             layer["ff1_lin1_w"], layer["ff1_lin2_w"],
                             hp.eps, DT)
    if variant != "noattn":
        cur = PM._ln(x, layer["norm_attn_w"].astype(DT),
                     layer["norm_attn_b"].astype(DT), hp.eps)
        if variant in ("noshift", "nopos"):
            attn = _attention_variant(cur, layer, hp.n_audio_head, mask_1d,
                                      DT, variant)
        else:
            attn = PM._rel_attention_global(cur, layer, hp.n_audio_head,
                                            mask_1d, DT)
        x = x + attn
    if variant == "noconv":
        pass
    elif variant == "nodw":
        x = x + _conv_module_variant(x, layer, DT, "nodw")
    else:
        x = x + PM._conv_module(x, layer, hp, DT)
    if variant != "noffn":
        x = x + fc * PM._ffn(x, layer["norm_ff2_w"], layer["norm_ff2_b"],
                             layer["ff2_lin1_w"], layer["ff2_lin2_w"],
                             hp.eps, DT)
    return PM._ln(x, layer["norm_out_w"].astype(DT),
                  layer["norm_out_b"].astype(DT), hp.eps)


def encode_variant(params, mel, variant):
    if variant == "nopre":
        T = (N_MEL_T + 1) // 2
        T = (T + 1) // 2
        T = (T + 1) // 2
        x = jnp.broadcast_to(mel[:T, :1], (T, hp.n_audio_state)).astype(DT) \
            * 1e-2
        x = x + jnp.arange(hp.n_audio_state, dtype=DT)[None, :] * 1e-4
    else:
        x = PM.pre_encode(params["pre"], mel, hp, DT)
    if variant == "preonly":
        return x
    T = x.shape[0]
    n_real = (N_MEL_T + hp.subsampling_factor - 1) // hp.subsampling_factor
    mask_1d = jnp.where(jnp.arange(T) < n_real, 0.0, PM.MASK_VALUE).astype(DT)

    if variant == "unroll":
        L = params["layers"]["norm_ff1_w"].shape[0]
        for l in range(L):
            x = _block_variant(
                x, jax.tree.map(lambda a: a[l], params["layers"]),
                mask_1d, "full")
        return x

    def body(carry, layer):
        return _block_variant(carry, layer, mask_1d, variant), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return x


def main():
    print(f"devices: {jax.devices()}", flush=True)
    tensors = synth_parakeet_tensors(hp)
    params_np = build_param_pytree(tensors, hp)
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, DT), params_np)
    mel = jnp.asarray(np.random.default_rng(0).standard_normal(
        (N_MEL_T, hp.n_mels)).astype(np.float32) * 0.3, DT)

    variants = sys.argv[1:] or ("full", "nopre", "preonly", "noattn",
                                "noshift", "nopos", "noconv", "nodw",
                                "noffn", "nowt", "unroll")
    for variant in variants:
        @jax.jit
        def chain(K, params, mel, _v=variant):
            def body(i, m):
                e = encode_variant(params, m, _v)
                return m + (e.sum() * 1e-12).astype(m.dtype)
            return jax.lax.fori_loop(0, K, body, mel).sum()

        ms = per_op_ms(chain, 1, 3, (params, mel))
        print(f"{variant:8s} {ms:8.2f} ms/encode", flush=True)


if __name__ == "__main__":
    main()
