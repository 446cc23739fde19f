#!/usr/bin/env python
"""Does the bucketed-context lax.switch actually pay in the serving loop?

bench.py r2 measured the W=16 q8-cache serving step at 13.4 ms through
decode_step_bucketed vs 10.1 ms through the plain full-context step a
few commits earlier — suspicion: each switch branch returns the updated
(L, W, H, 2, C, d) cache, and XLA cannot alias a conditional's results
in place, so every step pays a full ~0.6 GB cache copy at the branch
boundary.  This measures the same lockstep chain through:

  full     — decode_step, static full 448-cell context (no switch)
  switch   — decode_step_bucketed (lax.switch over 4 buckets)
  b128     — decode_step, static attn_ctx=128 (the early-step bound)

Chain K<=64 steps, so `switch` stays in the 128 bucket the whole time:
any gap between `switch` and `b128` is pure switch overhead.
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
from whisper_tpu.utils.synth import synth_params

hp = H.LARGE_V3
DT = jnp.bfloat16
W = 16



def main():
    print(f"devices: {jax.devices()}", flush=True)
    params = synth_params(hp, DT)
    d = hp.n_text_state // hp.n_text_head
    key = jax.random.PRNGKey(0)
    xk = jax.random.normal(key, (hp.n_text_layer, hp.n_text_head,
                                 hp.n_audio_ctx, d), DT)
    xv = xk * 0.5

    @jax.jit
    def quantize_cross(xk, xv):
        kq, ks = M._quantize_rows(xk)
        vq, vs = M._quantize_rows(xv)
        return M.XK8(kq, ks), M.XK8(vq, vs)

    xk8, xv8 = quantize_cross(xk, xv)
    xkb, xvb = jax.tree.map(
        lambda a: jnp.broadcast_to(a[:, None],
                                   (a.shape[0], W) + a.shape[1:]) + 0,
        (xk8, xv8))

    def make_chain(mode):
        @jax.jit
        def chain(K, params, xkb, xvb):
            def body(i, carry):
                cache, tok = carry
                pos = jnp.clip(i, 0, hp.n_text_ctx - 1) * jnp.ones(
                    (W, 1), jnp.int32)
                if mode == "switch":
                    logits, cache = M.decode_step_bucketed(
                        params, tok, pos, i, cache, xkb, xvb, hp, dtype=DT)
                elif mode == "b128":
                    logits, cache = M.decode_step(
                        params, tok, pos, i, cache, xkb, xvb, hp, dtype=DT,
                        attn_ctx=128)
                else:
                    logits, cache = M.decode_step(
                        params, tok, pos, i, cache, xkb, xvb, hp, dtype=DT)
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return cache, tok

            cache0 = M.new_cache(hp, W, DT, itype="q8")
            cache, tok = jax.lax.fori_loop(
                0, K, body, (cache0, jnp.zeros((W, 1), jnp.int32)))
            return tok.sum()
        return chain

    for mode in ("full", "switch", "b128"):
        ms = per_op_ms(make_chain(mode), 16, 64, (params, xkb, xvb))
        print(f"{mode:7s} {ms:7.2f} ms/step  ({ms / W:.3f} ms/tok/window)",
              flush=True)


if __name__ == "__main__":
    main()
