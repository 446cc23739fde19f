#!/usr/bin/env python
"""TDT decode-loop timing: per-frame while_loop vs chunked label-loop.

Chains K full-utterance decodes inside one jit (fake data dependency
through the emitted-count, RTT cancels — bench.py methodology) at
parakeet-tdt-0.6b dims on a 30 s utterance (375 post-subsample frames).

The chunked loop (decode._tdt_greedy_decode_chunked) pays ~1 while trip
per EMITTED token instead of per frame; emission density of the synthetic
weights sets the trip count, so the token count is printed too.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from _timing import per_op_ms

from whisper_tpu.models.parakeet import model as PM
from whisper_tpu.models.parakeet.decode import _tdt_greedy_decode
from whisper_tpu.models.parakeet.hparams import ParakeetHParams
from whisper_tpu.models.parakeet.load import build_param_pytree
from whisper_tpu.models.parakeet.writer import synth_parakeet_tensors

hp = ParakeetHParams()
DT = jnp.bfloat16


def main():
    print(f"devices: {jax.devices()}", flush=True)
    tensors = synth_parakeet_tensors(hp)
    params_np = build_param_pytree(tensors, hp)
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, DT), params_np)
    mel = jnp.asarray(np.random.default_rng(0).standard_normal(
        (3001, hp.n_mels)).astype(np.float32) * 0.3, DT)
    enc = jax.jit(lambda p, m: PM.encode(p, m, 3001, hp, dtype=DT))(
        params, mel)
    n_frames = (3001 + hp.subsampling_factor - 1) // hp.subsampling_factor
    h0 = jnp.zeros((hp.n_pred_layers, hp.n_pred_dim), DT)
    c0 = jnp.zeros_like(h0)

    chunks = [int(a) for a in sys.argv[1:]] or [1, 8, 16, 32]
    for chunk in chunks:
        @jax.jit
        def chain(K, params, enc, _c=chunk):
            def body(i, carry):
                e, acc = carry
                out = _tdt_greedy_decode(params, e, jnp.int32(n_frames),
                                         h0, c0, hp, 512, DT, chunk=_c)
                n_out = out[6]
                return e + (n_out.astype(DT) * 1e-12), acc + n_out
            e, acc = jax.lax.fori_loop(0, K, body,
                                       (enc, jnp.int32(0)))
            return acc + (e.sum() * 0).astype(jnp.int32)

        n_tok = int(np.asarray(chain(jnp.int32(1), params, enc)))
        ms = per_op_ms(chain, 1, 3, (params, enc))
        print(f"chunk={chunk:3d}  {ms:7.2f} ms/decode  ({n_tok} tokens)",
              flush=True)


if __name__ == "__main__":
    main()
