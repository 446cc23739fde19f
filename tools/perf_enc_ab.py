#!/usr/bin/env python
"""A/B: padded-resident encoder (auto, T=1536 stream) vs legacy unpadded
(forced via pad_to=n_ctx).  Chain-timed like bench.py.  Run alone on the
TPU — concurrent processes make the tunnel timings garbage."""

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


def _timed(fn, *args, reps=4):
    np.asarray(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def per_op_ms(chain, k1, k2, args):
    t1 = _timed(chain, jnp.int32(k1), *args)
    t2 = _timed(chain, jnp.int32(k2), *args)
    return max(0.0, (t2 - t1) / (k2 - k1)) * 1000


def enc_chain(pad_to):
    @jax.jit
    def chain(K, params, mel):
        def body(i, m):
            enc = M.encode(params, m, hp, dtype=DT, pad_to=pad_to)
            return m + (enc.sum() * 1e-12).astype(m.dtype)
        return jax.lax.fori_loop(0, K, body, mel).sum()
    return chain


def main():
    print(f"devices: {jax.devices()}", flush=True)
    params = synth_params(hp, DT)
    mel = jax.random.normal(jax.random.PRNGKey(0),
                            (hp.n_mels, 2 * hp.n_audio_ctx), jnp.float32)
    for label, pad_to in (("legacy unpadded", hp.n_audio_ctx),
                          ("padded-resident", None)):
        t0 = time.time()
        ms = per_op_ms(enc_chain(pad_to), 2, 6, (params, mel))
        print(f"{label}: {ms:7.2f} ms/encode   (compile+run {time.time()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
