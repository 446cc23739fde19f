#!/usr/bin/env python
"""HLO collective audit of the TP-sharded decode step (VERDICT r2 item 7).

Counts the collectives GSPMD inserts into the compiled decode step under
tp in {2,4,8} and sizes them in bytes, attributing per layer — the data
behind the fused-QKV sharding decision (parallel/sharding.py forces
qkv_w row-parallel, which costs one allreduce the reference's segmented
column-parallel fused split avoids, ggml-backend.h:369-401).

Runs on virtual CPU devices:
  python tools/collective_audit.py [--layers 4] [--state 1024] [--heads 16]
"""

import argparse
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--state", type=int, default=1024)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--beams", type=int, default=8)
    ap.add_argument("--tp", type=int, nargs="+", default=[2, 4, 8])
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count="
                                 f"{max(args.tp)}")
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from whisper_tpu.models.whisper import model as M
    from whisper_tpu.models.whisper.hparams import WhisperHParams
    from whisper_tpu.parallel.mesh import make_mesh
    from whisper_tpu.parallel.sharding import shard_params
    from whisper_tpu.utils.synth import synth_params

    hp = WhisperHParams(
        n_vocab=51864, n_audio_ctx=1500, n_audio_state=args.state,
        n_audio_head=args.heads, n_audio_layer=1, n_text_ctx=448,
        n_text_state=args.state, n_text_head=args.heads,
        n_text_layer=args.layers, n_mels=80)

    params_host = synth_params(hp, jnp.float32)
    d_head = args.state // args.heads

    DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                   "pred": 1, "s8": 1, "u8": 1}

    def audit(n_tp):
        mesh = make_mesh(1, n_tp, devices=jax.devices()[:n_tp])
        params = shard_params(params_host, mesh, hp)
        B = args.beams
        xk = jax.device_put(
            jnp.zeros((hp.n_text_layer, hp.n_text_head, hp.n_audio_ctx,
                       d_head), jnp.float32),
            NamedSharding(mesh, P(None, "tp", None, None)))
        xv = jax.device_put(jnp.zeros_like(xk),
                            NamedSharding(mesh, P(None, "tp", None, None)))
        cache = M.KVCache(jax.device_put(
            jnp.zeros((hp.n_text_layer, B, hp.n_text_head, 2, hp.n_text_ctx,
                       d_head), jnp.float32),
            NamedSharding(mesh, P(None, None, "tp", None, None, None))))
        toks = jnp.zeros((B, 1), jnp.int32)
        pos = jnp.zeros((B, 1), jnp.int32)

        def step(params, toks, pos, cache, xk, xv):
            logits, cache = M.decode_step(params, toks, pos, jnp.int32(0),
                                          cache, xk, xv, hp,
                                          dtype=jnp.float32)
            return logits, cache

        with mesh:
            compiled = jax.jit(step).lower(params, toks, pos, cache, xk,
                                           xv).compile()
        hlo = compiled.as_text()

        counts = {}
        by_shape = {}
        bytes_total = 0
        for m in re.finditer(r"= ([a-z0-9]+)\[([\d,]*)\][^ ]* "
                             r"(all-reduce|all-gather|reduce-scatter|"
                             r"collective-permute|all-to-all)(?:-start)?\(",
                             hlo):
            dt, dims_s, op = m.group(1), m.group(2), m.group(3)
            dims = [int(x) for x in dims_s.split(",") if x]
            n = int(np.prod(dims)) if dims else 1
            nb = n * DTYPE_BYTES.get(dt, 4)
            counts[op] = counts.get(op, 0) + 1
            key = (op, f"{dt}[{dims_s}]")
            by_shape[key] = (by_shape.get(key, (0, 0))[0] + 1, nb)
            bytes_total += nb
        return counts, bytes_total, by_shape

    print(f"decode step: {args.layers} layers, S={args.state}, "
          f"H={args.heads}, B={args.beams}, 1 token")
    print("| tp | collectives (total) | per layer | bytes/step |")
    print("|---|---|---|---|")
    for n_tp in args.tp:
        counts, nbytes, by_shape = audit(n_tp)
        total = sum(counts.values())
        desc = " + ".join(f"{v} {k}" for k, v in sorted(counts.items()))
        print(f"| {n_tp} | {desc} | {total / args.layers:.2f} | "
              f"{nbytes / 1024:.1f} KiB |", flush=True)
        for (op, shape), (cnt, nb) in sorted(by_shape.items(),
                                             key=lambda kv: -kv[1][0] * kv[1][1]):
            print(f"    {op:20s} {shape:24s} x{cnt:<4d} {nb} B each",
                  flush=True)


if __name__ == "__main__":
    main()
