#!/usr/bin/env python
"""Multi-chip decode scaling-efficiency harness.

Measures batched-serving decode throughput (tokens/s) across (dp, tp) mesh
configurations and reports scaling efficiency vs the single-device run —
the number BASELINE.md's ">=80% scaling at N chips" north star asks for
(role of scripts/bench-all-gg.txt's multi-GPU rows).

On a real TPU pod this produces meaningful throughput; on a development
machine run it against virtual devices to validate that every configuration
compiles, shards and executes:

  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \\
      python tools/scaling_bench.py --model tiny --configs 1x1,2x1,4x1,2x2

Output: one JSON line per config {devices, dp, tp, tok_s, efficiency}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from whisper_tpu.models.whisper import hparams as H
from whisper_tpu.models.whisper import model as M
from whisper_tpu.parallel.mesh import make_mesh
from whisper_tpu.parallel.sharding import shard_params
from whisper_tpu.utils.synth import synth_params

DIMS = {"tiny": H.TINY, "base": H.BASE, "small": H.SMALL,
        "medium": H.MEDIUM, "large-v3": H.LARGE_V3}


def bench_config(hp, params_host, n_dp: int, n_tp: int, n_windows: int,
                 n_steps: int, dtype) -> float:
    """tokens/s of the W-per-dp-shard batched decode loop on a (dp, tp)
    mesh; W windows ride the beam axis per shard (the serving layout)."""
    mesh = make_mesh(n_dp, n_tp, devices=jax.devices()[: n_dp * n_tp])
    params = shard_params(params_host, mesh, hp)
    W = n_dp * n_windows

    Tc = hp.n_audio_ctx
    d = hp.n_text_state // hp.n_text_head
    key = jax.random.PRNGKey(0)
    xk_host = jax.random.normal(
        key, (hp.n_text_layer, W, hp.n_text_head, Tc, d), dtype)
    xv_host = xk_host * 0.5
    kv_sh = NamedSharding(mesh, P(None, "dp", "tp", None, None))
    xk = jax.device_put(xk_host, kv_sh)
    xv = jax.device_put(xv_host, kv_sh)

    @jax.jit
    def chain(K, params, xk, xv):
        def body(i, carry):
            cache, tok = carry
            pos = jnp.clip(i, 0, hp.n_text_ctx - 1) * jnp.ones((W, 1),
                                                               jnp.int32)
            logits, cache = M.decode_step(params, tok, pos, i, cache, xk,
                                          xv, hp, dtype=dtype)
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return cache, tok

        cache0 = M.new_cache(hp, W, dtype)
        cache, tok = jax.lax.fori_loop(
            0, K, body, (cache0, jnp.zeros((W, 1), jnp.int32)))
        return tok.sum()

    def run(K):
        with mesh:
            t0 = time.perf_counter()
            np.asarray(chain(jnp.int32(K), params, xk, xv))
            return time.perf_counter() - t0

    run(4)  # compile
    k1, k2 = n_steps // 4, n_steps
    t1 = min(run(k1) for _ in range(2))
    t2 = min(run(k2) for _ in range(2))
    per_step = max(1e-9, (t2 - t1) / (k2 - k1))
    return W / per_step


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny", choices=sorted(DIMS))
    ap.add_argument("--configs", default="1x1,2x1,4x1,8x1,4x2,2x4",
                    help="comma-separated DPxTP list")
    ap.add_argument("--windows", type=int, default=4,
                    help="serving windows per dp shard")
    ap.add_argument("--steps", type=int, default=32)
    args = ap.parse_args()

    # honor JAX_PLATFORMS=cpu for virtual-device runs (the axon
    # sitecustomize force-registers the TPU plugin and overrides the env
    # var; config.update after import wins)
    import os

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    hp = DIMS[args.model]
    n_dev = len(jax.devices())
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    params_host = synth_params(hp, dtype)

    base_tok_s = None
    for spec in args.configs.split(","):
        n_dp, n_tp = (int(v) for v in spec.strip().split("x"))
        if n_dp * n_tp > n_dev:
            print(json.dumps({"config": spec, "skipped":
                              f"needs {n_dp*n_tp} devices, have {n_dev}"}))
            continue
        if hp.n_text_head % n_tp:
            print(json.dumps({"config": spec, "skipped":
                              f"tp={n_tp} does not divide "
                              f"{hp.n_text_head} heads"}))
            continue
        tok_s = bench_config(hp, params_host, n_dp, n_tp, args.windows,
                             args.steps, dtype)
        if base_tok_s is None:
            base_tok_s = tok_s
        n = n_dp * n_tp
        eff = tok_s / (base_tok_s * n)
        print(json.dumps({
            "config": spec, "devices": n, "dp": n_dp, "tp": n_tp,
            "model": args.model, "windows_total": n_dp * args.windows,
            "tok_s": round(tok_s, 1),
            "efficiency_vs_linear": round(eff, 3)}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
