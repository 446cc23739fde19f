"""whisper-bench equivalent (reference: examples/bench/bench.cpp,
whisper.h:756-759 whisper_bench_memcpy / whisper_bench_ggml_mul_mat).

  -w 0   full model bench (encoder / decode / batch / prompt) — bench.py
  -w 1   device memcpy bandwidth
  -w 2   matmul throughput at 4096^2 (bf16 dense + fused-dequant q4_0/q5_0/
         q8_0 through the Pallas qmm kernel)

Usage: python -m whisper_tpu.cli.bench_cli [-w N] [-m MODEL_NAME]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _timed_chain(make_chain, n1, n2, args=(), reps=3):
    import jax

    f1, f2 = jax.jit(make_chain(n1)), jax.jit(make_chain(n2))
    np.asarray(f1(*args))
    np.asarray(f2(*args))

    def t_of(f):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(f(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t_of(f2) - t_of(f1)) / (n2 - n1)


def bench_memcpy() -> int:
    """Device copy bandwidth (whisper_bench_memcpy analogue)."""
    import jax
    import jax.numpy as jnp

    n = 256 * 1024 * 1024 // 4  # 256 MB of f32
    x = jnp.zeros(n, jnp.float32)

    def mk(k):
        def f(x):
            acc = x
            for _ in range(k):
                # add a data-dependent scalar: XLA cannot fold the chain,
                # so each step reads + writes the whole buffer
                acc = acc + acc[-1]
            return acc[::65536].sum()
        return f

    dt = _timed_chain(mk, 8, 56, args=(x,), reps=5)
    bw = 2 * n * 4 / dt / 1e9
    print(f"memcpy: {bw:7.2f} GB/s (device read+write, 256 MB buffer)")
    return 0


def bench_mul_mat() -> int:
    """4096^2 matmul throughput per weight format
    (whisper_bench_ggml_mul_mat analogue)."""
    import jax
    import jax.numpy as jnp

    from ..ops.qmm import qmm

    N = 4096
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, N)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((N, N)), jnp.bfloat16)
    codes = jnp.asarray(rng.integers(-16, 16, (N, N)), jnp.int8)
    scales = jnp.asarray(rng.random((N, N // 32)), jnp.float32) * 0.02

    flops = 2 * N * N * N

    def mk_dense(k):
        def f(x, w):
            acc = x
            for _ in range(k):
                acc = jnp.matmul(acc, w, preferred_element_type=jnp.float32
                                 ).astype(jnp.bfloat16)
            return acc.astype(jnp.float32).sum()
        return f

    dt = _timed_chain(mk_dense, 4, 12, args=(x, w))
    print(f"mul_mat 4096x4096: bf16 {flops / dt / 1e12:7.2f} TFLOPS")

    if jax.default_backend() == "tpu":
        def mk_q(k):
            def f(x, codes, scales):
                acc = x.astype(jnp.float32)
                for _ in range(k):
                    acc = qmm(acc, codes, scales).astype(jnp.float32)
                return acc.sum()
            return f

        dt = _timed_chain(mk_q, 2, 6, args=(x, codes, scales))
        print(f"mul_mat 4096x4096: q5_0 fused dequant "
              f"{flops / dt / 1e12:7.2f} TFLOPS")
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="whisper-bench")
    ap.add_argument("-w", "--what", type=int, default=0,
                    help="0=full model, 1=memcpy, 2=mul_mat")
    ap.add_argument("-m", "--model", default="large-v3",
                    help="model size name for -w 0 (synthetic weights)")
    args = ap.parse_args(argv)

    from ..runtime.logging import print_system_info

    print(print_system_info(), file=sys.stderr)

    if args.what == 1:
        return bench_memcpy()
    if args.what == 2:
        return bench_mul_mat()

    import os
    os.environ["WTPU_BENCH_MODEL"] = args.model
    import pathlib
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
    import bench

    bench.main()
    return 0


if __name__ == "__main__":
    sys.exit(main())
