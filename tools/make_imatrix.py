#!/usr/bin/env python
"""Generate an importance matrix (imatrix) for IQ1/IQ2/IQ3 quantization.

The activation-capture analogue of llama.cpp's imatrix example: runs the
whisper forward pass EAGERLY over calibration audio with every matmul
weight wrapped in a capture shim (model.CapturedWeight) that accumulates
per-input-channel sums of squared activations, then writes the llama.cpp
legacy imatrix binary (formats/imatrix.py) keyed by the FILE tensor names,
ready for `whisper-quantize --imatrix out.imatrix model.bin out.bin iq2_s`.

Usage:
  python tools/make_imatrix.py -m model.bin -f calib1.wav [calib2.wav ...] \
      -o model.imatrix [--steps 32]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build_captured_params(model, collector):
    """Dense f32 param pytree with every quantizable matmul weight wrapped.

    The fused q/k/v projections share one input activation, so their three
    file tensor names record the same statistics — exactly what a
    per-tensor capture of the unfused reference graph would produce."""
    import jax.numpy as jnp
    import numpy as np
    import jax

    from whisper_tpu.models.whisper.model import CapturedWeight

    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), model.params)
    hp = model.hparams

    def wrap(part, key, fmt, fnames, n_layer):
        names = [[fmt % (i,) + "." + f for f in fnames] for i in range(n_layer)]
        part[key] = CapturedWeight(names, part[key], collector)

    enc = params["enc"]["blocks"]
    for key, fnames in {
        "qkv_w": ("attn.query.weight", "attn.key.weight", "attn.value.weight"),
        "o_w": ("attn.out.weight",),
        "mlp0_w": ("mlp.0.weight",),
        "mlp1_w": ("mlp.2.weight",),
    }.items():
        wrap(enc, key, "encoder.blocks.%d", fnames, hp.n_audio_layer)

    dec = params["dec"]["blocks"]
    for key, fnames in {
        "qkv_w": ("attn.query.weight", "attn.key.weight", "attn.value.weight"),
        "o_w": ("attn.out.weight",),
        "xq_w": ("cross_attn.query.weight",),
        "xk_w": ("cross_attn.key.weight",),
        "xv_w": ("cross_attn.value.weight",),
        "xo_w": ("cross_attn.out.weight",),
        "mlp0_w": ("mlp.0.weight",),
        "mlp1_w": ("mlp.2.weight",),
    }.items():
        wrap(dec, key, "decoder.blocks.%d", fnames, hp.n_text_layer)

    params["dec"]["tok_embd"] = CapturedWeight(
        ["decoder.token_embedding.weight"], params["dec"]["tok_embd"],
        collector)
    return params


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--files", nargs="+", required=True,
                    help="calibration audio files (wav)")
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("--steps", type=int, default=32,
                    help="greedy decode steps captured per window")
    args = ap.parse_args()

    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except RuntimeError:
        pass
    import jax.numpy as jnp
    import numpy as np

    from whisper_tpu.audio.io import load_audio
    from whisper_tpu.audio.mel import LogMel
    from whisper_tpu.formats.imatrix import Collector, save_imatrix
    from whisper_tpu.models.whisper import model as M
    from whisper_tpu.models.whisper.load import load_model

    model = load_model(args.model)
    hp = model.hparams
    collector = Collector()
    params = build_captured_params(model, collector)
    mel_fn = LogMel(model.filters.data)

    for path in args.files:
        pcm, _ = load_audio(path)
        mel, n_len = mel_fn(pcm)
        n_windows = max(1, (n_len + 2 * hp.n_audio_ctx - 1)
                        // (2 * hp.n_audio_ctx))
        for w in range(n_windows):
            seek = w * 2 * hp.n_audio_ctx
            window = np.zeros((hp.n_mels, 2 * hp.n_audio_ctx), np.float32)
            i1 = min(seek + 2 * hp.n_audio_ctx, mel.shape[1])
            if i1 > seek:
                window[:, : i1 - seek] = mel[:, seek:i1]
            # eager forward — the capture shim is a host side effect
            enc = M.encode(params, jnp.asarray(window), hp,
                           dtype=jnp.float32)
            xk, xv = M.compute_cross_kv(params, enc, hp, dtype=jnp.float32)
            cache = M.new_cache(hp, 1, jnp.float32)
            tok = model.vocab.token_sot
            for step in range(args.steps):
                logits, cache = M.decode_step(
                    params, jnp.asarray([[tok]], jnp.int32),
                    jnp.asarray([[step]], jnp.int32), jnp.int32(step),
                    cache, xk, xv, hp, dtype=jnp.float32)
                tok = int(jnp.argmax(logits[0, -1]))
                if tok == model.vocab.token_eot:
                    break
            print(f"{path}: window {w + 1}/{n_windows} captured", flush=True)

    save_imatrix(args.output, collector.sums, collector.ncalls,
                 input_desc=" ".join(args.files))
    print(f"wrote {args.output}: {len(collector.sums)} tensors")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
