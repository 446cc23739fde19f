#!/usr/bin/env python
"""Generate a deterministic random-weight whisper model in legacy ggml format.

The vocab + mel filterbank are taken from one of the reference's header-only
"for-tests" files, so the result loads in both the reference binaries and
whisper_tpu — giving us a real-weights end-to-end oracle without network
access.  Weights are seeded-random but scaled to keep activations in a sane
range so greedy decoding is deterministic across backends.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from whisper_tpu.models.whisper.hparams import WhisperHParams
from whisper_tpu.models.whisper.load import _read_header, expected_tensor_names
from whisper_tpu.models.whisper.writer import write_model_file


def synth_tensors(hp: WhisperHParams, seed: int = 0):
    rng = np.random.default_rng(seed)
    ns, nm = hp.n_audio_state, hp.n_mels

    def w(*shape, std=None):
        std = std if std is not None else (1.0 / np.sqrt(shape[-1]))
        return (rng.standard_normal(shape) * std).astype(np.float32)

    tensors = {}

    def ln(prefix):
        tensors[prefix + ".weight"] = (1.0 + 0.02 * rng.standard_normal(ns)).astype(np.float32)
        tensors[prefix + ".bias"] = (0.02 * rng.standard_normal(ns)).astype(np.float32)

    tensors["encoder.positional_embedding"] = w(hp.n_audio_ctx, ns, std=0.02)
    tensors["encoder.conv1.weight"] = w(ns, nm, 3)
    tensors["encoder.conv1.bias"] = w(ns, 1, std=0.02)
    tensors["encoder.conv2.weight"] = w(ns, ns, 3)
    tensors["encoder.conv2.bias"] = w(ns, 1, std=0.02)
    ln("encoder.ln_post")
    for i in range(hp.n_audio_layer):
        p = f"encoder.blocks.{i}"
        ln(p + ".attn_ln")
        tensors[p + ".attn.query.weight"] = w(ns, ns)
        tensors[p + ".attn.query.bias"] = w(ns, std=0.02)
        tensors[p + ".attn.key.weight"] = w(ns, ns)
        tensors[p + ".attn.value.weight"] = w(ns, ns)
        tensors[p + ".attn.value.bias"] = w(ns, std=0.02)
        tensors[p + ".attn.out.weight"] = w(ns, ns)
        tensors[p + ".attn.out.bias"] = w(ns, std=0.02)
        ln(p + ".mlp_ln")
        tensors[p + ".mlp.0.weight"] = w(4 * ns, ns)
        tensors[p + ".mlp.0.bias"] = w(4 * ns, std=0.02)
        tensors[p + ".mlp.2.weight"] = w(ns, 4 * ns)
        tensors[p + ".mlp.2.bias"] = w(ns, std=0.02)

    nt = hp.n_text_state
    tensors["decoder.positional_embedding"] = w(hp.n_text_ctx, nt, std=0.02)
    tensors["decoder.token_embedding.weight"] = w(hp.n_vocab, nt, std=0.02)
    ln("decoder.ln")
    for i in range(hp.n_text_layer):
        p = f"decoder.blocks.{i}"
        ln(p + ".attn_ln")
        tensors[p + ".attn.query.weight"] = w(nt, nt)
        tensors[p + ".attn.query.bias"] = w(nt, std=0.02)
        tensors[p + ".attn.key.weight"] = w(nt, nt)
        tensors[p + ".attn.value.weight"] = w(nt, nt)
        tensors[p + ".attn.value.bias"] = w(nt, std=0.02)
        tensors[p + ".attn.out.weight"] = w(nt, nt)
        tensors[p + ".attn.out.bias"] = w(nt, std=0.02)
        ln(p + ".cross_attn_ln")
        tensors[p + ".cross_attn.query.weight"] = w(nt, nt)
        tensors[p + ".cross_attn.query.bias"] = w(nt, std=0.02)
        tensors[p + ".cross_attn.key.weight"] = w(nt, nt)
        tensors[p + ".cross_attn.value.weight"] = w(nt, nt)
        tensors[p + ".cross_attn.value.bias"] = w(nt, std=0.02)
        tensors[p + ".cross_attn.out.weight"] = w(nt, nt)
        tensors[p + ".cross_attn.out.bias"] = w(nt, std=0.02)
        ln(p + ".mlp_ln")
        tensors[p + ".mlp.0.weight"] = w(4 * nt, nt)
        tensors[p + ".mlp.0.bias"] = w(4 * nt, std=0.02)
        tensors[p + ".mlp.2.weight"] = w(nt, 4 * nt)
        tensors[p + ".mlp.2.bias"] = w(nt, std=0.02)

    # sanity: cover the full expected set
    expected = set(expected_tensor_names(hp))
    assert set(tensors) == expected, (
        sorted(expected - set(tensors))[:5], sorted(set(tensors) - expected)[:5])
    return tensors


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--header-from", required=True,
                    help="reference for-tests-ggml-*.bin supplying vocab+filters")
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-state", type=int, default=64)
    ap.add_argument("--n-head", type=int, default=2)
    ap.add_argument("--n-layer", type=int, default=2)
    ap.add_argument("--n-audio-ctx", type=int, default=1500)
    ap.add_argument("--n-text-ctx", type=int, default=448)
    ap.add_argument("--full-dims", action="store_true",
                    help="keep the header file's own dims (e.g. real tiny)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--f32", action="store_true")
    args = ap.parse_args()

    with open(args.header_from, "rb") as f:
        hp0, filters, vocab, n_vocab_read = _read_header(f)

    if args.full_dims:
        hp = hp0
    else:
        hp = WhisperHParams(
            n_vocab=hp0.n_vocab, n_audio_ctx=args.n_audio_ctx,
            n_audio_state=args.n_state, n_audio_head=args.n_head,
            n_audio_layer=args.n_layer, n_text_ctx=args.n_text_ctx,
            n_text_state=args.n_state, n_text_head=args.n_head,
            n_text_layer=args.n_layer, n_mels=hp0.n_mels,
        )

    tensors = synth_tensors(hp, args.seed)
    vocab_tokens = [vocab.id_to_token[i] for i in range(n_vocab_read)]
    write_model_file(args.out, hp, filters, vocab_tokens, tensors,
                     use_f16=not args.f32)
    print(f"wrote {args.out}: {hp.model_name} dims n_state={hp.n_audio_state} "
          f"layers={hp.n_audio_layer}/{hp.n_text_layer} vocab={hp.n_vocab}")


if __name__ == "__main__":
    main()
