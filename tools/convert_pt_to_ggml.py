#!/usr/bin/env python
"""Convert an OpenAI whisper .pt checkpoint to the legacy ggml format.

Mirror of models/convert-pt-to-ggml.py (reference): magic, 11 i32 hparams,
mel filterbank, vocab, tensor records.  OpenAI state-dict names are already
the ggml tensor names; tensors are squeezed, conv biases reshaped to (n, 1),
2-D+ tensors stored f16 (except positional embeddings + conv biases).

Mel filters / vocab come from either:
  --whisper-repo PATH   openai/whisper checkout (assets/mel_filters.npz and
                        assets/*.tiktoken), like the reference converter, or
  --header-from FILE    an existing legacy ggml file to copy them from
                        (works fully offline).
"""

from __future__ import annotations

import argparse
import base64
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from whisper_tpu.formats import container, quants
from whisper_tpu.models.whisper.hparams import WhisperHParams
from whisper_tpu.models.whisper.load import MelFilters, _read_header
from whisper_tpu.models.whisper.writer import (tensor_storage_type,
                                               write_header)


def bytes_to_unicode():
    """GPT-2 byte<->unicode table (models/convert-pt-to-ggml.py:176-190)."""
    bs = (list(range(ord("!"), ord("~") + 1)) +
          list(range(ord("\xa1"), ord("\xac") + 1)) +
          list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(2 ** 8):
        if b not in bs:
            bs.append(b)
            cs.append(2 ** 8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def load_assets_from_repo(repo: Path, n_mels: int, multilingual: bool):
    with np.load(repo / "whisper" / "assets" / "mel_filters.npz") as f:
        filters = np.asarray(f[f"mel_{n_mels}"], np.float32)
    name = "multilingual" if multilingual else "gpt2"
    tk = repo / "whisper" / "assets" / f"{name}.tiktoken"
    if tk.is_file():
        tokens = {}
        for line in tk.read_bytes().splitlines():
            if line:
                tok, rank = line.split()
                tokens[int(rank)] = base64.b64decode(tok)
    else:
        import json

        byte_decoder = {v: k for k, v in bytes_to_unicode().items()}
        vocab = json.loads((repo / "whisper" / "assets" / name /
                            "vocab.json").read_text(encoding="utf8"))
        vocab.pop("<|endoftext|>", None)
        tokens = {int(i): bytes(byte_decoder[c] for c in t)
                  for t, i in vocab.items()}
    return filters, [tokens[i] for i in sorted(tokens)]


def load_assets_from_header(path: Path):
    with open(path, "rb") as f:
        hp, filters, vocab, _ = _read_header(f)
    toks = [vocab.token_str(i).encode("utf-8", errors="replace")
            for i in range(min(hp.n_vocab, len(vocab.id_to_token)))]
    return np.asarray(filters.data, np.float32).reshape(
        filters.n_mel, filters.n_fft), toks, hp


def convert(checkpoint: dict, filters: np.ndarray, vocab_tokens, out: str,
            use_f16: bool = True) -> int:
    dims = checkpoint["dims"]
    hp = WhisperHParams(
        n_vocab=dims["n_vocab"], n_audio_ctx=dims["n_audio_ctx"],
        n_audio_state=dims["n_audio_state"], n_audio_head=dims["n_audio_head"],
        n_audio_layer=dims["n_audio_layer"], n_text_ctx=dims["n_text_ctx"],
        n_text_state=dims["n_text_state"], n_text_head=dims["n_text_head"],
        n_text_layer=dims["n_text_layer"], n_mels=dims["n_mels"])
    mf = MelFilters(filters.shape[0], filters.shape[1],
                    np.ascontiguousarray(filters, np.float32))
    n = 0
    with open(out, "wb") as f:
        write_header(f, hp, mf, vocab_tokens,
                     1 if use_f16 else 0, qnt_version=0)
        for name, tensor in checkpoint["model_state_dict"].items():
            data = np.asarray(tensor, np.float32).squeeze()
            if name in ("encoder.conv1.bias", "encoder.conv2.bias"):
                data = data.reshape(data.shape[0], 1)
            st = tensor_storage_type(name, data.ndim, use_f16)
            container.write_tensor_record(f, name, data, st)
            n += 1
    return n


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("model_pt")
    ap.add_argument("out")
    ap.add_argument("--whisper-repo", default=None)
    ap.add_argument("--header-from", default=None)
    ap.add_argument("--use-f32", action="store_true")
    args = ap.parse_args(argv)

    import torch

    checkpoint = torch.load(args.model_pt, map_location="cpu",
                            weights_only=False)
    sd = checkpoint["model_state_dict"]
    checkpoint["model_state_dict"] = {
        k: v.to(torch.float32).numpy() for k, v in sd.items()}

    dims = checkpoint["dims"]
    if args.whisper_repo:
        filters, toks = load_assets_from_repo(
            Path(args.whisper_repo), dims["n_mels"],
            dims["n_vocab"] >= 51865)
    elif args.header_from:
        filters, toks, _ = load_assets_from_header(Path(args.header_from))
    else:
        print("error: need --whisper-repo or --header-from for mel filters "
              "and vocab", file=sys.stderr)
        return 2

    n = convert(checkpoint, filters, toks, args.out,
                use_f16=not args.use_f32)
    print(f"wrote {n} tensors to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
