#!/usr/bin/env python
"""Convert a HuggingFace transformers WhisperForConditionalGeneration model
to the legacy ggml format (mirror of models/convert-h5-to-ggml.py).

HF parameter names are renamed to whisper names via the same table the
reference uses; `proj_out.weight` is skipped (tied to the token embedding).
Assets (mel filters + vocab) come from --header-from (donor ggml file) or
the HF tokenizer (--tokenizer, needs local tokenizer files).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from convert_pt_to_ggml import (bytes_to_unicode, convert,
                                load_assets_from_header)

# models/convert-h5-to-ggml.py:30-52
CONV_MAP = {
    "self_attn.k_proj": "attn.key",
    "self_attn.q_proj": "attn.query",
    "self_attn.v_proj": "attn.value",
    "self_attn.out_proj": "attn.out",
    "self_attn_layer_norm": "attn_ln",
    "encoder_attn.q_proj": "cross_attn.query",
    "encoder_attn.v_proj": "cross_attn.value",
    "encoder_attn.out_proj": "cross_attn.out",
    "encoder_attn_layer_norm": "cross_attn_ln",
    "fc1": "mlp.0",
    "fc2": "mlp.2",
    "final_layer_norm": "mlp_ln",
    "encoder.layer_norm.bias": "encoder.ln_post.bias",
    "encoder.layer_norm.weight": "encoder.ln_post.weight",
    "encoder.embed_positions.weight": "encoder.positional_embedding",
    "decoder.layer_norm.bias": "decoder.ln.bias",
    "decoder.layer_norm.weight": "decoder.ln.weight",
    "decoder.embed_positions.weight": "decoder.positional_embedding",
    "decoder.embed_tokens.weight": "decoder.token_embedding.weight",
    "proj_out.weight": "decoder.proj.weight",
}


def map_name(name: str):
    """HF name -> ggml name (models/convert-h5-to-ggml.py:149-176)."""
    if name == "proj_out.weight":
        return None  # tied to token embedding, unused by the runtime
    nn = name.split(".")[1:]  # strip 'model.'
    if len(nn) > 1 and nn[1] == "layers":
        nn[1] = "blocks"
        inner = ".".join(nn[3:-1])
        if inner == "encoder_attn.k_proj":
            mapped = "attn.key" if nn[0] == "encoder" else "cross_attn.key"
        else:
            mapped = CONV_MAP[inner]
        return ".".join(nn[:3] + [mapped] + nn[-1:])
    name = ".".join(nn)
    return CONV_MAP.get(name, name)


def state_dict_to_ggml(model) -> dict:
    out = {}
    for src, tensor in model.state_dict().items():
        dst = map_name(src)
        if dst is None:
            continue
        out[dst] = tensor.to("cpu").float().numpy()
    return out


def hf_dims(config) -> dict:
    return {
        "n_vocab": config.vocab_size,
        "n_audio_ctx": config.max_source_positions,
        "n_audio_state": config.d_model,
        "n_audio_head": config.encoder_attention_heads,
        "n_audio_layer": config.encoder_layers,
        "n_text_ctx": config.max_target_positions,
        "n_text_state": config.d_model,
        "n_text_head": config.decoder_attention_heads,
        "n_text_layer": config.decoder_layers,
        "n_mels": config.num_mel_bins,
    }


def vocab_from_tokenizer(tokenizer):
    byte_decoder = {v: k for k, v in bytes_to_unicode().items()}
    vocab = tokenizer.get_vocab()
    vocab.pop("<|endoftext|>", None)
    toks = {int(i): bytes(byte_decoder[c] for c in t)
            for t, i in vocab.items()}
    return [toks[i] for i in sorted(toks)]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("model_dir", help="HF model directory or hub id")
    ap.add_argument("out")
    ap.add_argument("--header-from", required=True,
                    help="donor legacy ggml file supplying mel filters + vocab")
    ap.add_argument("--use-f32", action="store_true")
    args = ap.parse_args(argv)

    from transformers import WhisperForConditionalGeneration

    model = WhisperForConditionalGeneration.from_pretrained(args.model_dir)
    checkpoint = {"dims": hf_dims(model.config),
                  "model_state_dict": state_dict_to_ggml(model)}

    filters, toks, _ = load_assets_from_header(Path(args.header_from))

    n = convert(checkpoint, filters, toks, args.out, use_f16=not args.use_f32)
    print(f"wrote {n} tensors to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
