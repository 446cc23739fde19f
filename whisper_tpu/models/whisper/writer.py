"""Write legacy ggml whisper model files.

Mirror of the converter's output format (models/convert-pt-to-ggml.py:268-333):
magic, 11×i32 hparams, filterbank, vocab, tensor records.  Used by the
synthetic-fixture generator, the HF/OpenAI converters and the quantize tool.
"""

from __future__ import annotations

from typing import BinaryIO, Dict, Iterable, Optional, Tuple

import numpy as np

from ...formats import container, quants
from .hparams import WhisperHParams
from .load import MelFilters

# tensors kept in f32 even in f16/quantized files
# (models/convert-pt-to-ggml.py:305-317; examples/quantize/quantize.cpp:161-168)
F32_ALWAYS = {
    "encoder.conv1.bias",
    "encoder.conv2.bias",
    "encoder.positional_embedding",
    "decoder.positional_embedding",
}
# quantize skip-list: conv biases + positional embeddings stay as stored
QUANTIZE_SKIP = F32_ALWAYS


def write_header(
    f: BinaryIO,
    hp: WhisperHParams,
    filters: MelFilters,
    vocab_tokens: Iterable[bytes],
    ftype: int,
    qnt_version: int = quants.GGML_QNT_VERSION,
) -> None:
    container.write_i32(f, container.GGML_FILE_MAGIC)
    for v in (hp.n_vocab, hp.n_audio_ctx, hp.n_audio_state, hp.n_audio_head,
              hp.n_audio_layer, hp.n_text_ctx, hp.n_text_state, hp.n_text_head,
              hp.n_text_layer, hp.n_mels):
        container.write_i32(f, v)
    container.write_i32(f, ftype + qnt_version * quants.GGML_QNT_VERSION_FACTOR)

    container.write_i32(f, filters.n_mel)
    container.write_i32(f, filters.n_fft)
    f.write(np.ascontiguousarray(filters.data, dtype="<f4").tobytes())

    toks = list(vocab_tokens)
    container.write_i32(f, len(toks))
    for t in toks:
        container.write_i32(f, len(t))
        f.write(t)


def tensor_storage_type(name: str, ndim: int, use_f16: bool) -> int:
    """Storage dtype rule of the converter (models/convert-pt-to-ggml.py:305-317)."""
    if not use_f16:
        return quants.GGML_TYPE_F32
    if ndim < 2 or name in F32_ALWAYS:
        return quants.GGML_TYPE_F32
    return quants.GGML_TYPE_F16


def write_model_file(
    path: str,
    hp: WhisperHParams,
    filters: MelFilters,
    vocab_tokens: Iterable[bytes],
    tensors: Dict[str, np.ndarray],
    use_f16: bool = True,
) -> None:
    """Write a complete f16/f32 model file from named numpy arrays."""
    ftype = quants.GGML_FTYPE_MOSTLY_F16 if use_f16 else quants.GGML_FTYPE_ALL_F32
    with open(path, "wb") as f:
        write_header(f, hp, filters, vocab_tokens, ftype)
        for name, arr in tensors.items():
            st = tensor_storage_type(name, arr.ndim, use_f16)
            container.write_tensor_record(f, name, np.asarray(arr, np.float32), st)
