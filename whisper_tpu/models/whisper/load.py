"""Load a legacy ggml whisper model file into a JAX parameter pytree.

Reader parity with the reference `whisper_model_load` (src/whisper.cpp:1485-1962):
magic, 11×i32 hparams, mel filterbank floats, length-prefixed vocab strings,
then tensor records.  Header-only "for-tests" files (zero tensor records) are
accepted, mirroring the reference's empty-model testing trick
(src/whisper.cpp:1947-1949).

TPU-first re-design of the weight store:

  * per-layer weights are stacked along a leading layer axis so the encoder /
    decoder run as a single `lax.scan` over layers (one compiled block body
    instead of L unrolled ones);
  * weight matrices are transposed to (in, out) so matmuls are `x @ w` with
    the contraction on the contiguous axis the MXU prefers;
  * quantized tensors can be kept packed as struct-of-arrays
    (codes int8 + scales f16) for the fused dequant-matmul Pallas kernels,
    or eagerly dequantized to `dtype` (default) for the dense path.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, BinaryIO, Dict, List, Optional, Tuple

import numpy as np

from ...formats import container, quants
from ...decoding.tokenizer import WhisperVocab
from .hparams import WhisperHParams


@dataclass
class MelFilters:
    n_mel: int
    n_fft: int
    data: np.ndarray  # (n_mel, n_fft) f32


@dataclass
class WhisperModel:
    hparams: WhisperHParams
    filters: MelFilters
    vocab: WhisperVocab
    params: Optional[Dict[str, Any]]  # None for header-only test models
    qparams: Optional[Dict[str, Any]] = None  # packed quant planes (Pallas path)
    wtype: int = quants.GGML_TYPE_F16
    n_loaded: int = 0

    @property
    def is_empty(self) -> bool:
        return self.params is None


def _read_header(f: BinaryIO) -> Tuple[WhisperHParams, MelFilters, WhisperVocab, int]:
    container.check_magic(f)
    vals = [container.read_i32(f) for _ in range(11)]
    ftype_raw = vals[10]
    ftype = ftype_raw % quants.GGML_QNT_VERSION_FACTOR
    hp = WhisperHParams(
        n_vocab=vals[0], n_audio_ctx=vals[1], n_audio_state=vals[2],
        n_audio_head=vals[3], n_audio_layer=vals[4], n_text_ctx=vals[5],
        n_text_state=vals[6], n_text_head=vals[7], n_text_layer=vals[8],
        n_mels=vals[9], ftype=ftype,
    )

    n_mel = container.read_i32(f)
    n_fft = container.read_i32(f)
    fdata = np.frombuffer(f.read(4 * n_mel * n_fft), dtype="<f4").reshape(n_mel, n_fft)
    filters = MelFilters(n_mel, n_fft, fdata.astype(np.float32))

    n_vocab_read = container.read_i32(f)
    vocab = WhisperVocab(n_vocab=hp.n_vocab)
    for i in range(n_vocab_read):
        ln = container.read_u32(f)
        word = f.read(ln) if ln > 0 else b""
        vocab.token_to_id[word] = i
        vocab.id_to_token[i] = word
    vocab.apply_multilingual_shift()
    if n_vocab_read < hp.n_vocab:
        vocab.synthesize_missing(n_vocab_read)
    return hp, filters, vocab, n_vocab_read


def expected_tensor_names(hp: WhisperHParams) -> List[str]:
    """All tensor names of a full whisper checkpoint, in converter order."""
    names = [
        "encoder.positional_embedding",
        "encoder.conv1.weight", "encoder.conv1.bias",
        "encoder.conv2.weight", "encoder.conv2.bias",
        "encoder.ln_post.weight", "encoder.ln_post.bias",
    ]
    for i in range(hp.n_audio_layer):
        p = f"encoder.blocks.{i}."
        names += [
            p + "attn_ln.weight", p + "attn_ln.bias",
            p + "attn.query.weight", p + "attn.query.bias",
            p + "attn.key.weight",
            p + "attn.value.weight", p + "attn.value.bias",
            p + "attn.out.weight", p + "attn.out.bias",
            p + "mlp_ln.weight", p + "mlp_ln.bias",
            p + "mlp.0.weight", p + "mlp.0.bias",
            p + "mlp.2.weight", p + "mlp.2.bias",
        ]
    names += [
        "decoder.positional_embedding",
        "decoder.token_embedding.weight",
        "decoder.ln.weight", "decoder.ln.bias",
    ]
    for i in range(hp.n_text_layer):
        p = f"decoder.blocks.{i}."
        names += [
            p + "attn_ln.weight", p + "attn_ln.bias",
            p + "attn.query.weight", p + "attn.query.bias",
            p + "attn.key.weight",
            p + "attn.value.weight", p + "attn.value.bias",
            p + "attn.out.weight", p + "attn.out.bias",
            p + "cross_attn_ln.weight", p + "cross_attn_ln.bias",
            p + "cross_attn.query.weight", p + "cross_attn.query.bias",
            p + "cross_attn.key.weight",
            p + "cross_attn.value.weight", p + "cross_attn.value.bias",
            p + "cross_attn.out.weight", p + "cross_attn.out.bias",
            p + "mlp_ln.weight", p + "mlp_ln.bias",
            p + "mlp.0.weight", p + "mlp.0.bias",
            p + "mlp.2.weight", p + "mlp.2.bias",
        ]
    return names


def _stack(tensors: Dict[str, np.ndarray], fmt: str, n_layer: int,
           transpose: bool = False) -> np.ndarray:
    mats = []
    for i in range(n_layer):
        t = tensors[fmt % i]
        mats.append(t.T if transpose else t)
    return np.stack(mats, axis=0)


def build_param_pytree(tensors: Dict[str, np.ndarray], hp: WhisperHParams) -> Dict[str, Any]:
    """Assemble the scan-friendly parameter pytree from named f32 arrays.

    2-D weights come from disk in (out, in) layout (torch Linear convention);
    we transpose them to (in, out) so the forward pass is plain `x @ w`.
    """
    def T(name: str) -> np.ndarray:
        return tensors[name]

    # encoder q/k/v fuse into ONE (in, 3*out) matmul at load time, like the
    # decoder below: one (T,S)x(S,3S) projection beats three (S,S) matmuls
    # by ~70 us/block at large-v3 dims on v5e (tools/perf_encoder.py).
    # Concatenating output columns is bit-exact.
    eq = _stack(tensors, "encoder.blocks.%d.attn.query.weight", hp.n_audio_layer, True)
    ek = _stack(tensors, "encoder.blocks.%d.attn.key.weight", hp.n_audio_layer, True)
    ev = _stack(tensors, "encoder.blocks.%d.attn.value.weight", hp.n_audio_layer, True)
    eq_b = _stack(tensors, "encoder.blocks.%d.attn.query.bias", hp.n_audio_layer)
    ev_b = _stack(tensors, "encoder.blocks.%d.attn.value.bias", hp.n_audio_layer)
    enc_blocks = {
        "attn_ln_w": _stack(tensors, "encoder.blocks.%d.attn_ln.weight", hp.n_audio_layer),
        "attn_ln_b": _stack(tensors, "encoder.blocks.%d.attn_ln.bias", hp.n_audio_layer),
        "qkv_w": np.concatenate([eq, ek, ev], axis=-1),
        "qkv_b": np.concatenate([eq_b, np.zeros_like(eq_b), ev_b], axis=-1),
        "o_w": _stack(tensors, "encoder.blocks.%d.attn.out.weight", hp.n_audio_layer, True),
        "o_b": _stack(tensors, "encoder.blocks.%d.attn.out.bias", hp.n_audio_layer),
        "mlp_ln_w": _stack(tensors, "encoder.blocks.%d.mlp_ln.weight", hp.n_audio_layer),
        "mlp_ln_b": _stack(tensors, "encoder.blocks.%d.mlp_ln.bias", hp.n_audio_layer),
        "mlp0_w": _stack(tensors, "encoder.blocks.%d.mlp.0.weight", hp.n_audio_layer, True),
        "mlp0_b": _stack(tensors, "encoder.blocks.%d.mlp.0.bias", hp.n_audio_layer),
        "mlp1_w": _stack(tensors, "encoder.blocks.%d.mlp.2.weight", hp.n_audio_layer, True),
        "mlp1_b": _stack(tensors, "encoder.blocks.%d.mlp.2.bias", hp.n_audio_layer),
    }
    # decoder q/k/v fuse into ONE (in, 3*out) matmul at load time: the decode
    # step is op-latency-bound on TPU, and the fused projection also emits
    # K/V adjacent so the cache update is a single dynamic_update_slice
    # (model.py decode_step).  Concatenating output columns is bit-exact.
    dq = _stack(tensors, "decoder.blocks.%d.attn.query.weight", hp.n_text_layer, True)
    dk = _stack(tensors, "decoder.blocks.%d.attn.key.weight", hp.n_text_layer, True)
    dv = _stack(tensors, "decoder.blocks.%d.attn.value.weight", hp.n_text_layer, True)
    dq_b = _stack(tensors, "decoder.blocks.%d.attn.query.bias", hp.n_text_layer)
    dv_b = _stack(tensors, "decoder.blocks.%d.attn.value.bias", hp.n_text_layer)
    dec_blocks = {
        "attn_ln_w": _stack(tensors, "decoder.blocks.%d.attn_ln.weight", hp.n_text_layer),
        "attn_ln_b": _stack(tensors, "decoder.blocks.%d.attn_ln.bias", hp.n_text_layer),
        "qkv_w": np.concatenate([dq, dk, dv], axis=-1),
        "qkv_b": np.concatenate([dq_b, np.zeros_like(dq_b), dv_b], axis=-1),
        "o_w": _stack(tensors, "decoder.blocks.%d.attn.out.weight", hp.n_text_layer, True),
        "o_b": _stack(tensors, "decoder.blocks.%d.attn.out.bias", hp.n_text_layer),
        "xattn_ln_w": _stack(tensors, "decoder.blocks.%d.cross_attn_ln.weight", hp.n_text_layer),
        "xattn_ln_b": _stack(tensors, "decoder.blocks.%d.cross_attn_ln.bias", hp.n_text_layer),
        "xq_w": _stack(tensors, "decoder.blocks.%d.cross_attn.query.weight", hp.n_text_layer, True),
        "xq_b": _stack(tensors, "decoder.blocks.%d.cross_attn.query.bias", hp.n_text_layer),
        "xk_w": _stack(tensors, "decoder.blocks.%d.cross_attn.key.weight", hp.n_text_layer, True),
        "xv_w": _stack(tensors, "decoder.blocks.%d.cross_attn.value.weight", hp.n_text_layer, True),
        "xv_b": _stack(tensors, "decoder.blocks.%d.cross_attn.value.bias", hp.n_text_layer),
        "xo_w": _stack(tensors, "decoder.blocks.%d.cross_attn.out.weight", hp.n_text_layer, True),
        "xo_b": _stack(tensors, "decoder.blocks.%d.cross_attn.out.bias", hp.n_text_layer),
        "mlp_ln_w": _stack(tensors, "decoder.blocks.%d.mlp_ln.weight", hp.n_text_layer),
        "mlp_ln_b": _stack(tensors, "decoder.blocks.%d.mlp_ln.bias", hp.n_text_layer),
        "mlp0_w": _stack(tensors, "decoder.blocks.%d.mlp.0.weight", hp.n_text_layer, True),
        "mlp0_b": _stack(tensors, "decoder.blocks.%d.mlp.0.bias", hp.n_text_layer),
        "mlp1_w": _stack(tensors, "decoder.blocks.%d.mlp.2.weight", hp.n_text_layer, True),
        "mlp1_b": _stack(tensors, "decoder.blocks.%d.mlp.2.bias", hp.n_text_layer),
    }
    return {
        "enc": {
            "pos_embd": T("encoder.positional_embedding"),
            "conv1_w": T("encoder.conv1.weight"),  # (n_state, n_mels, 3)
            "conv1_b": T("encoder.conv1.bias").reshape(-1),
            "conv2_w": T("encoder.conv2.weight"),  # (n_state, n_state, 3)
            "conv2_b": T("encoder.conv2.bias").reshape(-1),
            "ln_post_w": T("encoder.ln_post.weight"),
            "ln_post_b": T("encoder.ln_post.bias"),
            "blocks": enc_blocks,
        },
        "dec": {
            "pos_embd": T("decoder.positional_embedding"),
            "tok_embd": T("decoder.token_embedding.weight"),  # (n_vocab, n_state)
            "ln_w": T("decoder.ln.weight"),
            "ln_b": T("decoder.ln.bias"),
            "blocks": dec_blocks,
        },
    }


# hot decode-loop weights eligible for the packed fused-kernel path; the
# cross-attention K/V projections run once per window in compute_cross_kv
# (compute-bound at T=1500) and stay dense.  "qkv_w" packs the three
# self-attention projections stacked along the output-row axis, mirroring
# the dense load-time fusion (planes are (out, in), so rows concatenate).
PACKED_DEC_KEYS = {
    "qkv_w": ("attn.query.weight", "attn.key.weight", "attn.value.weight"),
    "o_w": ("attn.out.weight",),
    "xq_w": ("cross_attn.query.weight",), "xo_w": ("cross_attn.out.weight",),
    "mlp0_w": ("mlp.0.weight",), "mlp1_w": ("mlp.2.weight",),
}


def build_qweight_overlay(qplanes: Dict[str, "quants.QTensor"],
                          hp: WhisperHParams) -> Dict[str, Any]:
    """Stacked packed planes for the decoder's hot weights + logits head.

    Returns {"blocks": {key: (codes [L,R,K], scales [L,R,K//g],
                              mins [L,R,K//g] | None)},
             "tok_embd": (codes, scales, mins | None)} — for every weight
    whose packed planes exist; missing entries keep the dense leaf.
    Affine formats (q4_1/q5_1, K-quants) keep their mins plane — the qmm
    kernels fold the per-block offset into the matmul (ops/qmm.py), so
    these files decode block-quantized like the symmetric ones (the
    reference runs every format natively in mul_mat,
    ggml/src/ggml-cpu/quants.c + repack.cpp).  A key whose planes mix
    grains or minsness (e.g. a file mixing q6_k and q4_k tensors) stays
    dense — stacking would misalign the scale blocks."""
    def planes(rows):
        qs = [[qplanes[n] for n in row] for row in rows]
        flat = [q for row in qs for q in row]
        grains = {q.codes.shape[-1] // q.scales.shape[-1] for q in flat}
        affine = {q.mins is not None for q in flat}
        if len(grains) > 1 or len(affine) > 1:
            return None
        has_mins = affine.pop()
        return (np.stack([np.concatenate([q.codes for q in row])
                          for row in qs]),
                np.stack([np.concatenate([q.scales for q in row])
                          for row in qs]),
                np.stack([np.concatenate([q.mins for q in row])
                          for row in qs]) if has_mins else None)

    out: Dict[str, Any] = {"blocks": {}}
    for key, fnames in PACKED_DEC_KEYS.items():
        names = [[f"decoder.blocks.{i}.{f}" for f in fnames]
                 for i in range(hp.n_text_layer)]
        if all(n in qplanes for row in names for n in row):
            stacked = planes(names)
            if stacked is not None:
                out["blocks"][key] = stacked
    te = qplanes.get("decoder.token_embedding.weight")
    if te is not None:
        out["tok_embd"] = (te.codes, te.scales, te.mins)
    return out


# every matmul weight of the transformer stacks, keyed by pytree leaf →
# file tensor names concatenated along the OUT axis (mirrors the dense
# load-time qkv fusion, which concatenates output rows)
_PARITY_ENC_KEYS = {
    "qkv_w": ("attn.query.weight", "attn.key.weight", "attn.value.weight"),
    "o_w": ("attn.out.weight",),
    "mlp0_w": ("mlp.0.weight",), "mlp1_w": ("mlp.2.weight",),
}
_PARITY_DEC_KEYS = {
    **PACKED_DEC_KEYS,
    "xk_w": ("cross_attn.key.weight",), "xv_w": ("cross_attn.value.weight",),
}


def build_parity_overlay(qplanes: Dict[str, "quants.QTensor"],
                         hp: WhisperHParams) -> Dict[str, Any]:
    """ggml-CPU-parity planes for EVERY quantized matmul weight.

    The ggml CPU backend never dequantizes q8_0-family weights: mul_mat
    quantizes the activation rows to Q8_0 and runs integer block dots
    (ggml/src/ggml-cpu/quants.c ggml_vec_dot_q{4,5,8}_0_q8_0).  The parity
    decode path (model.py `_mm_ggml_q`) reproduces that bit-for-bit from
    these centered-code/scale planes.  Symmetric formats only — exactly the
    set whisper-quantize emits by default plus what the text-parity
    fixtures use."""
    def planes(fmt: str, keys: Dict[str, tuple], n_layer: int):
        out = {}
        for key, fnames in keys.items():
            names = [[fmt % i + "." + f for f in fnames]
                     for i in range(n_layer)]
            missing = [n for row in names for n in row
                       if n not in qplanes or qplanes[n].mins is not None]
            if missing:
                raise ValueError(
                    f"ggml_cpu_f16 parity needs symmetric quant planes for "
                    f"{missing[:2]} (q4_0/q5_0/q8_0 files only)")
            out[key] = (
                np.stack([np.concatenate([qplanes[n].codes for n in row])
                          for row in names]).astype(np.float32),
                np.stack([np.concatenate([qplanes[n].scales for n in row])
                          for row in names]))
        return out

    overlay = {
        "enc_blocks": planes("encoder.blocks.%d", _PARITY_ENC_KEYS,
                             hp.n_audio_layer),
        "dec_blocks": planes("decoder.blocks.%d", _PARITY_DEC_KEYS,
                             hp.n_text_layer),
    }
    te = qplanes.get("decoder.token_embedding.weight")
    if te is None or te.mins is not None:
        raise ValueError("ggml_cpu_f16 parity: quantized token embedding "
                         "with symmetric codes required")
    overlay["tok_embd"] = (te.codes.astype(np.float32), te.scales)
    return overlay


def load_model(path: str, dtype: Any = np.float32) -> WhisperModel:
    """Read a legacy ggml whisper file.  Quantized tensors are dequantized to
    `dtype` (dense path); the packed planes are additionally preserved in
    `qparams` when the file is quantized, for the fused-kernel path."""
    with open(path, "rb") as f:
        hp, filters, vocab, _ = _read_header(f)

        tensors: Dict[str, np.ndarray] = {}
        qplanes: Dict[str, quants.QTensor] = {}
        n_loaded = 0
        wtype = quants.FTYPE_TO_QTYPE.get(hp.ftype, quants.GGML_TYPE_F16)
        for rec in container.read_tensor_records(f):
            tensors[rec.name] = rec.to_f32().astype(dtype)
            if rec.ggml_type not in (quants.GGML_TYPE_F32, quants.GGML_TYPE_F16):
                try:
                    qplanes[rec.name] = rec.to_planes()
                except NotImplementedError:
                    pass
            n_loaded += 1

    if n_loaded == 0:
        # header-only test model (reference: "assuming empty model for testing",
        # src/whisper.cpp:1947-1949)
        return WhisperModel(hp, filters, vocab, None, None, wtype, 0)

    expected = expected_tensor_names(hp)
    missing = [n for n in expected if n not in tensors]
    if missing:
        raise ValueError(f"model file missing {len(missing)} tensors, e.g. {missing[:3]}")

    params = build_param_pytree(tensors, hp)
    return WhisperModel(hp, filters, vocab, params, qplanes or None, wtype, n_loaded)
