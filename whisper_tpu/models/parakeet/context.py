"""Parakeet runtime context: pcm -> mel -> encode -> TDT decode -> segments.

Mirrors the reference C API surface (include/parakeet.h): parakeet_full,
parakeet_chunk (streaming with persistent LSTM state), segment/token
accessors, timings.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import model as M
from .decode import (ParakeetTokenData, TdtDecoder, refine_timestamps_tdt,
                     tdt_greedy_decode_batch, unpack_token_data)
from .hparams import HOP_LENGTH, ParakeetHParams
from .load import ParakeetModel, load_parakeet_model
from .mel import log_mel_spectrogram
from .tokenizer import detokenize, piece_to_text, tokenize


@dataclass
class ParakeetSegment:
    """parakeet_segment: t0/t1 in encoder-frame*subsampling ticks (10 ms)."""

    t0: int
    t1: int
    text: str
    tokens: List[ParakeetTokenData] = field(default_factory=list)


@dataclass
class FullParams:
    """parakeet_full_params (include/parakeet.h:239-278).

    strategy is always GREEDY (the only reference strategy); offset_ms /
    duration_ms are declared by the reference header but unused by its
    implementation (src/parakeet.cpp:3526-3548 defaults only) — kept here
    for struct-layout parity.  Callbacks:
      new_segment_callback(ctx, segment)
      new_token_callback(ctx, token_data)
      progress_callback(ctx, progress_int)
      encoder_begin_callback(ctx) -> bool   (False vetoes the run, rc -6)
      abort_callback() -> bool              (True aborts, rc -6/-7)
    """

    strategy: int = 0
    n_threads: int = 4
    offset_ms: int = 0
    duration_ms: int = 0
    no_context: bool = True
    audio_ctx: int = 0
    new_segment_callback: Any = None
    new_token_callback: Any = None
    progress_callback: Any = None
    encoder_begin_callback: Any = None
    abort_callback: Any = None


class ParakeetContext:
    def __init__(self, model: ParakeetModel, dtype=jnp.float32,
                 exact_shapes: bool = True, use_packed_weights=None,
                 mel_backend: str = "auto"):
        self.model = model
        self.hp = model.hparams
        self.vocab = model.vocab
        self.dtype = dtype
        # mel backend: the host-numpy mel is the oracle-exact path but costs
        # ~40 ms for 30 s — 5x the whole TPU encode+decode (docs/PERF.md);
        # "auto" picks the batched-rfft device mel on TPU (~1e-6 rel FFT
        # rounding vs the numpy path) and numpy elsewhere
        if mel_backend == "auto":
            mel_backend = ("jax" if jax.default_backend() == "tpu"
                           else "numpy")
        self.mel_backend = mel_backend
        # exact_shapes=True mirrors the reference's per-length dynamic graph
        # (bit-parity); False pads mel time to power-of-two buckets so jit
        # compiles are reused across utterances (production mode).
        self.exact_shapes = exact_shapes
        self.mel: Optional[np.ndarray] = None
        self.n_len_org = 0
        self.result_all: List[ParakeetSegment] = []
        self.decoded_tokens: List[int] = []
        self.decoded_token_data: List[ParakeetTokenData] = []
        self.t_mel_us = self.t_encode_us = self.t_decode_us = 0
        # parakeet_get_logits support: when True, the decode loop also
        # stores one joint-logit row per emitted token (last full/chunk)
        self.capture_logits = False
        self.last_logits: Optional[np.ndarray] = None
        # packed conformer weights for quantized files (load.py
        # build_packed_overlay): default ON for TPU — quantized storage
        # stays in HBM (half the bytes) with the dequant fused into the
        # matmuls; CPU tests default to dense load-time dequant
        if use_packed_weights is None:
            use_packed_weights = jax.default_backend() == "tpu"
        self.use_packed_weights = bool(use_packed_weights and model.qplanes)
        if not model.is_empty:
            self.params = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, dtype), model.params)
            if self.use_packed_weights:
                from .load import build_packed_overlay

                ov = build_packed_overlay(model.qplanes, self.hp)
                for key, (codes, scales, mins) in ov.items():
                    leaf = M.PQW(jnp.asarray(codes), jnp.asarray(scales),
                                 None if mins is None else jnp.asarray(mins))
                    if key == "pre.out_w":
                        self.params["pre"]["out_w"] = leaf
                    else:
                        self.params["layers"][key] = leaf
            self.decoder = TdtDecoder(model, dtype)
            self._encode_jit = jax.jit(
                M.encode, static_argnames=("hp", "dtype"))
        else:
            self.params = None
            self.decoder = None

    @staticmethod
    def from_file(path: str, **kw) -> "ParakeetContext":
        return ParakeetContext(load_parakeet_model(path), **kw)

    def fork_state(self) -> "ParakeetContext":
        """parakeet_init_state (include/parakeet.h:93): a decode state
        sharing the context's device weights — fresh mel / LSTM state /
        segments / timings, zero weight re-upload."""
        st = object.__new__(ParakeetContext)
        st.__dict__.update(self.__dict__)
        st.mel = None
        st.n_len_org = 0
        st.result_all = []
        st.decoded_tokens = []
        st.decoded_token_data = []
        st.t_mel_us = st.t_encode_us = st.t_decode_us = 0
        st.last_logits = None
        if self.decoder is not None:
            st.decoder = self.decoder.clone()
        return st

    # -- API surface ---------------------------------------------------------

    def pcm_to_mel(self, samples: np.ndarray) -> None:
        t0 = time.perf_counter()
        if self.mel_backend == "jax":
            from .mel import log_mel_spectrogram_jax

            self.mel = np.asarray(log_mel_spectrogram_jax(
                samples, self.model.filters, self.model.window,
                self.hp.n_fft))
        else:
            self.mel = log_mel_spectrogram(samples, self.model.filters,
                                           self.model.window, self.hp.n_fft)
        self.n_len_org = self.mel.shape[0]
        self.t_mel_us += int((time.perf_counter() - t0) * 1e6)

    def set_mel(self, mel: np.ndarray) -> None:
        self.mel = np.asarray(mel, np.float32)
        self.n_len_org = self.mel.shape[0]

    def reset_state(self) -> None:
        self.decoded_tokens.clear()
        self.decoded_token_data.clear()
        if self.decoder is not None:
            self.decoder.reset_state()

    def n_len(self) -> int:
        return 0 if self.mel is None else self.mel.shape[0]

    def tokenize(self, text: str) -> List[int]:
        return tokenize(self.vocab, text)

    def token_to_str(self, token_id: int) -> str:
        return self.vocab.id_to_token[token_id]

    # -- main entry points ----------------------------------------------------

    def full(self, samples: Optional[np.ndarray],
             params: Optional[FullParams] = None) -> int:
        """parakeet_full_with_state (src/parakeet.cpp:3570-3672)."""
        params = params or FullParams()
        self.result_all.clear()
        if params.no_context:
            self.reset_state()
        if params.progress_callback:
            params.progress_callback(self, 0)
        rc = self.chunk(samples, params)
        # the reference fires progress=100 only on its dynamic-graph long
        # path (mel > n_audio_ctx, src/parakeet.cpp:3628); same gate here
        if (rc == 0 and params.progress_callback
                and self.n_len_org > self.hp.n_audio_ctx):
            params.progress_callback(self, 100)
        return rc

    def encode_only(self, offset: int = 0) -> int:
        """parakeet_encode (include/parakeet.h:137): run the conformer on
        the stored mel from `offset`, caching the frames for inspection."""
        if self.mel is None or self.model.is_empty:
            return -1
        mel = self.mel[offset:]
        # valid length BEFORE padding (mirrors chunk(); the stored
        # n_len_org minus the skipped prefix)
        n_len_org = min(max(self.n_len_org - offset, 0), mel.shape[0])
        if not self.exact_shapes:
            # same power-of-two bucketing as chunk() — without it every
            # distinct utterance length traces a fresh encoder graph
            bucket = max(64, 1 << (mel.shape[0] - 1).bit_length())
            pad = bucket - mel.shape[0]
            if pad:
                mel = np.pad(mel, ((0, pad), (0, 0)))
        enc = self._encode_jit(self.params, jnp.asarray(mel, self.dtype),
                               n_len_org, hp=self.hp, dtype=self.dtype)
        enc.block_until_ready()
        self._cached_enc = enc
        return 0

    def chunk(self, samples: Optional[np.ndarray],
              params: Optional[FullParams] = None) -> int:
        """parakeet_chunk (src/parakeet.cpp:3683-3770): encode+decode the
        current mel, appending to the persistent decode state."""
        params = params or FullParams()
        if samples is not None and len(samples) > 0:
            self.pcm_to_mel(samples)
        if self.mel is None:
            return -1
        if self.model.is_empty:
            return 0  # header-only test model: full pipeline no-op

        # encoder_begin veto -> -6 (src/parakeet.cpp:3718-3723)
        if params.encoder_begin_callback is not None:
            if not params.encoder_begin_callback(self):
                return -6
        mel = self.mel
        n_len_org = self.n_len_org
        if not self.exact_shapes:
            bucket = max(64, 1 << (mel.shape[0] - 1).bit_length())
            pad = bucket - mel.shape[0]
            if pad:
                mel = np.pad(mel, ((0, pad), (0, 0)))

        t0 = time.perf_counter()
        enc = self._encode_jit(self.params, jnp.asarray(mel, self.dtype),
                               n_len_org, hp=self.hp, dtype=self.dtype)
        enc.block_until_ready()
        self.t_encode_us += int((time.perf_counter() - t0) * 1e6)
        # the reference checks abort after each graph compute: encode fail
        # -> -6, decode fail -> -7 (src/parakeet.cpp:2099,2411,3724-3733)
        if params.abort_callback is not None and params.abort_callback():
            return -6

        n_frames = (n_len_org + self.hp.subsampling_factor - 1) \
            // self.hp.subsampling_factor
        n_frames = min(n_frames, enc.shape[0])

        t0 = time.perf_counter()
        new_tokens = self.decoder.decode(enc, n_frames,
                                         capture_logits=self.capture_logits)
        if self.capture_logits:
            self.last_logits = self.decoder.last_logits
        self.t_decode_us += int((time.perf_counter() - t0) * 1e6)
        if params.abort_callback is not None and params.abort_callback():
            return -7

        if params.new_token_callback:
            for td in new_tokens:
                params.new_token_callback(self, td)

        if new_tokens:
            first = not self.decoded_tokens
            text = ""
            for k, td in enumerate(new_tokens):
                text += piece_to_text(self.vocab.id_to_token[td.id],
                                      is_first_piece=(first and k == 0))
            self.decoded_tokens.extend(td.id for td in new_tokens)
            self.decoded_token_data.extend(new_tokens)
            refine_timestamps_tdt(self.vocab, new_tokens)
            if text:
                seg = ParakeetSegment(t0=0, t1=n_frames, text=text,
                                      tokens=new_tokens)
                self.result_all.append(seg)
                if params.new_segment_callback:
                    params.new_segment_callback(self, seg)
        return 0

    def full_batch(self, samples_list: List[np.ndarray],
                   params: Optional[FullParams] = None
                   ) -> List[List[ParakeetSegment]]:
        """Batched serving: transcribe independent utterances in lockstep.

        The reference serves one utterance at a time (parakeet_full,
        src/parakeet.cpp:3570); on TPU the encoder and the whole TDT loop
        vmap over the utterance axis, so B utterances cost ~one utterance of
        weight reads — the multi-utterance analogue of the whisper window
        batcher (runtime/batching.py).  Each utterance gets fresh LSTM state
        (no cross-utterance context); results match sequential full() per
        utterance exactly (greedy decode is deterministic).

        Returns one segment list per utterance; does NOT touch the
        context's persistent decode state.
        """
        params = params or FullParams()
        if not samples_list:
            return []
        if self.model.is_empty:
            return [[] for _ in samples_list]
        hp = self.hp

        # mels on host, padded to a shared power-of-two time bucket so the
        # batched jit is reused across batches
        t0 = time.perf_counter()
        mels = [log_mel_spectrogram(s, self.model.filters, self.model.window,
                                    hp.n_fft) for s in samples_list]
        self.t_mel_us += int((time.perf_counter() - t0) * 1e6)
        n_lens = np.array([m.shape[0] for m in mels], np.int32)
        bucket = max(64, 1 << (int(n_lens.max()) - 1).bit_length())
        mel_b = np.zeros((len(mels), bucket, hp.n_mels), np.float32)
        for i, m in enumerate(mels):
            mel_b[i, :m.shape[0]] = m

        if not hasattr(self, "_encode_batch_jit"):
            def _enc_batch(p, mels_, lens_):
                return jax.vmap(
                    lambda m, n: M.encode(p, m, n, hp=hp, dtype=self.dtype)
                )(mels_, lens_)
            self._encode_batch_jit = jax.jit(_enc_batch)

        t0 = time.perf_counter()
        enc_b = self._encode_batch_jit(self.params,
                                       jnp.asarray(mel_b, self.dtype),
                                       jnp.asarray(n_lens))
        enc_b.block_until_ready()
        self.t_encode_us += int((time.perf_counter() - t0) * 1e6)

        sub = hp.subsampling_factor
        n_frames = np.minimum((n_lens + sub - 1) // sub, enc_b.shape[1])
        nf_max = int(n_frames.max())
        max_out = max(16, int(min(nf_max * hp.n_max_tokens,
                                  4 * nf_max + 64)))
        B = len(mels)
        D, L = hp.n_pred_dim, hp.n_pred_layers
        h0 = jnp.zeros((B, L, D), self.dtype)
        c0 = jnp.zeros((B, L, D), self.dtype)

        t0 = time.perf_counter()
        (tok, frame, didx, dval, p, plog, n_out, _, _) = \
            tdt_greedy_decode_batch(self.decoder.params, enc_b,
                                    jnp.asarray(n_frames), h0, c0,
                                    hp, max_out, self.dtype)
        n_out = np.asarray(n_out)
        self.t_decode_us += int((time.perf_counter() - t0) * 1e6)

        results: List[List[ParakeetSegment]] = []
        for b in range(B):
            toks = unpack_token_data(self.vocab, sub, tok[b], frame[b],
                                     didx[b], dval[b], p[b], plog[b],
                                     int(n_out[b]))
            segs: List[ParakeetSegment] = []
            if toks:
                text = ""
                for k, td in enumerate(toks):
                    text += piece_to_text(self.vocab.id_to_token[td.id],
                                          is_first_piece=(k == 0))
                refine_timestamps_tdt(self.vocab, toks)
                if text:
                    segs.append(ParakeetSegment(t0=0, t1=int(n_frames[b]),
                                                text=text, tokens=toks))
            results.append(segs)
        return results

    # -- accessors (parakeet_full_* analogues) --------------------------------

    def n_segments(self) -> int:
        return len(self.result_all)

    def get_segment(self, i: int) -> ParakeetSegment:
        return self.result_all[i]

    def full_text(self) -> str:
        return "".join(s.text for s in self.result_all)

    def print_timings(self) -> str:
        lines = [
            f"parakeet:     mel time = {self.t_mel_us / 1000.0:8.2f} ms",
            f"parakeet:  encode time = {self.t_encode_us / 1000.0:8.2f} ms",
            f"parakeet:  decode time = {self.t_decode_us / 1000.0:8.2f} ms",
        ]
        return "\n".join(lines)
