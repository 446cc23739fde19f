"""WhisperContext — the runtime around the jitted compute functions.

Plays the role of whisper_context + whisper_state (src/whisper.cpp:824-900):
owns device weights, shape-bucketed compiled functions, the mel spectrogram,
the KV cache and phase timers.  Where the reference rebuilds a ggml graph per
call and runs it through the backend scheduler, here each (batch, token-count)
bucket is traced once by XLA and cached (SURVEY.md §1: the scheduler's role is
played by XLA).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.mel import LogMel, mel_frame_counts
from ..decoding.logits import LogitFilterTables
from ..models.whisper import model as M
from ..models.whisper.hparams import WhisperHParams
from ..models.whisper.load import WhisperModel, load_model
from .timings import Timings

# token-count buckets for prompt decodes (steps are always 1); padding to the
# bucket keeps the XLA compile cache small (SURVEY.md §7 hard part 6)
TOKEN_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128, 256, 448)


def _bucket(n: int) -> int:
    for b in TOKEN_BUCKETS:
        if n <= b:
            return b
    raise ValueError(f"too many tokens: {n}")


class WhisperContext:
    def __init__(self, model: WhisperModel, dtype=jnp.float32,
                 compute_dtype=None, use_packed_weights=None,
                 kv_itype: str = "f16", cross_itype: str = "f16",
                 precision: Optional[str] = None,
                 mel_backend: str = "auto"):
        self.model = model
        self.hp = model.hparams
        self.vocab = model.vocab
        self.is_empty = model.is_empty
        # precision="ggml_cpu_f16": emulate the reference CPU backend's
        # numerics exactly — f16 weight storage (file bytes), f16 rounding
        # of every weight-matmul activation input (ggml's vec_dot_type
        # conversion), f16 kv_self/kv_cross storage, f16 GELU table —
        # so whisper_full output can be text-diffed against the reference
        # binary (tests/test_text_parity.py; VERDICT r2 items 1+6).
        self.parity = precision == "ggml_cpu_f16"
        if precision not in (None, "default", "ggml_cpu_f16"):
            raise ValueError(f"unknown precision mode {precision!r}")
        # compute_dtype: MXU input precision (bf16 on TPU default)
        if compute_dtype is None:
            compute_dtype = (
                jnp.float16 if self.parity else
                jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32)
        self.compute_dtype = compute_dtype
        self.cache_dtype = jnp.float16 if self.parity else jnp.float32
        if self.parity:
            use_packed_weights = False
        # kv_self storage: 'f16' (dense, compute dtype) or 'q8' (int8 codes
        # with per-position scales — the reference's quantized itype cache)
        self.kv_itype = kv_itype
        # cross-attention K/V storage: 'q8' halves the dominant HBM stream
        # of batched decode and per-window serving memory (model.py XK8)
        self.cross_itype = cross_itype
        self.params = (
            None if model.is_empty else jax.tree.map(
                lambda a: jnp.asarray(a, dtype), model.params))

        if self.parity and model.qparams:
            # ggml-CPU parity on a quantized file: replace every quantized
            # matmul weight with its centered-code planes so model._mm runs
            # the reference's exact q8_0-activation integer dots instead of
            # a dense dequant matmul (model.py _mm_ggml_q)
            from ..models.whisper.load import build_parity_overlay
            from ..models.whisper.model import QWGGML

            ov = build_parity_overlay(model.qparams, self.hp)
            for part, key in (("enc", "enc_blocks"), ("dec", "dec_blocks")):
                for k, (codes, scales) in ov[key].items():
                    self.params[part]["blocks"][k] = QWGGML(
                        jnp.asarray(codes), jnp.asarray(scales))
            codes, scales = ov["tok_embd"]
            self.params["dec"]["tok_embd"] = QWGGML(
                jnp.asarray(codes), jnp.asarray(scales))

        # packed path for quantized files: the decode-loop weights stay
        # block-quantized in HBM — layer matmuls dequantize via an XLA-fused
        # convert+scale producer of the dot, the logits head via the qmmt
        # streaming Pallas kernel (ops/qmm.py).  Default ON for TPU, where
        # it beats dense bf16 (bench.py: 3.26 vs 3.47 ms/tok single-stream
        # large-v3 on v5e) AND halves decoder weight HBM; off-TPU (CPU
        # tests) dense f32 stays the default for exactness.
        if use_packed_weights is None:
            use_packed_weights = jax.default_backend() == "tpu"
        self.use_packed_weights = bool(use_packed_weights and model.qparams)
        if self.use_packed_weights:
            from ..models.whisper.load import build_qweight_overlay
            from ..ops.qmm import QWeight, QWeightT

            # TRANSPOSED planes as PER-LAYER buffers feed the qmmt streaming
            # kernel on TPU.  Transposed: the kernel's DMA is contiguous
            # along the output lane dim.  Per-layer (not stacked (L,...)):
            # a Pallas call cannot alias a slice of a stacked parameter, so
            # stacked planes cost a full int8 copy of every weight every
            # step (tools/perf_decode_ctx.py); and the XLA-fused-dequant
            # alternative materializes bf16 weights at multi-row shapes.
            # The dense stacked leaves are dropped so bf16 copies don't
            # occupy HBM alongside the planes.
            overlay = build_qweight_overlay(model.qparams, self.hp)
            n_layers = self.hp.n_text_layer

            def _t(a, dt):
                return (None if a is None else
                        jnp.asarray(np.ascontiguousarray(a.T), dt))

            blocks_packed = [dict() for _ in range(n_layers)]
            for key, (codes, scales, mins) in overlay["blocks"].items():
                for l in range(n_layers):
                    blocks_packed[l][key] = QWeightT(
                        _t(codes[l], jnp.int8), _t(scales[l], jnp.float32),
                        _t(None if mins is None else mins[l], jnp.float32))
                del self.params["dec"]["blocks"][key]
            if any(blocks_packed[0]):
                self.params["dec"]["blocks_packed"] = blocks_packed
            if "tok_embd" in overlay:
                codes, scales, mins = overlay["tok_embd"]
                self.params["dec"]["tok_embd"] = QWeight(
                    jnp.asarray(codes, jnp.int8),
                    jnp.asarray(scales, jnp.float32),
                    None if mins is None
                    else jnp.asarray(mins, jnp.float32))
                # transposed copy for the logits head's streaming kernel
                # (ops/qmm.py qmmt); +n_vocab*n_state bytes of HBM
                self.params["dec"]["tok_embd_t"] = QWeightT(
                    _t(codes, jnp.int8), _t(scales, jnp.float32),
                    _t(mins, jnp.float32))
        # mel backend: "auto" runs the batched-rfft DEVICE mel on TPU (the
        # host-numpy 30 s mel costs ~40 ms — comparable to the whole encode;
        # FFT rounding differs ~1e-6 rel from the oracle-exact numpy path)
        # and keeps the reference-exact numpy path everywhere else,
        # including the ggml_cpu_f16 parity mode
        if mel_backend == "auto":
            mel_backend = ("jax" if jax.default_backend() == "tpu"
                           and not self.parity else "numpy")
        self.mel_fn = LogMel(model.filters.data, backend=mel_backend)
        self.timings = Timings()
        self.filter_tables: Optional[LogitFilterTables] = None  # set per audio_ctx

        self.mel: Optional[np.ndarray] = None       # (n_mel, n_len)
        self.n_len_org: int = 0
        self.lang_id: int = 0
        self.no_speech_prob: float = 0.0

        # encoder outputs for the current window
        self.xk = None
        self.xv = None

        # [EXPERIMENTAL] DTW token-level timestamps
        # (whisper_context_params.dtw_*, include/whisper.h:116-129)
        self.dtw_token_timestamps = False
        self.dtw_aheads: Optional[list] = None

        self._encode_jit: Dict[int, Any] = {}
        self._decode_jit: Dict[Tuple[int, int], Any] = {}
        self._window_jit: Dict[Tuple, Any] = {}

        # lockstep window batcher (runtime/batching.py), set per stream
        self.batcher = None

    def enable_dtw(self, preset: str = "auto", n_top_most: int = 0,
                   custom=None) -> None:
        """Select alignment heads and enable DTW timestamps
        (aheads_masks_init, src/whisper.cpp:1160-1283)."""
        from ..decoding.dtw import resolve_aheads

        if preset == "auto":
            preset = self.hp.model_name
            if not self.vocab.is_multilingual:
                preset += ".en"
        # the reference CLI spells these with dots (cli.cpp:190-213)
        preset = preset.replace("large.v", "large-v").replace(
            "large-v3.turbo", "large-v3-turbo")
        self.dtw_aheads = resolve_aheads(self.hp, preset, n_top_most, custom)
        self.dtw_token_timestamps = True

    @staticmethod
    def from_file(path: str, **kw) -> "WhisperContext":
        return WhisperContext(load_model(path), **kw)

    # -- mel -----------------------------------------------------------------

    def pcm_to_mel(self, samples: np.ndarray) -> None:
        t0 = time.perf_counter()
        self.mel, self.n_len_org = self.mel_fn(samples)
        self.timings.t_mel_us += int((time.perf_counter() - t0) * 1e6)

    def set_mel(self, mel: np.ndarray, n_len_org: Optional[int] = None) -> None:
        self.mel = np.asarray(mel, dtype=np.float32)
        self.n_len_org = n_len_org if n_len_org is not None else mel.shape[1]

    @property
    def n_len(self) -> int:
        return 0 if self.mel is None else self.mel.shape[1]

    # -- compiled functions ----------------------------------------------------

    def _get_encode(self, n_audio_ctx: int):
        fn = self._encode_jit.get(n_audio_ctx)
        if fn is None:
            hp, cd = self.hp, self.compute_dtype

            @jax.jit
            def encode_fn(params, mel_window):
                enc = M.encode(params, mel_window, hp, dtype=cd,
                               n_audio_ctx=n_audio_ctx, parity=self.parity)
                xk, xv = M.compute_cross_kv(params, enc, hp, dtype=cd,
                                            itype=self.cross_itype,
                                            parity=self.parity)
                return enc, xk, xv

            fn = self._encode_jit[n_audio_ctx] = encode_fn
        return fn

    def _get_decode(self, n_beam: int, n_tok: int, attn_ctx: int):
        key = (n_beam, n_tok, attn_ctx)
        fn = self._decode_jit.get(key)
        if fn is None:
            hp, cd = self.hp, self.compute_dtype

            @jax.jit
            def decode_fn(params, tokens, positions, kv_head, n_valid, cache,
                          xk, xv):
                # attn_ctx is picked ON HOST per call (n_past is a host
                # int), so the bucket is STATIC here — no lax.switch, whose
                # cache results can't alias in place (tools/perf_bucket.py)
                logits, cache = M.decode_step(
                    params, tokens, positions, kv_head, cache, xk, xv, hp,
                    dtype=cd, attn_ctx=attn_ctx, parity=self.parity)
                # logits for the last *valid* row only (reference downloads
                # only rows flagged in batch.logits, src/whisper.cpp:2972)
                last = jax.lax.dynamic_index_in_dim(
                    logits, n_valid - 1, axis=1, keepdims=False)
                return last, cache

            fn = self._decode_jit[key] = decode_fn
        return fn

    # -- public compute ---------------------------------------------------------

    def encode_window(self, seek: int, audio_ctx: int = 0) -> None:
        """Encode 2*n_ctx mel frames starting at `seek`
        (whisper_encode_internal, src/whisper.cpp:2364-2462)."""
        assert self.mel is not None, "call pcm_to_mel first"
        hp = self.hp
        n_ctx = audio_ctx if audio_ctx > 0 else hp.n_audio_ctx
        t0 = time.perf_counter()
        window = np.zeros((hp.n_mels, 2 * n_ctx), np.float32)
        i1 = min(seek + 2 * n_ctx, self.n_len)
        if i1 > seek:
            window[:, : i1 - seek] = self.mel[:, seek:i1]
        _, self.xk, self.xv = self._get_encode(n_ctx)(
            self.params, jnp.asarray(window))
        jax.block_until_ready(self.xk)
        self.timings.t_encode_us += int((time.perf_counter() - t0) * 1e6)
        self.timings.n_encode += 1
        # max_initial_ts precision derives from the MODEL's full audio ctx
        # even when -ac truncates the encode (src/whisper.cpp:6338 reads
        # ctx.model.hparams.n_audio_ctx, not exp_n_audio_ctx)
        self.filter_tables = LogitFilterTables(self.vocab, hp.n_audio_ctx)

    def new_cache(self, n_beam: int, dtype=None):
        if dtype is None:
            dtype = self.cache_dtype
        return M.new_cache(self.hp, n_beam, dtype, itype=self.kv_itype)

    def decode_window_device(self, prompt, n_beams: int, temperature: float,
                             seek: int, seek_end: int, params,
                             no_timestamps: bool, rng_seed: int,
                             strategy: str = "greedy"):
        """Run the whole-window on-device token loop (decoding/device_loop.py);
        one host readback per call.  Returns a WindowResult of numpy arrays.

        When a WindowBatcher is attached (runtime/batching.py), the request
        joins the current lockstep batch instead of executing immediately.
        """
        from ..decoding import device_loop as DL

        bt = _bucket(len(prompt))
        # key[:5] selects the compiled graph; the trailing digest keeps the
        # WindowBatcher from coalescing requests whose per-request ARGS
        # differ in ways _run_group shares from reqs[0] (suppression masks,
        # max_tokens) or that cannot stack (xk shapes under -ac) — without
        # it, concurrent server users could silently decode with each
        # other's suppression settings
        digest = (params.suppress_blank, params.suppress_nst,
                  params.suppress_regex, params.tdrz_enable,
                  params.max_initial_ts, params.max_tokens,
                  tuple(jax.tree.leaves(self.xk)[0].shape))
        key = (n_beams, bt, no_timestamps, params.single_segment, strategy,
               digest)
        base_mask, initial_mask = DL.build_masks(self.filter_tables, params)
        prompt_padded = np.zeros(bt, np.int32)
        prompt_padded[: len(prompt)] = prompt
        args = (jnp.asarray(prompt_padded), jnp.int32(len(prompt)),
                self.xk, self.xv, jnp.asarray(base_mask),
                jnp.asarray(initial_mask), jnp.float32(temperature),
                jnp.int32(seek), jnp.int32(seek_end),
                jnp.int32(params.max_tokens), jax.random.PRNGKey(rng_seed))
        t0 = time.perf_counter()
        if self.batcher is not None:
            res = self.batcher.submit(key, args)
        else:
            res = self._decode_window_exec(key, *args)
        dt = int((time.perf_counter() - t0) * 1e6)
        n_steps = int(res.n_tok.max()) if res.n_tok.size else 0
        self.timings.t_decode_us += dt
        self.timings.n_decode += n_steps
        self.timings.n_prompt += len(prompt)
        return res

    def _decode_window_exec(self, key, *args):
        """Execute one (unbatched) window decode for `key`."""
        from ..decoding import device_loop as DL

        fn = self._window_jit.get(key[:5])
        if fn is None:
            n_beams, bt, no_timestamps, single_segment, strategy = key[:5]
            fn = DL.make_window_decoder(
                self.hp, n_beams, bt, self.compute_dtype, no_timestamps,
                single_segment, self.vocab.token_eot, self.vocab.token_beg,
                kv_itype=self.kv_itype, strategy=strategy,
                parity=self.parity)
            self._window_jit[key[:5]] = fn
        return jax.tree.map(np.asarray, fn(self.params, *args))

    def clone_state(self) -> "WhisperContext":
        """A shallow clone sharing weights and jit caches but with its own
        per-stream mutable state (mel, encoder outputs, rolling prompt,
        timings) — one per parallel transcription chunk."""
        import copy

        sub = copy.copy(self)
        sub.timings = Timings()
        sub.mel = None
        sub.n_len_org = 0
        sub.xk = sub.xv = None
        sub.batcher = None
        sub.prompt_past0, sub.prompt_past1 = [], []
        return sub

    def decode(self, tokens_2d: np.ndarray, n_past: int, cache: M.KVCache,
               timing: str = "decode") -> Tuple[np.ndarray, M.KVCache]:
        """Batched decode of (n_beam, n_tok) tokens at positions n_past..;
        returns (last-row logits (n_beam, n_vocab) numpy, updated cache)."""
        n_beam, n_tok = tokens_2d.shape
        bt = _bucket(n_tok)
        toks = np.zeros((n_beam, bt), np.int32)
        toks[:, :n_tok] = tokens_2d
        pos = np.clip(n_past + np.arange(bt, dtype=np.int32),
                      0, self.hp.n_text_ctx - 1)[None, :].repeat(n_beam, 0)
        t0 = time.perf_counter()
        attn_ctx = next(a for a in M.attn_ctx_buckets(self.hp.n_text_ctx)
                        if a >= min(n_past + bt, self.hp.n_text_ctx))
        fn = self._get_decode(n_beam, bt, attn_ctx)
        logits, cache = fn(self.params, jnp.asarray(toks), jnp.asarray(pos),
                           jnp.int32(n_past), jnp.int32(n_tok), cache,
                           self.xk, self.xv)
        out = np.asarray(logits)
        dt = int((time.perf_counter() - t0) * 1e6)
        if n_tok == 1 and n_beam == 1:
            self.timings.t_decode_us += dt
            self.timings.n_decode += 1
        elif n_tok < 16:
            self.timings.t_batchd_us += dt
            self.timings.n_batchd += n_tok
        else:
            self.timings.t_prompt_us += dt
            self.timings.n_prompt += n_tok
        return out, cache
