#!/usr/bin/env python
"""whisper_tpu benchmark — prints ONE JSON line with the headline metric.

Mirrors whisper-bench (reference examples/bench/bench.cpp:64-120): full
encoder pass, per-token decode, 5-lane batch decode, 256-token prompt — on
synthetic weights at real model dims (timing does not depend on weight
values).  Headline: end-to-end realtime factor per chip for a 30 s window
assuming 64 decoded tokens/window (typical speech density).

Timing methodology: this TPU runtime is reached over a tunnel whose host
round-trip (~30 ms) dwarfs small kernels, and buffer-ready events resolve
optimistically, so each measurement runs the op K times *chained inside one
jit* (data dependency between iterations), forces a scalar readback, and
derives per-op time from two chain lengths — the RTT cancels.

vs_baseline: the reference's best comparable published number — NVIDIA V100
large-v2-q5_0: enc 94.65 ms + 64 x 6.60 ms decode = 0.517 s / 30 s window
= 58.0x realtime (scripts/bench-all-gg.txt:409).
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

from whisper_tpu.models.whisper import model as M
from whisper_tpu.models.whisper import hparams as H
from whisper_tpu.utils.synth import synth_params

BASELINE_RTF = 30.0 / (0.09465 + 64 * 0.00660)  # V100 large-v2-q5_0

DIMS = {
    "tiny": H.TINY, "base": H.BASE, "small": H.SMALL, "medium": H.MEDIUM,
    "large-v3": H.LARGE_V3, "large-v3-turbo": H.LARGE_V3_TURBO,
}


def _timed(fn, *args, reps=3):
    """min wall time of fn(*args) ending in a scalar readback."""
    np.asarray(fn(*args))  # warm / compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def _per_op_ms(chain, k1, k2, args_fn, reps=3):
    """Per-op ms from two chain lengths (RTT cancels).  `chain` takes the
    iteration count as its first (traced) argument — one compile total."""
    t1 = _timed(chain, jnp.int32(k1), *args_fn(), reps=reps)
    t2 = _timed(chain, jnp.int32(k2), *args_fn(), reps=reps)
    return max(0.0, (t2 - t1) / (k2 - k1)) * 1000


def bench_model(name: str, hp, n_dec_tokens: int = 64):
    dtype = jnp.bfloat16
    params = synth_params(hp, dtype)
    mel = jax.random.normal(jax.random.PRNGKey(1),
                            (hp.n_mels, 2 * hp.n_audio_ctx), jnp.float32)

    # ---- encoder (+ cross-KV precompute, as whisper_encode_internal does) --
    @jax.jit
    def enc_chain(K, params, mel):
        def body(i, m):
            enc = M.encode(params, m, hp, dtype=dtype)
            xk, xv = M.compute_cross_kv(params, enc, hp, dtype=dtype)
            return m + (xk.mean() * 1e-12).astype(m.dtype)
        return jax.lax.fori_loop(0, K, body, mel).mean()

    # reps=6 on the headline-critical rows: the tunnel adds run-to-run
    # jitter and min-of-N converges on the true schedule time; reps are
    # cheap next to compiles
    enc_ms = _per_op_ms(enc_chain, 2, 6, lambda: (params, mel), reps=6)

    # device mel (audio/mel._log_mel_jax, the TPU 'auto' context path):
    # informational — the serving headline stays enc+decode for round-over-
    # round comparability (the reference's bench is encoder-only too); the
    # host-numpy mel this replaced cost ~40 ms/30 s
    from whisper_tpu.audio.mel import _log_mel_jax, hann_window, pad_audio

    pcm30 = np.random.default_rng(3).standard_normal(
        16000 * 30).astype(np.float32) * 0.1
    padded30 = jnp.asarray(pad_audio(pcm30))
    n_len30 = (padded30.shape[0] - 400) // 160
    filt_j = jnp.asarray(np.random.default_rng(4).standard_normal(
        (hp.n_mels, 201)).astype(np.float32) * 0.01)
    win_j = jnp.asarray(hann_window())

    @jax.jit
    def mel_chain(K, x):
        def body(i, x):
            m = _log_mel_jax(x, filt_j, win_j, n_len30)
            return x + (m.sum() * 1e-12).astype(x.dtype)
        return jax.lax.fori_loop(0, K, body, x).sum()

    mel_ms = _per_op_ms(mel_chain, 2, 6, lambda: (padded30,))

    # precomputed cross-KV for the decode benches
    @jax.jit
    def encode_fn(params, mel):
        enc = M.encode(params, mel, hp, dtype=dtype)
        return M.compute_cross_kv(params, enc, hp, dtype=dtype)

    xk, xv = encode_fn(params, mel)

    # ---- decode: n-lane greedy token loop ---------------------------------
    def make_dec_chain(n_beam, q8=False):
        @jax.jit
        def chain(K, params, xk, xv):
            cache = (M.new_cache(hp, n_beam, dtype, itype="q8") if q8
                     else M.KVCache.zeros(hp, n_beam, dtype))

            def body(i, carry):
                cache, tok = carry
                pos = jnp.clip(i, 0, hp.n_text_ctx - 1) * jnp.ones(
                    (n_beam, 1), jnp.int32)
                # static first-bucket context, exactly what the production
                # segmented loop (device_loop.segmented_loop) runs for the
                # first 128 steps — this chain decodes <=128 tokens
                logits, cache = M.decode_step(
                    params, tok, pos, i, cache, xk, xv, hp, dtype=dtype,
                    attn_ctx=M.attn_ctx_buckets(hp.n_text_ctx)[0])
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return cache, tok

            cache, tok = jax.lax.fori_loop(
                0, K, body, (cache, jnp.zeros((n_beam, 1), jnp.int32)))
            return tok.sum()
        return chain

    # chain lengths must stay within the first bucket the chains decode at
    # (occupancy at step i is i+1; the longest chain runs K=128 steps)
    assert 128 <= M.attn_ctx_buckets(hp.n_text_ctx)[0], hp.n_text_ctx
    dec_ms = _per_op_ms(make_dec_chain(1), 32, 128, lambda: (params, xk, xv))
    bch5_ms = _per_op_ms(make_dec_chain(5), 16, 64, lambda: (params, xk, xv))

    # ---- packed Q5_0 decode (fused dequant-matmul Pallas path) -------------
    # This is how a q5_0 model file actually runs on TPU: decoder weights
    # stay block-quantized in HBM (ops/qmm.py).  Packed planes are
    # synthesized ON DEVICE (host->device transfer over the tunnel is slow).
    from whisper_tpu.models.whisper.load import PACKED_DEC_KEYS
    from whisper_tpu.ops.qmm import QWeight, QWeightT

    key = jax.random.PRNGKey(2)

    def synth_qweight(shape_out_in):
        nonlocal key
        key, k1, k2 = jax.random.split(key, 3)
        r, k = shape_out_in
        codes = jax.random.randint(k1, (r, k), -16, 16, jnp.int8)
        scales = jax.random.uniform(k2, (r, k // 32), jnp.float32) * 0.02
        return QWeight(codes, scales)

    packed = dict(params)
    packed["dec"] = dict(params["dec"])
    packed["dec"]["blocks"] = dict(params["dec"]["blocks"])
    # block weights ride TRANSPOSED planes as PER-LAYER buffers (QWeightT ->
    # qmmt streaming kernel; whole-parameter operands alias into the Pallas
    # call — stacked planes would cost an int8 copy per layer per step),
    # matching what WhisperContext installs for a quantized file
    L = params["dec"]["blocks"]["qkv_b"].shape[0]
    blocks_packed = [dict() for _ in range(L)]
    for kname in PACKED_DEC_KEYS:
        w = params["dec"]["blocks"][kname]  # [L, in, out]
        _, i_dim, o_dim = w.shape
        for l in range(L):
            q = synth_qweight((o_dim, i_dim))
            blocks_packed[l][kname] = QWeightT(
                jnp.swapaxes(q.codes, 0, 1) + 0,
                jnp.swapaxes(q.scales, 0, 1) + 0)
        del packed["dec"]["blocks"][kname]
    packed["dec"]["blocks_packed"] = blocks_packed
    te = synth_qweight(params["dec"]["tok_embd"].shape)
    packed["dec"]["tok_embd"] = te
    # transposed planes for the logits head's streaming kernel (ops/qmm.py)
    packed["dec"]["tok_embd_t"] = QWeightT(te.codes.T + 0, te.scales.T + 0)

    dec_q_ms = _per_op_ms(make_dec_chain(1), 32, 128, lambda: (packed, xk, xv))
    bch5_q_ms = _per_op_ms(make_dec_chain(5), 16, 64, lambda: (packed, xk, xv))

    # ---- W=1 with the serving path's int8 cache formats (q8 self-cache —
    # engages the Pallas decode-attn kernel — + int8 cross-KV planes):
    # the W=1 step is stream-bound and the dense-f16 cross-KV read is its
    # second-largest stream (0.43 ms of 2.62 — tools/perf_w1.py knockouts,
    # docs/PERF.md W=1 anatomy); int8 halves it
    @jax.jit
    def quantize_cross(xk, xv):
        from whisper_tpu.models.whisper.model import XK8, _quantize_rows
        kq, ks = _quantize_rows(xk)
        vq, vs = _quantize_rows(xv)
        return XK8(kq, ks), XK8(vq, vs)

    xk8, xv8 = quantize_cross(xk, xv)
    dec_q8_ms = _per_op_ms(make_dec_chain(1, q8=True), 32, 128,
                           lambda: (packed, xk8, xv8), reps=6)

    # ---- batched serving: W windows decoded in lockstep --------------------
    # Continuous batching (runtime/batching.py) amortizes the decoder weight
    # reads across windows.  Windows ride decode_step's beam axis NATIVELY
    # (device_loop.decode_windows_native) — per-window cross-KV, one shared
    # in-place KV cache (L, W, C, 2S) — which keeps the per-layer cache
    # update a single non-copying dynamic_update_slice.  Cross-KV AND the
    # self-attention cache are stored INT8 (model.py XK8 / KVCache8):
    # per-position scales factor out of the attention matmuls exactly,
    # halving the decode's dominant HBM streams and the per-window memory
    # (which is what lets W=16 fit on one chip; measured sweep with both
    # int8: W=16 454x, W=24 393x, W=32 349x rt/chip; f16 self-cache:
    # W=8 358x, W=16 372x).
    W = 16

    @jax.jit
    def batched_chain(K, params, xkb, xvb):
        def body(i, carry):
            cache, tok = carry
            pos = jnp.clip(i, 0, hp.n_text_ctx - 1) * jnp.ones((W, 1),
                                                               jnp.int32)
            # static first-bucket context (segmented-loop regime for a
            # typical 64-token window; see device_loop.segmented_loop)
            logits, cache = M.decode_step(params, tok, pos, i, cache,
                                          xkb, xvb, hp, dtype=dtype,
                                          attn_ctx=M.attn_ctx_buckets(
                                              hp.n_text_ctx)[0])
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return cache, tok

        cache0 = M.new_cache(hp, W, dtype, itype="q8")
        cache, tok = jax.lax.fori_loop(
            0, K, body, (cache0, jnp.zeros((W, 1), jnp.int32)))
        return tok.sum()

    # per-window int8 cross-KV (L, W, H, Tc, d), materialized so HBM
    # traffic is honest
    def per_window(t):
        return jax.tree.map(
            lambda a: jnp.broadcast_to(
                a[:, None], (a.shape[0], W) + a.shape[1:]) + 0, t)

    xkb = per_window(xk8)
    xvb = per_window(xv8)
    dec_b_ms = _per_op_ms(batched_chain, 16, 64, lambda: (params, xkb, xvb),
                          reps=6)
    dec_b_per_window_ms = dec_b_ms / W
    # packed Q5_0 serving: same W-window lockstep loop with block-quantized
    # decoder weights — the weight read already amortizes over windows, so
    # halving it (int8 vs bf16) moves the whole step
    dec_bq_ms = _per_op_ms(batched_chain, 16, 64,
                           lambda: (packed, xkb, xvb), reps=6)
    dec_bq_per_window_ms = dec_bq_ms / W

    # ---- batched encoder (informational): vmapping W encodes into one
    # device call does NOT pay on this chip — the encoder is compute-bound
    # at T=1500 so weight-read amortization is negligible and the W-times
    # working set costs more than it saves (measured 26.1 vs 20.5 ms/window
    # at W=16 on v5e).  This is why the serving runtime
    # (runtime/batching.py) batches only the decode loops and runs encodes
    # solo; the headline charges whichever encode path is faster.
    @jax.jit
    def enc_b_chain(K, params, melb):
        def body(i, m):
            enc = jax.vmap(lambda mm: M.encode(params, mm, hp,
                                               dtype=dtype))(m)
            xkw, _ = jax.vmap(lambda e: M.compute_cross_kv(
                params, e, hp, dtype=dtype))(enc)
            return m + (xkw.mean() * 1e-12).astype(m.dtype)
        return jax.lax.fori_loop(0, K, body, melb).mean()

    melb = jnp.broadcast_to(mel, (W,) + mel.shape) * (
        1.0 + jnp.arange(W, dtype=jnp.float32)[:, None, None] * 1e-3)
    enc_b_per_window_ms = _per_op_ms(enc_b_chain, 2, 6,
                                     lambda: (params, melb), reps=6) / W

    # ---- 256-token prompt --------------------------------------------------
    @jax.jit
    def prompt_chain(K, params, xk, xv):
        def body(i, acc):
            cache = M.KVCache.zeros(hp, 1, dtype)
            toks = (jnp.zeros((1, 256), jnp.int32) +
                    (acc.astype(jnp.int32) % 2))
            pos = jnp.arange(256, dtype=jnp.int32)[None, :]
            logits, _ = M.decode_step(params, toks, pos, jnp.int32(0),
                                      cache, xk, xv, hp, dtype=dtype)
            return acc + logits.mean() * 1e-12
        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    prompt_ms = _per_op_ms(prompt_chain, 1, 4, lambda: (params, xk, xv))

    # headline uses the better decode path (dense bf16 vs packed q5_0) — a
    # q5_0 checkpoint runs whichever the context selects
    dec_best = min(dec_ms, dec_q_ms, dec_q8_ms) if dec_q_ms > 0 else dec_ms
    window_s = (enc_ms + n_dec_tokens * dec_best) / 1000.0
    rtf = 30.0 / window_s if window_s > 0 else 0.0
    # batched serving RTF: W windows in flight; the decode loop runs as one
    # native-batched device call, encodes take the faster of solo/vmapped.
    # The NORTH-STAR config (BASELINE.md: large-v3 q5_0) is the packed
    # serving number; the headline reports it when it wins.
    dec_b_best = (min(dec_b_per_window_ms, dec_bq_per_window_ms)
                  if dec_bq_per_window_ms > 0 else dec_b_per_window_ms)
    window_b_s = (min(enc_ms, enc_b_per_window_ms) +
                  n_dec_tokens * dec_b_best) / 1000.0
    rtf_batched = 30.0 / window_b_s if window_b_s > 0 else 0.0
    return dict(model=name, mel_ms=round(mel_ms, 2),
                enc_ms=round(enc_ms, 2), dec_ms=round(dec_ms, 3),
                dec_q_ms=round(dec_q_ms, 3), dec_q8_ms=round(dec_q8_ms, 3),
                bch5_ms=round(bch5_ms, 3),
                bch5_q_ms=round(bch5_q_ms, 3), prompt_ms=round(prompt_ms, 2),
                dec_b_ms=round(dec_b_per_window_ms, 3),
                dec_bq_ms=round(dec_bq_per_window_ms, 3),
                enc_b_ms=round(enc_b_per_window_ms, 2), n_windows=W,
                packed_decode=bool(dec_q_ms > 0 and dec_q_ms < dec_ms),
                packed_serving=bool(dec_bq_per_window_ms > 0 and
                                    dec_bq_per_window_ms < dec_b_per_window_ms),
                rtf=round(rtf, 1), rtf_batched=round(rtf_batched, 1))


def bench_parakeet():
    """Parakeet-TDT rows (BASELINE config 5 names the Parakeet variant):
    real parakeet-tdt-0.6b dims, synthetic weights, 30 s of audio —
    encoder ms, on-device TDT decode ms, dense bf16 vs packed q5_0
    conformer weights (models/parakeet/model.PQW)."""
    from whisper_tpu.formats import quants
    from whisper_tpu.models.parakeet import model as PM
    from whisper_tpu.models.parakeet.hparams import ParakeetHParams
    from whisper_tpu.models.parakeet.load import (PACKED_LAYER_KEYS,
                                                  build_param_pytree)
    from whisper_tpu.models.parakeet.writer import synth_parakeet_tensors

    hp = ParakeetHParams()
    dtype = jnp.bfloat16
    tensors = synth_parakeet_tensors(hp)
    params_np = build_param_pytree(tensors, hp)
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, dtype),
                                    params_np)

    mel = np.random.default_rng(0).standard_normal(
        (3001, hp.n_mels)).astype(np.float32) * 0.3  # 30 s at 10 ms hop
    mel_j = jnp.asarray(mel, dtype)

    @jax.jit
    def enc_chain(K, params, mel):
        def body(i, m):
            e = PM.encode(params, m, mel.shape[0], hp, dtype=dtype)
            return m + (e.mean() * 1e-12).astype(m.dtype)
        return jax.lax.fori_loop(0, K, body, mel).mean()

    enc_ms = _per_op_ms(enc_chain, 1, 3, lambda: (params, mel_j))

    # device mel (models/parakeet/mel._log_mel_jax — the TPU 'auto' path):
    # pcm -> normalized log-mel for the 30 s utterance, chained.  The host
    # numpy mel costs ~40 ms/30 s, 5x the whole encode+decode, so the e2e
    # RTF is quoted mel-INCLUSIVE with the device path.
    from whisper_tpu.models.parakeet.mel import _log_mel_jax

    n_samp = 30 * 16000
    pcm = jnp.asarray(np.random.default_rng(1).standard_normal(n_samp)
                      .astype(np.float32) * 0.1)
    pad = hp.n_fft // 2
    n_len_b = (n_samp + 2 * pad - hp.n_fft) // 160 + 1
    filt = jnp.asarray(tensors["filters"] if "filters" in tensors else
                       np.random.default_rng(2).standard_normal(
                           (hp.n_mels, hp.n_fft // 2 + 1)).astype(np.float32)
                       * 0.01)
    win = jnp.asarray(np.hanning(hp.n_fft).astype(np.float32))

    @jax.jit
    def mel_chain(K, pcm):
        def body(i, x):
            m = _log_mel_jax(x, jnp.int32(n_samp),
                             jnp.int32(min(n_samp // 160, n_len_b)),
                             filt, win, hp.n_fft, 160, n_len_b, hp.n_fft)
            return x + (m.sum() * 1e-12).astype(x.dtype)
        return jax.lax.fori_loop(0, K, body, pcm).sum()

    mel_ms = _per_op_ms(mel_chain, 2, 6, lambda: (pcm,))

    # TDT decode over the whole utterance (one on-device while_loop)
    enc = jax.jit(lambda p, m: PM.encode(p, m, mel.shape[0], hp,
                                         dtype=dtype))(params, mel_j)
    n_frames = (mel.shape[0] + hp.subsampling_factor - 1) \
        // hp.subsampling_factor
    D, L = hp.n_pred_dim, hp.n_pred_layers
    h0 = jnp.zeros((L, D), dtype)
    c0 = jnp.zeros((L, D), dtype)

    # chained like every other measurement (the round-3 single-call timing
    # reported ~29 ms — that was tunnel RTT, not device time; the chained
    # decode measures 3.6 ms on v5e — tools/perf_tdt.py, docs/PERF.md)
    from whisper_tpu.models.parakeet.decode import _tdt_greedy_decode

    @jax.jit
    def dec_chain(K, params, enc):
        def body(i, carry):
            e, acc = carry
            out = _tdt_greedy_decode(params, e, jnp.int32(n_frames), h0, c0,
                                     hp, 512, dtype)
            return e + (out[6].astype(dtype) * 1e-12), acc + out[6]
        e, acc = jax.lax.fori_loop(0, K, body, (enc, jnp.int32(0)))
        return acc + (e.sum() * 0).astype(jnp.int32)

    dec_ms = _per_op_ms(dec_chain, 1, 3, lambda: (params, enc))

    # packed q5_0 conformer weights
    def to_pqw(name_key):
        src = params_np["layers"][name_key]  # (L, out, in) f32
        codes, scales = [], []
        for l in range(src.shape[0]):
            buf = quants.quantize(np.ascontiguousarray(src[l]),
                                  quants.GGML_TYPE_Q5_0)
            qt = quants.unpack_to_planes(buf, quants.GGML_TYPE_Q5_0,
                                         src[l].shape)
            codes.append(qt.codes)
            scales.append(qt.scales)
        return PM.PQW(jnp.asarray(np.stack(codes), jnp.int8),
                      jnp.asarray(np.stack(scales), jnp.float32))

    packed = dict(params)
    packed["layers"] = dict(params["layers"])
    for key in PACKED_LAYER_KEYS:
        packed["layers"][key] = to_pqw(key)
    enc_q_ms = _per_op_ms(enc_chain, 1, 3, lambda: (packed, mel_j))

    return dict(pk_enc_ms=round(enc_ms, 2), pk_enc_q5_ms=round(enc_q_ms, 2),
                pk_dec_ms=round(dec_ms, 2), pk_mel_ms=round(mel_ms, 2),
                pk_rtf=round(
                    30_000.0 / (mel_ms + min(enc_ms, enc_q_ms) + dec_ms), 1))


def main():
    name = os.environ.get("WTPU_BENCH_MODEL", "large-v3")
    hp = DIMS[name]
    r = bench_model(name, hp)
    # large-v3-turbo rows in the SAME run (VERDICT r4 #6): the reference's
    # flagship fast config (V100 turbo-q5_0: 79.6 ms enc, 1.03 ms/tok —
    # BASELINE.md); its 4-layer decoder is where the single-stream and
    # serving numbers move
    tb = {}
    if (os.environ.get("WTPU_BENCH_TURBO", "1") != "0"
            and name != "large-v3-turbo"):
        tb = bench_model("large-v3-turbo", DIMS["large-v3-turbo"])
    pk = (bench_parakeet()
          if os.environ.get("WTPU_BENCH_PARAKEET", "1") != "0" else {})
    dec_used = (min(r["dec_ms"], r["dec_q_ms"], r["dec_q8_ms"])
                if r["dec_q_ms"] > 0 else r["dec_ms"])
    path = ("q5_0-packed+q8kv" if r["dec_q8_ms"] == dec_used
            else "q5_0-packed" if r["packed_decode"] else "bf16")
    spath = "q5_0-packed" if r["packed_serving"] else "bf16"
    dec_b_used = (min(r["dec_b_ms"], r["dec_bq_ms"]) if r["dec_bq_ms"] > 0
                  else r["dec_b_ms"])
    print(json.dumps({
        "metric": f"e2e realtime factor, {name} {spath} batched serving, "
                  f"1 chip ({r['n_windows']}-window lockstep decode at "
                  f"{dec_b_used}ms/tok/window [dense {r['dec_b_ms']}, packed "
                  f"{r['dec_bq_ms']}] + solo enc {r['enc_ms']}ms (device mel "
                  f"{r['mel_ms']}ms), 64 tok/"
                  f"window; single-stream {path}: enc + 64tok x {dec_used}ms "
                  f"[dense {r['dec_ms']}, packed {r['dec_q_ms']}, "
                  f"packed+q8kv {r['dec_q8_ms']}] = "
                  f"{r['rtf']}x; bch5 {r['bch5_ms']}/{r['bch5_q_ms']}ms/tok, "
                  f"prompt256 {r['prompt_ms']}ms; vmapped-enc "
                  f"{r['enc_b_ms']}ms/window"
                  + ((lambda td: f"; large-v3-turbo: enc {tb['enc_ms']}ms, "
                      f"single-stream {td}ms/tok [dense {tb['dec_ms']}, "
                      f"packed {tb['dec_q_ms']}, packed+q8kv "
                      f"{tb['dec_q8_ms']}] = {tb['rtf']}x, serving "
                      f"{tb['rtf_batched']}x")(
                         min(tb['dec_ms'], tb['dec_q_ms'], tb['dec_q8_ms'])
                         if tb['dec_q_ms'] > 0 else tb['dec_ms'])
                     if tb else "")
                  + (f"; parakeet-tdt-0.6b 30s: mel {pk['pk_mel_ms']}ms + "
                     f"enc {pk['pk_enc_ms']}ms bf16 / {pk['pk_enc_q5_ms']}ms "
                     f"packed-q5_0 + TDT decode {pk['pk_dec_ms']}ms -> "
                     f"{pk['pk_rtf']}x e2e"
                     if pk else "") + ")",
        "value": r["rtf_batched"],
        "unit": "x realtime",
        "vs_baseline": round(r["rtf_batched"] / BASELINE_RTF, 3),
    }))


if __name__ == "__main__":
    main()
