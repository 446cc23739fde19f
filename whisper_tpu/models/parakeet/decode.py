"""TDT greedy transducer decode (reference: parakeet_decode,
src/parakeet.cpp:2496-2640).

TPU-first design: the reference launches one prediction graph + one joint
graph per emitted symbol/frame with host round-trips for argmax.  Here the
ENTIRE frame loop runs on-device inside one `lax.while_loop` — joint logits,
greedy argmax over vocab+blank, duration lookup, conditional LSTM update and
token emission are all traced ops; only the final packed result arrays cross
back to the host.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import model as M
from .hparams import ParakeetHParams
from .tokenizer import is_punctuation_token, is_word_start_token


@dataclass
class ParakeetTokenData:
    """parakeet_token_data (include/parakeet.h:120-137)."""

    id: int
    duration_idx: int
    duration_value: int
    frame_index: int
    p: float
    plog: float
    t0: int
    t1: int
    is_word_start: bool = False


def _tdt_greedy_decode(params: Dict[str, Any], enc: jax.Array, n_frames,
                       h0: jax.Array, c0: jax.Array, hp: ParakeetHParams,
                       max_out: int, dtype=jnp.float32,
                       capture_logits: bool = False, chunk: int = 1):
    """Run the full TDT loop on-device.

    enc: [T_max, n_state]; n_frames: actual frame count (scalar).
    Returns (tokens, frame_idx, dur_idx, dur_val, p, plog, n_out, h, c),
    plus the per-emitted-token joint logit rows [max_out, n_joint_out]
    when capture_logits (parakeet_get_logits contract: the reference
    stores one n_vocab+durations+1 row per decoded token,
    src/parakeet.cpp:2396-2404).

    chunk>1 selects the CHUNKED loop (_tdt_greedy_decode_chunked): since
    the LSTM state only changes on non-blank emissions, runs of blank
    frames share one pred_out, so each outer trip can score a
    `chunk`-frame block in one batched joint matmul and walk the
    duration-skip chain with unrolled scalar ops — ~1 trip per EMITTED
    token instead of per frame.  Probed and REJECTED as the default
    (tools/perf_tdt.py, v5e, 30 s / 375 frames / 94 emissions): the
    frame loop measures 3.61 ms/decode chained vs 5.10/5.35/8.22 ms at
    chunk=8/16/32 — an on-device while trip costs only ~8 us, so cutting
    ~470 trips to ~130 saves less than the fatter chunk body adds.  (The
    round-3 bench's 29.3 ms "decode" was tunnel RTT in an unchained
    measurement, not device time — docs/PERF.md.)  The chunked path stays
    as a verified probe: token/frame/duration/LSTM-state bit-equal to the
    frame loop (tests/test_parakeet.py::test_chunked_decode_matches_frame_loop).
    """
    if chunk > 1:
        return _tdt_greedy_decode_chunked(params, enc, n_frames, h0, c0, hp,
                                          max_out, dtype, capture_logits,
                                          chunk)
    pred_p, joint_p = params["pred"], params["joint"]
    blank_id = hp.blank_id
    n_vocab_logits = blank_id + 1
    durations = jnp.asarray(hp.tdt_durations, jnp.int32)

    # initial predict on the blank token (src/parakeet.cpp:2525-2536)
    pred_out, h, c = M.lstm_predict(pred_p, joint_p, jnp.int32(blank_id),
                                    h0, c0, hp, dtype)

    out_tok = jnp.zeros(max_out, jnp.int32)
    out_frame = jnp.zeros(max_out, jnp.int32)
    out_didx = jnp.zeros(max_out, jnp.int32)
    out_dval = jnp.zeros(max_out, jnp.int32)
    out_p = jnp.zeros(max_out, jnp.float32)
    out_plog = jnp.zeros(max_out, jnp.float32)
    # tiny placeholder when not capturing so the carry structure is static
    out_logits = jnp.zeros(
        (max_out, hp.n_joint_out) if capture_logits else (1, 1), jnp.float32)

    state = (jnp.int32(0), jnp.int32(0), jnp.int32(0), pred_out, h, c,
             out_tok, out_frame, out_didx, out_dval, out_p, out_plog,
             out_logits)

    def cond(s):
        t, n_out = s[0], s[1]
        return (t < n_frames) & (n_out < max_out)

    def body(s):
        t, n_out, emitted, pred_out, h, c, *bufs = s
        (out_tok, out_frame, out_didx, out_dval, out_p, out_plog,
         out_logits) = bufs

        logits = M.joint_logits(joint_p, enc[t], pred_out, dtype)
        tok_logits = logits[:n_vocab_logits].astype(jnp.float32)
        dur_logits = logits[n_vocab_logits:].astype(jnp.float32)

        best_tok = jnp.argmax(tok_logits).astype(jnp.int32)
        max_logit = tok_logits[best_tok]
        didx = jnp.argmax(dur_logits).astype(jnp.int32)
        dur = durations[didx]

        is_blank = best_tok == blank_id

        # ---- blank branch: advance by max(dur, 1), reset emitted counter
        def blank_case(_):
            return (t + jnp.maximum(dur, 1), n_out, jnp.int32(0),
                    pred_out, h, c,
                    out_tok, out_frame, out_didx, out_dval, out_p, out_plog,
                    out_logits)

        # ---- emit branch: store token data, advance predictor, then step t
        def emit_case(_):
            p = jnp.exp(max_logit - jax.scipy.special.logsumexp(tok_logits))
            i = n_out
            logits_buf = (out_logits.at[i].set(logits.astype(jnp.float32))
                          if capture_logits else out_logits)
            bufs2 = (out_tok.at[i].set(best_tok),
                     out_frame.at[i].set(t),
                     out_didx.at[i].set(didx),
                     out_dval.at[i].set(dur),
                     out_p.at[i].set(p),
                     out_plog.at[i].set(max_logit),
                     logits_buf)
            pred2, h2, c2 = M.lstm_predict(pred_p, joint_p, best_tok, h, c,
                                           hp, dtype)
            adv = dur > 0
            emitted2 = jnp.where(adv, 0, emitted + 1)
            force = (~adv) & (emitted2 >= hp.n_max_tokens)
            t2 = jnp.where(adv, t + dur, jnp.where(force, t + 1, t))
            emitted2 = jnp.where(force, 0, emitted2)
            return (t2, n_out + 1, emitted2, pred2, h2, c2) + bufs2

        return jax.lax.cond(is_blank, blank_case, emit_case, None)

    final = jax.lax.while_loop(cond, body, state)
    t, n_out, _, pred_out, h, c, *bufs = final
    if capture_logits:
        return (*bufs[:6], n_out, h, c, bufs[6])
    return (*bufs[:6], n_out, h, c)


def _tdt_greedy_decode_chunked(params: Dict[str, Any], enc: jax.Array,
                               n_frames, h0: jax.Array, c0: jax.Array,
                               hp: ParakeetHParams, max_out: int,
                               dtype=jnp.float32,
                               capture_logits: bool = False, K: int = 16):
    """Chunked TDT loop: one outer while_loop trip per emitted token (plus
    one per K-frame blank run) instead of per frame.

    Correctness rests on the transducer invariant that blank frames do not
    touch the prediction network (src/parakeet.cpp:2496-2640 only calls the
    pred graph on emission), so the joint logits of every frame reachable
    before the next emission are computable from the CURRENT pred_out in one
    (K, n_joint) batched matmul.  The duration-skip chain (t += max(dur,1)
    on blanks) is then walked with K unrolled scalar steps on the argmax/
    duration vectors — pure dataflow, no loop dispatch.  The encoder half of
    the joint (enc @ enc_w + enc_b) is pred-independent and hoisted out of
    the loop entirely (batched over ALL frames on the MXU).
    """
    pred_p, joint_p = params["pred"], params["joint"]
    blank_id = hp.blank_id
    n_vocab_logits = blank_id + 1
    durations = jnp.asarray(hp.tdt_durations, jnp.int32)

    # hoisted encoder projection for every frame, padded by K rows so the
    # in-loop dynamic_slice stays in bounds (padded rows are never VISITED:
    # the walk stops at t + off >= n_frames)
    enc_proj = (enc.astype(dtype) @ joint_p["enc_w"].astype(dtype).T
                + joint_p["enc_b"].astype(dtype))
    enc_proj = jnp.pad(enc_proj, ((0, K), (0, 0)))

    pred_out, h, c = M.lstm_predict(pred_p, joint_p, jnp.int32(blank_id),
                                    h0, c0, hp, dtype)

    out_tok = jnp.zeros(max_out, jnp.int32)
    out_frame = jnp.zeros(max_out, jnp.int32)
    out_didx = jnp.zeros(max_out, jnp.int32)
    out_dval = jnp.zeros(max_out, jnp.int32)
    out_p = jnp.zeros(max_out, jnp.float32)
    out_plog = jnp.zeros(max_out, jnp.float32)
    out_logits = jnp.zeros(
        (max_out, hp.n_joint_out) if capture_logits else (1, 1), jnp.float32)

    state = (jnp.int32(0), jnp.int32(0), jnp.int32(0), pred_out, h, c,
             out_tok, out_frame, out_didx, out_dval, out_p, out_plog,
             out_logits)

    def cond(s):
        t, n_out = s[0], s[1]
        return (t < n_frames) & (n_out < max_out)

    def body(s):
        t, n_out, emitted, pred_out, h, c, *bufs = s
        (out_tok, out_frame, out_didx, out_dval, out_p, out_plog,
         out_logits) = bufs

        rows = jax.lax.dynamic_slice(
            enc_proj, (t, 0), (K, enc_proj.shape[1]))
        logits_K = (jax.nn.relu(rows + pred_out[None])
                    @ joint_p["net_w"].astype(dtype).T
                    + joint_p["net_b"].astype(dtype))
        tokK = jnp.argmax(
            logits_K[:, :n_vocab_logits], axis=1).astype(jnp.int32)
        didxK = jnp.argmax(
            logits_K[:, n_vocab_logits:], axis=1).astype(jnp.int32)
        durK = durations[didxK]
        blankK = tokK == blank_id

        # walk the duration-skip chain: each blank advances >= 1, so K
        # unrolled steps fully resolve the chunk (no loop dispatch)
        off = jnp.int32(0)
        emit = jnp.bool_(False)
        done = jnp.bool_(False)
        for _ in range(K):
            offc = jnp.minimum(off, K - 1)
            cur_blank = blankK[offc]
            cur_dur = durK[offc]
            visit = (~done) & (t + off < n_frames) & (off < K)
            is_emit = visit & (~cur_blank)
            emit = emit | is_emit
            done = done | is_emit | (~visit)
            off = jnp.where(visit & cur_blank,
                            off + jnp.maximum(cur_dur, 1), off)

        offc = jnp.minimum(off, K - 1)

        # ---- blank-only chunk: t advances by the walked distance; any
        # visited blank resets the consecutive-emission counter
        def blank_case(_):
            return (t + off, n_out, jnp.int32(0), pred_out, h, c,
                    out_tok, out_frame, out_didx, out_dval, out_p, out_plog,
                    out_logits)

        # ---- emit at t + off (src/parakeet.cpp emit semantics verbatim)
        def emit_case(_):
            row = logits_K[offc].astype(jnp.float32)
            tok_logits = row[:n_vocab_logits]
            best_tok = tokK[offc]
            max_logit = tok_logits[best_tok]
            didx = didxK[offc]
            dur = durK[offc]
            t_at = t + off
            p = jnp.exp(max_logit - jax.scipy.special.logsumexp(tok_logits))
            i = n_out
            logits_buf = (out_logits.at[i].set(row)
                          if capture_logits else out_logits)
            bufs2 = (out_tok.at[i].set(best_tok),
                     out_frame.at[i].set(t_at),
                     out_didx.at[i].set(didx),
                     out_dval.at[i].set(dur),
                     out_p.at[i].set(p),
                     out_plog.at[i].set(max_logit),
                     logits_buf)
            pred2, h2, c2 = M.lstm_predict(pred_p, joint_p, best_tok, h, c,
                                           hp, dtype)
            # blanks visited before the emission reset the counter
            emitted_eff = jnp.where(off > 0, 0, emitted)
            adv = dur > 0
            emitted2 = jnp.where(adv, 0, emitted_eff + 1)
            force = (~adv) & (emitted2 >= hp.n_max_tokens)
            t2 = jnp.where(adv, t_at + dur,
                           jnp.where(force, t_at + 1, t_at))
            emitted2 = jnp.where(force, 0, emitted2)
            return (t2, n_out + 1, emitted2, pred2, h2, c2) + bufs2

        return jax.lax.cond(emit, emit_case, blank_case, None)

    final = jax.lax.while_loop(cond, body, state)
    t, n_out, _, pred_out, h, c, *bufs = final
    if capture_logits:
        return (*bufs[:6], n_out, h, c, bufs[6])
    return (*bufs[:6], n_out, h, c)


tdt_greedy_decode = partial(
    jax.jit,
    static_argnames=("hp", "max_out", "dtype", "capture_logits", "chunk"))(
    _tdt_greedy_decode)


@partial(jax.jit, static_argnames=("hp", "max_out", "dtype"))
def tdt_greedy_decode_batch(params, enc_b, n_frames_b, h0_b, c0_b,
                            hp: ParakeetHParams, max_out: int,
                            dtype=jnp.float32):
    """Batched TDT decode: the whole greedy loop vmapped over utterances —
    the joint/prediction matmuls batch on the MXU and the per-utterance
    while_loops run in lockstep (continuous batching for the transducer)."""
    return jax.vmap(
        lambda e, n, h, c: _tdt_greedy_decode(params, e, n, h, c, hp,
                                              max_out, dtype)
    )(enc_b, n_frames_b, h0_b, c0_b)


def unpack_token_data(vocab, sub: int, tok, frame, didx, dval, p, plog,
                      n: int) -> List[ParakeetTokenData]:
    """Host-side unpack of the device loop's packed result arrays into
    parakeet_token_data records (include/parakeet.h:120-137)."""
    tok, frame = np.asarray(tok[:n]), np.asarray(frame[:n])
    didx, dval = np.asarray(didx[:n]), np.asarray(dval[:n])
    p, plog = np.asarray(p[:n]), np.asarray(plog[:n])
    out = []
    for i in range(n):
        out.append(ParakeetTokenData(
            id=int(tok[i]), duration_idx=int(didx[i]),
            duration_value=int(dval[i]), frame_index=int(frame[i]),
            p=float(p[i]), plog=float(plog[i]),
            t0=int(frame[i]) * sub, t1=(int(frame[i]) + int(dval[i])) * sub,
            is_word_start=is_word_start_token(vocab, int(tok[i]))))
    return out


class TdtDecoder:
    """Host wrapper: runs the device loop, unpacks parakeet_token_data."""

    def __init__(self, model, dtype=jnp.float32):
        self.model = model
        self.hp = model.hparams
        self.dtype = dtype
        self.params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, dtype), model.params)
        D, L = self.hp.n_pred_dim, self.hp.n_pred_layers
        self.h = jnp.zeros((L, D), dtype)
        self.c = jnp.zeros((L, D), dtype)
        self.last_logits: Any = None  # np [n_out, n_joint_out] when captured

    def clone(self) -> "TdtDecoder":
        """A fresh-LSTM decoder sharing the device weight arrays — the
        per-state half of parakeet_init_state (include/parakeet.h:93)."""
        d = object.__new__(TdtDecoder)
        d.model, d.hp, d.dtype = self.model, self.hp, self.dtype
        d.params = self.params
        d.h = jnp.zeros_like(self.h)
        d.c = jnp.zeros_like(self.c)
        d.last_logits = None
        return d

    def reset_state(self) -> None:
        """parakeet_reset_state LSTM clear (src/parakeet.cpp:3552-3560)."""
        self.h = jnp.zeros_like(self.h)
        self.c = jnp.zeros_like(self.c)

    def decode(self, enc: jax.Array, n_frames: int,
               capture_logits: bool = False) -> List[ParakeetTokenData]:
        hp = self.hp
        max_out = int(min(n_frames * hp.n_max_tokens, 4 * n_frames + 64))
        max_out = max(max_out, 16)
        out = tdt_greedy_decode(self.params, enc, jnp.int32(n_frames),
                                self.h, self.c, hp, max_out, self.dtype,
                                capture_logits=capture_logits)
        (tok, frame, didx, dval, p, plog, n_out, self.h, self.c) = out[:9]
        if capture_logits:
            self.last_logits = np.asarray(out[9][: int(n_out)])
        return unpack_token_data(self.model.vocab, hp.subsampling_factor,
                                 tok, frame, didx, dval, p, plog, int(n_out))


def refine_timestamps_tdt(vocab, tokens: List[ParakeetTokenData]) -> None:
    """Collapse punctuation-token durations (src/parakeet.cpp:2449-2471)."""
    last_t1 = -1
    for td in tokens:
        if is_punctuation_token(vocab, td.id):
            if last_t1 >= 0:
                td.t0 = last_t1
                td.t1 = last_t1
        else:
            last_t1 = td.t1
