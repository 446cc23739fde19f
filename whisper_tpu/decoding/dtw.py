"""DTW token-level timestamps from cross-attention alignment heads.

Reference: per-model alignment-head tables (src/whisper.cpp:384-410), decoder
re-run saving cross-attn softmax weights of selected heads (:2727-2742),
median filter (:8968-9001), DTW + backtrace (:8878-8962), and the driver
`whisper_exp_compute_token_level_timestamps_dtw` (:9003-9165).

TPU-first: the reference re-runs the decoder via the scheduler collecting
per-layer masked QK products; here one jitted full-sequence decoder pass
returns the softmax cross-attention weights of every layer, and the selected
(layer, head) planes are gathered on the host.  DTW itself is O(N*M) host
numpy — N, M are tiny (tokens x 1500).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.whisper import model as M
from ..models.whisper.hparams import WhisperHParams

# alignment-head presets (src/whisper.cpp:384-397), keyed by model name
AHEADS_PRESETS: Dict[str, Tuple[Tuple[int, int], ...]] = {
    "tiny.en": ((1, 0), (2, 0), (2, 5), (3, 0), (3, 1), (3, 2), (3, 3), (3, 4)),
    "tiny": ((2, 2), (3, 0), (3, 2), (3, 3), (3, 4), (3, 5)),
    "base.en": ((3, 3), (4, 7), (5, 1), (5, 5), (5, 7)),
    "base": ((3, 1), (4, 2), (4, 3), (4, 7), (5, 1), (5, 2), (5, 4), (5, 6)),
    "small.en": ((6, 6), (7, 0), (7, 3), (7, 8), (8, 2), (8, 5), (8, 7),
                 (9, 0), (9, 4), (9, 8), (9, 10), (10, 0), (10, 1), (10, 2),
                 (10, 3), (10, 6), (10, 11), (11, 2), (11, 4)),
    "small": ((5, 3), (5, 9), (8, 0), (8, 4), (8, 7), (8, 8), (9, 0), (9, 7),
              (9, 9), (10, 5)),
    "medium.en": ((11, 4), (14, 1), (14, 12), (14, 14), (15, 4), (16, 0),
                  (16, 4), (16, 9), (17, 12), (17, 14), (18, 7), (18, 10),
                  (18, 15), (20, 0), (20, 3), (20, 9), (20, 14), (21, 12)),
    "medium": ((13, 15), (15, 4), (15, 15), (16, 1), (20, 0), (23, 4)),
    "large-v1": ((9, 19), (11, 2), (11, 4), (11, 17), (22, 7), (22, 11),
                 (22, 17), (23, 2), (23, 15)),
    "large-v2": ((10, 12), (13, 17), (16, 11), (16, 12), (16, 13), (17, 15),
                 (17, 16), (18, 4), (18, 11), (18, 19), (19, 11), (21, 2),
                 (21, 3), (22, 3), (22, 9), (22, 12), (23, 5), (23, 7),
                 (23, 13), (25, 5), (26, 1), (26, 12), (27, 15)),
    "large-v3": ((7, 0), (10, 17), (12, 18), (13, 12), (16, 1), (17, 14),
                 (19, 11), (21, 4), (24, 1), (25, 6)),
    "large-v3-turbo": ((2, 4), (2, 11), (3, 3), (3, 6), (3, 11), (3, 14)),
}


def resolve_aheads(hp: WhisperHParams, preset: str = "auto",
                   n_top_most: int = 0,
                   custom: Optional[Sequence[Tuple[int, int]]] = None
                   ) -> List[Tuple[int, int]]:
    """Map a preset name / N_TOP_MOST / custom list to (layer, head) pairs
    (aheads_masks_init, src/whisper.cpp:1160-1283)."""
    if custom:
        heads = list(custom)
    elif n_top_most > 0:
        heads = [(l, h)
                 for l in range(hp.n_text_layer - n_top_most, hp.n_text_layer)
                 for h in range(hp.n_text_head)]
    else:
        name = hp.model_name if preset == "auto" else preset
        if name not in AHEADS_PRESETS:
            raise ValueError(
                f"no alignment-head preset for model '{name}' "
                f"(use n_top_most or custom heads for non-standard models)")
        heads = list(AHEADS_PRESETS[name])
    for l, h in heads:
        if not (0 <= l < hp.n_text_layer and 0 <= h < hp.n_text_head):
            raise ValueError(
                f"invalid alignment head (layer {l}, head {h}) for a model "
                f"with {hp.n_text_layer} layers / {hp.n_text_head} heads")
    return heads


@partial(jax.jit, static_argnames=("hp", "dtype"))
def _alignment_weights_all(params, tokens, positions, xk, xv,
                           hp: WhisperHParams, dtype=jnp.float32):
    """Full-sequence decoder pass returning cross-attn softmax weights of
    every layer: (n_layer, n_head, n_tokens, n_audio_ctx)."""
    dec = params["dec"]
    n_tok = tokens.shape[0]
    n_head = hp.n_text_head
    eps = hp.eps

    from ..ops.qmm import QWeight, embed_lookup

    tok_embd = dec["tok_embd"]
    emb = (embed_lookup(tok_embd, tokens) if isinstance(tok_embd, QWeight)
           else tok_embd[tokens])
    x = (emb + dec["pos_embd"][positions]
         ).astype(jnp.float32)[None]  # (1, T, S)

    i = jnp.arange(n_tok)
    mask = jnp.where(i[None, :] <= i[:, None], 0.0, -jnp.inf
                     ).astype(jnp.float32)[None, None]  # (1,1,T,T)

    n_state = hp.n_text_state

    def body(x, layer):
        blk, cxk, cxv = layer
        h = M.layer_norm(x, blk["attn_ln_w"], blk["attn_ln_b"], eps)
        qkv = M._mm(h, blk["qkv_w"], dtype) + blk["qkv_b"]
        q = qkv[..., :n_state]
        k = qkv[..., n_state:2 * n_state]
        v = qkv[..., 2 * n_state:]
        out = M.attention(M._split_heads(q, n_head), M._split_heads(k, n_head),
                          M._split_heads(v, n_head), mask, dtype)
        x = x + M._mm(M._merge_heads(out), blk["o_w"], dtype) + blk["o_b"]

        h = M.layer_norm(x, blk["xattn_ln_w"], blk["xattn_ln_b"], eps)
        q = M._mm(h, blk["xq_w"], dtype) + blk["xq_b"]
        qh = M._split_heads(q, n_head)          # (1, H, T, d)
        out, probs = M.cross_attend(qh, cxk, cxv, dtype, return_probs=True)
        x = x + M._mm(M._merge_heads(out), blk["xo_w"], dtype) + blk["xo_b"]

        h = M.layer_norm(x, blk["mlp_ln_w"], blk["mlp_ln_b"], eps)
        h = M._gelu(M._mm(h, blk["mlp0_w"], dtype) + blk["mlp0_b"])
        x = x + M._mm(h, blk["mlp1_w"], dtype) + blk["mlp1_b"]
        return x, probs[0]

    _, weights = M.scan_layers(body, x, (dec["blocks"], xk, xv), unroll=False)
    return weights  # (n_layer, H, T, n_audio)


def median_filter_reflect(x: np.ndarray, width: int) -> np.ndarray:
    """Median over the last axis with reflect padding (:8968-9001)."""
    assert width % 2 == 1
    half = width // 2
    n = x.shape[-1]
    idx = np.arange(-half, n + half)
    idx = np.where(idx < 0, -idx, idx)
    idx = np.where(idx >= n, 2 * (n - 1) - idx, idx)
    padded = x[..., idx]
    windows = np.lib.stride_tricks.sliding_window_view(padded, width, axis=-1)
    return np.median(windows, axis=-1).astype(x.dtype)


def dtw_and_backtrace(x: np.ndarray) -> np.ndarray:
    """Monotonic DTW over cost matrix x (N tokens, M audio) with backtrace;
    returns alignment pairs [2, n_steps] (:8878-8962).  Tie-breaking matches
    the reference's strict-< comparisons exactly."""
    N, M = x.shape
    cost = np.full((N + 1, M + 1), np.inf, np.float32)
    trace = np.full((N + 1, M + 1), -1, np.int32)
    cost[0, 0] = 0.0
    for j in range(1, M + 1):
        for i in range(1, N + 1):
            c0 = cost[i - 1, j - 1]
            c1 = cost[i - 1, j]
            c2 = cost[i, j - 1]
            if c0 < c1 and c0 < c2:
                c, t = c0, 0
            elif c1 < c0 and c1 < c2:
                c, t = c1, 1
            else:
                c, t = c2, 2
            cost[i, j] = x[i - 1, j - 1] + c
            trace[i, j] = t

    trace[0, :] = 2
    trace[:, 0] = 1
    bt: List[Tuple[int, int]] = []
    i, j = N, M
    while i > 0 or j > 0:
        bt.append((i - 1, j - 1))
        t = trace[i, j]
        if t == 0:
            i -= 1
            j -= 1
        elif t == 1:
            i -= 1
        else:
            j -= 1
    bt.reverse()
    return np.asarray(bt, np.int32).T  # [2, steps]


def compute_token_level_timestamps_dtw(ctx, params, result_all,
                                       i_segment: int, n_segments: int,
                                       seek: int, n_frames: int,
                                       medfilt_width: int = 7) -> None:
    """whisper_exp_compute_token_level_timestamps_dtw (src/whisper.cpp:9003).

    Sets `t_dtw` (10 ms ticks) on the text tokens of segments
    [i_segment, i_segment + n_segments).
    """
    vocab = ctx.vocab
    hp = ctx.hp
    aheads = ctx.dtw_aheads
    if not aheads or ctx.is_empty:
        return

    # sot + [lang] + notimestamps + text tokens + eot (:9033-9054)
    tokens: List[int] = [vocab.token_sot]
    if vocab.is_multilingual:
        tokens.append(vocab.lang_token(ctx.lang_id))
    sot_len = len(tokens)
    tokens.append(vocab.token_not)
    for s in result_all[i_segment:i_segment + n_segments]:
        tokens.extend(t.id for t in s.tokens if t.id < vocab.token_eot)
    tokens.append(vocab.token_eot)

    n_audio_tokens = n_frames // 2
    toks = jnp.asarray(tokens, jnp.int32)
    pos = jnp.arange(len(tokens), dtype=jnp.int32)
    weights_all = _alignment_weights_all(
        ctx.params, toks, pos, ctx.xk, ctx.xv, hp=hp, dtype=ctx.compute_dtype)
    w_np = np.asarray(weights_all, np.float32)

    # select alignment heads -> (n_sel, n_tokens, n_audio_tokens)
    sel = np.stack([w_np[l, h, :, :n_audio_tokens] for (l, h) in aheads])

    # normalize over the TEXT-token axis (ggml_norm over ne[0], :9103-9106)
    mean = sel.mean(axis=1, keepdims=True)
    var = sel.var(axis=1, keepdims=True)
    sel = (sel - mean) / np.sqrt(var + 1e-9)

    # median filter over the audio axis, mean over heads, negate (:9108-9122)
    sel = median_filter_reflect(sel, medfilt_width)
    matrix = -sel.mean(axis=0)  # (n_tokens, n_audio_tokens)

    # drop SOT sequence and EOT (:9124-9127)
    matrix = matrix[sot_len:len(tokens) - 1]

    alignment = dtw_and_backtrace(matrix)

    # place timestamps: first audio index where the token index advances
    # (:9135-9160)
    last_v = 0
    seg_i = i_segment
    tok_j = 0

    def advance():
        nonlocal seg_i, tok_j
        tok_j += 1
        while (seg_i < len(result_all) and
               tok_j >= len(result_all[seg_i].tokens)):
            seg_i += 1
            tok_j = 0

    for k in range(alignment.shape[1]):
        v = int(alignment[0, k])
        if v != last_v:
            time_index = int(alignment[1, k])
            timestamp = time_index * 2 + seek  # 20 ms per audio token
            last_v = v
            # skip non-text tokens
            while (seg_i < len(result_all) and
                   result_all[seg_i].tokens[tok_j].id >= vocab.token_eot):
                advance()
            if seg_i >= len(result_all):
                break
            result_all[seg_i].tokens[tok_j].t_dtw = timestamp
            advance()
