"""Token-level timestamps (experimental heuristic) + segment wrapping.

Ports of `whisper_exp_compute_token_level_timestamps`
(src/whisper.cpp:8621-8857), `voice_length` (:8510-8588),
`get_signal_energy` (:8590-8607) and `whisper_wrap_segment` (:6094-6144).
Timestamps are in 10 ms ticks, as in the reference.
"""

from __future__ import annotations

from typing import List

import numpy as np

SAMPLE_RATE = 16000


def get_signal_energy(signal: np.ndarray, half_window: int) -> np.ndarray:
    """Moving average of |signal| with window 2*hw+1, denominator fixed at
    2*hw+1 even at the edges (matches the C loop)."""
    hw = half_window
    a = np.abs(signal).astype(np.float32)
    kernel = np.ones(2 * hw + 1, np.float32)
    sums = np.convolve(a, kernel, mode="same")
    return (sums / (2 * hw + 1)).astype(np.float32)


def voice_length(text: str) -> float:
    """Heuristic voice length of a token (src/whisper.cpp:8510-8588)."""
    res = 0.0
    for ch in text:
        cp = ord(ch)
        if cp == 0x20 or cp == 0x3000:
            res += 0.01
        elif cp in (0x2C, 0xFF0C, 0x3001, 0xFF1B, 0xFF1A):
            res += 2.00
        elif cp in (0x2E, 0x21, 0x3F, 0x3002, 0xFF0E, 0xFF01, 0xFF1F, 0x2026):
            res += 3.00
        elif 0x30 <= cp <= 0x39 or 0xFF10 <= cp <= 0xFF19:
            res += 3.00
        else:
            res += 1.00
    return res


def _timestamp_to_sample(t: int, segment_t0: int, n_samples: int) -> int:
    sample = int(((t - segment_t0) * SAMPLE_RATE) // 100)
    return max(0, min(n_samples - 1, sample))


def _sample_to_timestamp(i_sample: int, segment_t0: int) -> int:
    return (100 * i_sample) // SAMPLE_RATE + segment_t0


def compute_token_level_timestamps(ctx, result_all, i_segment: int,
                                   thold_pt: float, thold_ptsum: float) -> None:
    segment = result_all[i_segment]
    tokens = segment.tokens
    energy = getattr(ctx, "energy", None)
    if energy is None or len(energy) == 0:
        return
    n_samples = len(energy)

    t0, t1 = segment.t0, segment.t1
    n = len(tokens)
    if n == 0:
        return
    if n == 1:
        tokens[0].t0 = t0
        tokens[0].t1 = t1
        return

    vocab = ctx.vocab
    t_beg = ctx.t_beg
    t_last = ctx.t_last
    tid_last = ctx.tid_last

    for j in range(n):
        token = tokens[j]
        if j == 0:
            if token.id == vocab.token_beg:
                tokens[0].t0 = t0
                tokens[0].t1 = t0
                tokens[1].t0 = t0
                t_beg = t0
                t_last = t0
                tid_last = vocab.token_beg
            else:
                tokens[0].t0 = t_last

        tt = t_beg + 2 * (token.tid - vocab.token_beg)
        token.vlen = voice_length(vocab.token_str(token.id))

        if (token.pt > thold_pt and token.ptsum > thold_ptsum and
                token.tid > tid_last and tt <= t1):
            if j > 0:
                tokens[j - 1].t1 = tt
            token.t0 = tt
            tid_last = token.tid

    tokens[n - 2].t1 = t1
    tokens[n - 1].t0 = t1
    tokens[n - 1].t1 = t1
    t_last = t1

    # proportional fill of unknown intervals by voice length
    p0 = 0
    p1 = 0
    while True:
        while p1 < n and tokens[p1].t1 < 0:
            p1 += 1
        if p1 >= n:
            p1 = n - 1
        if p1 > p0:
            psum = sum(tokens[j].vlen for j in range(p0, p1 + 1))
            dt = tokens[p1].t1 - tokens[p0].t0
            for j in range(p0 + 1, p1 + 1):
                ct = tokens[j - 1].t0 + dt * tokens[j - 1].vlen / psum
                tokens[j - 1].t1 = int(ct)
                tokens[j].t0 = int(ct)
        p1 += 1
        p0 = p1
        if p1 >= n:
            break

    # fix-up pass
    for j in range(n - 1):
        if tokens[j].t1 < 0:
            tokens[j + 1].t0 = tokens[j].t1
        if j > 0 and tokens[j - 1].t1 > tokens[j].t0:
            tokens[j].t0 = tokens[j - 1].t1
            tokens[j].t1 = max(tokens[j].t0, tokens[j].t1)

    # energy-based expand/contract
    hw = SAMPLE_RATE // 8
    for j in range(n):
        if tokens[j].id >= vocab.token_eot:
            continue
        s0 = _timestamp_to_sample(tokens[j].t0, segment.t0, n_samples)
        s1 = _timestamp_to_sample(tokens[j].t1, segment.t0, n_samples)
        ss0 = max(s0 - hw, 0)
        ss1 = min(s1 + hw, n_samples)
        ns = ss1 - ss0
        thold = 0.5 * float(energy[ss0:ss1].sum()) / ns

        k = s0
        if energy[k] > thold and j > 0:
            while k > 0 and energy[k] > thold:
                k -= 1
            tokens[j].t0 = _sample_to_timestamp(k, segment.t0)
            if tokens[j].t0 < tokens[j - 1].t1:
                tokens[j].t0 = tokens[j - 1].t1
            else:
                s0 = k
        else:
            while energy[k] < thold and k < s1:
                k += 1
            s0 = k
            tokens[j].t0 = _sample_to_timestamp(k, segment.t0)

        k = s1
        if energy[k] > thold:
            while k < n_samples - 1 and energy[k] > thold:
                k += 1
            tokens[j].t1 = _sample_to_timestamp(k, segment.t0)
            if j < n - 1 and tokens[j].t1 > tokens[j + 1].t0:
                tokens[j].t1 = tokens[j + 1].t0
            else:
                s1 = k
        else:
            while energy[k] < thold and k > s0:
                k -= 1
            s1 = k
            tokens[j].t1 = _sample_to_timestamp(k, segment.t0)

    ctx.t_beg = t_beg
    ctx.t_last = t_last
    ctx.tid_last = tid_last


def _should_split_on_word(txt: str, split_on_word: bool) -> bool:
    if not split_on_word:
        return True
    return txt.startswith(" ")


def wrap_segment(ctx, result_all, max_len: int, split_on_word: bool) -> int:
    """Split the last segment into max_len-character pieces
    (whisper_wrap_segment, src/whisper.cpp:6094-6144)."""
    from .full import Segment

    vocab = ctx.vocab
    segment = result_all[-1]
    res = 1
    acc = 0
    text = ""

    i = 0
    while i < len(segment.tokens):
        token = segment.tokens[i]
        if token.id >= vocab.token_eot:
            i += 1
            continue
        txt = vocab.token_str(token.id)
        cur = len(txt)  # UTF-8 character count

        if acc + cur > max_len and i > 0 and _should_split_on_word(txt, split_on_word):
            last = result_all[-1]
            # `last` IS `segment` on the first split — take the tail BEFORE
            # truncating the head, or the new segment would be empty
            head, tail = segment.tokens[:i], segment.tokens[i:]
            seg_t1 = segment.t1
            last.text = text
            last.t1 = token.t0
            last.tokens = head
            last.speaker_turn_next = False

            new_seg = Segment(token.t0, seg_t1, "", segment.no_speech_prob,
                              tail, segment.speaker_turn_next)
            result_all.append(new_seg)
            acc = 0
            text = ""
            segment = new_seg
            i = 0
            res += 1
        else:
            acc += cur
            text += txt
            i += 1

    result_all[-1].text = text
    return res
