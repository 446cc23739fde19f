"""Parakeet log-mel frontend (reference: src/parakeet.cpp:2719-2905).

Differs from whisper's mel: preemphasis 0.97, centered ZERO padding of
n_fft/2, trained analysis window (center-placed if shorter than n_fft),
power spectrum (|X|^2, not magnitude), natural log with eps 5.96e-08, and
per-mel-bin mean/std normalization computed over the valid frames only
(ddof=1, denom std + 1e-5) but applied to all frames.

Two backends, mirroring audio/mel.py's MelFrontend: the numpy path matches
the reference's CPU mel in exact semantics (the oracle-diffed one), and
`log_mel_spectrogram_jax` runs the same math as ONE batched `jnp.fft.rfft`
device call — on TPU the 30 s mel drops ~40 ms (host numpy) -> <1 ms, which
matters now that encode+decode together cost ~8 ms (docs/PERF.md)."""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import numpy as np

from .hparams import HOP_LENGTH

LOG_EPS = 5.960464477539063e-08
NORM_EPS = 1e-5


def log_mel_spectrogram(samples: np.ndarray, filters: np.ndarray,
                        window: np.ndarray, n_fft: int,
                        hop: int = HOP_LENGTH) -> np.ndarray:
    """Returns mel of shape (n_len, n_mel) matching the reference layout
    (time-major, mel.data[i*n_mel + j])."""
    x = np.asarray(samples, np.float32).copy()
    n_samples = len(x)
    n_mel, n_fb = filters.shape
    assert n_fb == n_fft // 2 + 1

    # preemphasis x[i] -= 0.97 x[i-1] (original x[i-1]; :2814-2820)
    if n_samples > 1:
        x[1:] -= 0.97 * x[:-1].copy()

    # centered constant padding (:2823-2825)
    pad = n_fft // 2
    padded = np.concatenate([np.zeros(pad, np.float32), x,
                             np.zeros(pad, np.float32)])

    n_len = (len(padded) - n_fft) // hop + 1
    win_size = len(window) if len(window) else n_fft
    wpad = (n_fft - win_size) // 2

    # frame extraction with the window placed at the center of the FFT buffer
    idx = np.arange(n_len)[:, None] * hop + np.arange(win_size)[None, :] + wpad
    frames = np.zeros((n_len, n_fft), np.float32)
    frames[:, wpad:wpad + win_size] = padded[idx] * window[None, :]

    spec = np.fft.rfft(frames, n=n_fft, axis=1)
    power = (spec.real ** 2 + spec.imag ** 2).astype(np.float32)

    mel = np.log(power @ filters.T.astype(np.float32) + LOG_EPS)

    # per-bin normalization over valid frames only (:2860-2885)
    valid = max(2, min(n_samples // hop, n_len))
    mean = mel[:valid].mean(axis=0)
    std = mel[:valid].std(axis=0, ddof=1)
    mel = (mel - mean[None, :]) / (std + NORM_EPS)[None, :]
    return mel.astype(np.float32)


@functools.partial(
    jax.jit, static_argnames=("n_fft", "hop", "n_len_b", "win_size"))
def _log_mel_jax(x, n_samples, valid, filters, window,
                 n_fft: int, hop: int, n_len_b: int, win_size: int):
    """Bucketed device mel: x is zero-padded to a static bucket length and
    n_samples/n_len/valid ride as TRACED scalars, so the jit compiles once
    per bucket, not per utterance length.  Rows >= n_len are garbage the
    caller slices off; rows < n_len are exact (preemphasis runs BEFORE the
    tail zeroing so the trailing center-pad region stays exactly zero, as
    in the numpy path where padding is concatenated after preemphasis)."""
    import jax.numpy as jnp

    x = x.astype(jnp.float32)
    xp = jnp.concatenate([x[:1], x[1:] - 0.97 * x[:-1]])
    xp = jnp.where(jnp.arange(xp.shape[0]) < n_samples, xp, 0.0)
    pad = n_fft // 2
    padded = jnp.pad(xp, (pad, pad))
    wpad = (n_fft - win_size) // 2
    # overlapped frame extraction as win_size STRIDED SLICES (column j =
    # padded[wpad+j :: hop]) — `padded[idx]` advanced indexing lowers to a
    # generic TPU gather costing ~11 ms of a 12 ms mel; the slice stack is
    # bit-identical pure data movement at ~1 ms (tools-probed; same disease
    # and fix as the conformer rel-pos shift, docs/PERF.md)
    end = wpad + (n_len_b - 1) * hop + 1
    cols = [jax.lax.slice(padded, (wpad + j,), (end + j,), (hop,))
            for j in range(win_size)]
    frames = jnp.zeros((n_len_b, n_fft), jnp.float32)
    frames = frames.at[:, wpad:wpad + win_size].set(
        jnp.stack(cols, axis=1) * window[None, :])
    spec = jnp.fft.rfft(frames, n=n_fft, axis=1)
    power = (spec.real ** 2 + spec.imag ** 2).astype(jnp.float32)
    mel = jnp.log(power @ filters.T + LOG_EPS)
    # masked per-bin normalization over the first `valid` rows (traced)
    mask = (jnp.arange(n_len_b) < valid)[:, None].astype(jnp.float32)
    vf = valid.astype(jnp.float32)
    mean = (mel * mask).sum(axis=0) / vf
    var = (((mel - mean[None]) * mask) ** 2).sum(axis=0) / (vf - 1.0)
    return (mel - mean[None, :]) / (jnp.sqrt(var) + NORM_EPS)[None, :]


def log_mel_spectrogram_jax(samples, filters: np.ndarray,
                            window: np.ndarray, n_fft: int,
                            hop: int = HOP_LENGTH):
    """Device-path mel: same semantics as `log_mel_spectrogram`, one jitted
    batched-rfft call; returns a jax.Array (n_len, n_mel).  Numerics differ
    from the numpy oracle path only by FFT/accumulation rounding (~1e-6
    rel); the oracle-exact tests pin the numpy path.  Samples are bucketed
    to the next power of two (min 1 s) so the jit compiles per bucket."""
    import jax.numpy as jnp

    samples = np.asarray(samples, np.float32)
    n_samples = len(samples)
    pad = n_fft // 2
    n_len = (n_samples + 2 * pad - n_fft) // hop + 1
    win_size = len(window) if len(window) else n_fft
    valid = max(2, min(n_samples // hop, n_len))
    bucket = max(16000, 1 << (max(1, n_samples - 1)).bit_length())
    xb = np.zeros(bucket, np.float32)
    xb[:n_samples] = samples
    n_len_b = (bucket + 2 * pad - n_fft) // hop + 1
    mel = _log_mel_jax(jnp.asarray(xb), jnp.int32(n_samples),
                       jnp.int32(valid),
                       jnp.asarray(filters, jnp.float32),
                       jnp.asarray(window, jnp.float32),
                       n_fft, hop, n_len_b, win_size)
    return mel[:n_len]
