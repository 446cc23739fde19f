"""Log-mel spectrogram frontend, JAX-native.

Bit-parity target: the reference `log_mel_spectrogram`
(src/whisper.cpp:3176-3254) — periodic Hann(400), hop 160, reflect-pad 200 at
the start, 30 s of zeros + 200 at the end, power spectrum, mel filterbank dot,
`log10(max(s, 1e-10))`, global clamp to `max-8`, normalize `(x+4)/4`.

The reference runs this on CPU worker threads; here the STFT is one batched
`jnp.fft.rfft` over all frames, which XLA maps onto the TPU as a single fused
kernel — no per-frame host loop.  The scalar padding/max scan semantics are
kept exactly (including the "frames beyond the last real sample are
log10(1e-10)" rule, which falls out of the zero padding naturally).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.whisper.hparams import HOP_LENGTH, N_FFT, N_SAMPLES_PER_CHUNK, SAMPLE_RATE


def hann_window(n: int = N_FFT) -> np.ndarray:
    """Periodic Hann window (src/whisper.cpp:3029-3037)."""
    i = np.arange(n, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * i / n))).astype(np.float32)


def pad_audio(samples: np.ndarray) -> np.ndarray:
    """stage-2 reflect pad (200) at start; 30 s zeros + 200 at end."""
    n = len(samples)
    stage_2 = N_FFT // 2  # 200
    n_reflect = min(stage_2, max(0, n - 1))
    head = samples[1 : 1 + n_reflect][::-1]
    head = np.concatenate([np.zeros(stage_2 - n_reflect, np.float32), head])
    tail = np.zeros(N_SAMPLES_PER_CHUNK + stage_2, np.float32)
    return np.concatenate([head, samples.astype(np.float32), tail])


def mel_frame_counts(n_samples: int) -> Tuple[int, int]:
    """(n_len, n_len_org) — total padded frames and real-audio frames."""
    stage_2 = N_FFT // 2
    padded = n_samples + N_SAMPLES_PER_CHUNK + 2 * stage_2
    n_len = (padded - N_FFT) // HOP_LENGTH
    n_len_org = 1 + int((n_samples + stage_2 - N_FFT) / HOP_LENGTH)  # C trunc-div
    return n_len, n_len_org


@functools.partial(jax.jit, static_argnames=("n_len",))
def _log_mel_jax(padded: jax.Array, filters: jax.Array, window: jax.Array, n_len: int) -> jax.Array:
    """padded audio -> normalized log-mel (n_mel, n_len)."""
    # overlapped frames as N_FFT strided slices (column j = padded[j::hop]):
    # advanced indexing here lowers to a generic TPU gather costing ~11 ms
    # per 30 s window vs ~1 ms for the bit-identical slice stack (probed on
    # v5e; same disease/fix as the conformer rel-pos shift, docs/PERF.md)
    end = (n_len - 1) * HOP_LENGTH + 1
    frames = jnp.stack(
        [jax.lax.slice(padded, (j,), (end + j,), (HOP_LENGTH,))
         for j in range(N_FFT)], axis=1)
    frames = frames * window[None, :]                # (n_len, 400)
    spec = jnp.fft.rfft(frames.astype(jnp.float32), n=N_FFT, axis=-1)
    power = (spec.real * spec.real + spec.imag * spec.imag)  # (n_len, 201)
    mel = power @ filters.T                          # (n_len, n_mel)
    mel = jnp.log10(jnp.maximum(mel, 1e-10))
    mmax = jnp.max(mel) - 8.0
    mel = jnp.maximum(mel, mmax)
    return ((mel + 4.0) / 4.0).T                     # (n_mel, n_len)


def _log_mel_numpy(padded: np.ndarray, filters: np.ndarray, window: np.ndarray,
                   n_len: int) -> np.ndarray:
    """Host mel path: identical math, f64 mel dot like the reference's
    double-accumulating worker loop (src/whisper.cpp:3148-3160)."""
    idx = (np.arange(n_len)[:, None] * HOP_LENGTH + np.arange(N_FFT)[None, :])
    frames = padded[idx].astype(np.float32) * window[None, :]
    spec = np.fft.rfft(frames, n=N_FFT, axis=-1)
    power = (spec.real.astype(np.float32) ** 2 +
             spec.imag.astype(np.float32) ** 2)
    mel = power.astype(np.float64) @ filters.T.astype(np.float64)
    mel = np.log10(np.maximum(mel, 1e-10))
    mmax = mel.max() - 8.0
    mel = np.maximum(mel, mmax)
    return (((mel + 4.0) / 4.0).T).astype(np.float32)


class LogMel:
    """Stateful wrapper holding the filterbank; mirrors whisper_pcm_to_mel.

    backend="numpy" (default) matches the reference's CPU mel bit-for-bit in
    semantics; backend="jax" runs the batched-rfft device path (used on TPU
    with length bucketing)."""

    def __init__(self, filters: np.ndarray, backend: str = "numpy"):
        self.backend = backend
        self.np_filters = np.asarray(filters, dtype=np.float32)
        self.np_window = hann_window()
        if backend == "jax":
            self.filters = jnp.asarray(filters, dtype=jnp.float32)
            self.window = jnp.asarray(self.np_window)
        self.n_mel = int(filters.shape[0])

    def __call__(self, samples: np.ndarray) -> Tuple[np.ndarray, int]:
        """Returns (mel[n_mel, n_len] float32 numpy, n_len_org)."""
        n_len, n_len_org = mel_frame_counts(len(samples))
        padded = pad_audio(np.asarray(samples, dtype=np.float32))
        if self.backend == "jax":
            mel = _log_mel_jax(jnp.asarray(padded), self.filters, self.window,
                               n_len)
            return np.asarray(mel), n_len_org
        if self.backend == "native":
            from .. import native

            mel = native.log_mel(padded, self.np_filters, N_FFT, HOP_LENGTH,
                                 n_len)
            if mel is not None:
                return mel, n_len_org
        return _log_mel_numpy(padded, self.np_filters, self.np_window, n_len), n_len_org
