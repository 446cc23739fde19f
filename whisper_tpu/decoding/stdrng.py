"""Bit-exact emulation of the reference's sampling RNG.

The reference samples decoder candidates with a per-decoder
``std::mt19937`` (seeded ``j`` for decoder j per whisper_full call,
src/whisper.cpp:6931; seed 0 for decoder 0 at state init, :3480) driven
through ``std::discrete_distribution<>`` (src/whisper.cpp:6528-6530,
:6602-6604).  For near-one-hot filtered distributions every draw returns the
argmax and any RNG reproduces the reference, but two paths make the
distribution genuinely flat and the *exact* engine observable:

  * grammar-constrained decoding — the penalty pulls all scripted tokens
    ~100 logits down, leaving a near-uniform valid set, and beam search
    ALWAYS samples its candidates stochastically (whisper_sample_token_topk
    uses the distribution even at temperature 0);
  * the temperature>0 fallback ladder.

This module reproduces both libstdc++ components bit-for-bit so those paths
are deterministic *and identical* to the reference binary:

  * ``mt19937``: the standardized Mersenne Twister (init 1812433253
    multiplier per [MT2002] / C++11 [rand.eng.mers]).
  * ``discrete_distribution::operator()``: libstdc++ converts the weights
    (the float ``decoder.probs`` widened to double) by one serial
    ``std::accumulate``, normalizes each weight by the sum, takes the serial
    ``std::partial_sum``, pins the last cumulative to 1.0, then draws one
    canonical double and ``std::upper_bound``s it.
  * ``std::generate_canonical<double, 53, mt19937>``: two 32-bit engine
    draws a, b -> (a + b*2^32) / 2^64 evaluated in double (the sum rounds
    once; the divide is a pure exponent shift), clamped below 1.0.

All arithmetic below performs the same operations in the same order on
IEEE-754 doubles, so results match the reference bit-for-bit on any
platform.  Verified against the reference binary by the grammar-constrained
case of tests/test_text_parity.py.
"""

from __future__ import annotations

import numpy as np

_N = 624
_M = 397
_MATRIX_A = 0x9908B0DF
_UPPER = 0x80000000
_LOWER = 0x7FFFFFFF
_MASK32 = 0xFFFFFFFF

_TWO32 = 4294967296.0            # 2^32
_TWO64 = 18446744073709551616.0  # 2^64
_ONE_BELOW_1 = float(np.nextafter(1.0, 0.0))


class StdMT19937:
    """std::mt19937 ([rand.eng.mers]): 32-bit Mersenne Twister."""

    def __init__(self, seed: int):
        mt = [0] * _N
        mt[0] = seed & _MASK32
        for i in range(1, _N):
            prev = mt[i - 1]
            mt[i] = (1812433253 * (prev ^ (prev >> 30)) + i) & _MASK32
        self._mt = mt
        self._idx = _N

    def _twist(self) -> None:
        # sequential per [rand.eng.mers]: entries < i are already updated
        # when read (the i+M-N and mt[0] reads for large i see NEW values)
        mt = self._mt
        for i in range(_N):
            y = (mt[i] & _UPPER) | (mt[(i + 1) % _N] & _LOWER)
            mt[i] = mt[(i + _M) % _N] ^ (y >> 1) ^ (_MATRIX_A if y & 1 else 0)
        self._idx = 0

    def next_u32(self) -> int:
        if self._idx >= _N:
            self._twist()
        y = self._mt[self._idx]
        self._idx += 1
        y ^= y >> 11
        y ^= (y << 7) & 0x9D2C5680
        y ^= (y << 15) & 0xEFC60000
        y ^= y >> 18
        return y & _MASK32


class StdRng:
    """The reference decoder RNG: mt19937 + libstdc++ discrete_distribution.

    API-compatible with the two draw sites in decoding/sampling.py.
    """

    def __init__(self, seed: int):
        self._eng = StdMT19937(seed)

    def canonical(self) -> float:
        """std::generate_canonical<double, 53, mt19937>: m = ceil(53/32) = 2
        engine draws, low word first."""
        a = self._eng.next_u32()
        b = self._eng.next_u32()
        ret = (float(a) + float(b) * _TWO32) / _TWO64
        return _ONE_BELOW_1 if ret >= 1.0 else ret

    def skip_draws(self, n: int) -> None:
        """Advance the engine past `n` discrete-distribution draws (each
        consumes exactly one generate_canonical = two engine words,
        independent of the weights).  Used to account for draws the
        reference binary makes in passes we execute on device (the t=0
        BEAM attempt's k draws/step/decoder) so a later host-replayed
        t>0 fallback samples from the same mt19937 stream position."""
        for _ in range(2 * n):
            self._eng.next_u32()

    def discrete(self, probs: np.ndarray) -> int:
        """One std::discrete_distribution<>(probs.begin(), probs.end()) draw.

        The distribution is rebuilt per sampler call in the reference, so
        building the cumulative here (not caching) matches the observable
        behavior; only the engine state persists.
        """
        w = np.asarray(probs, np.float64)
        cp_raw = np.cumsum(w)          # serial left-to-right, as accumulate
        total = float(cp_raw[-1])
        cp = np.cumsum(w / total)      # partial_sum of normalized weights
        cp[-1] = 1.0                   # libstdc++ pins the last entry
        return int(np.searchsorted(cp, self.canonical(), side="right"))

    def choice(self, n: int, p: np.ndarray) -> int:
        """np.random.Generator.choice-shaped adapter (sampling.py call
        sites pass an already-normalized p; the reference normalizes inside
        the distribution either way, so feed the raw weights through)."""
        assert len(p) == n
        return self.discrete(p)
