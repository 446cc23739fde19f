"""Quantizer-side tables for the IQ1/IQ2/IQ3 grid formats.

The reference builds, at `ggml_quantize_init` time, three structures per
grid type (ggml/src/ggml-quants.c iq2xs_init_impl:2853 / iq3xs_init_impl:3703):

  grid        (N, K) int8   — codebook points in the quantizer's odd-integer
                              space (pos = 2*l + 1)
  kmap        (kmap_size,)  — pattern index -> grid index, or -(offset+1)
                              into `neighbours` for off-grid patterns
  neighbours  flat uint16   — per off-grid pattern: [count, idx...] of the
                              grid points whose distance is among the
                              `nwant` smallest distinct distances

This module reproduces them in numpy from the committed DECODE grids
(iq_grids.npz): the decode byte values are a monotone per-type relabeling
of the quantizer's 2*l+1 values, so the init-time uint16 tables need not
be transcribed.  Neighbour lists are ordered by (distance, grid index) —
glibc qsort (mergesort, stable) with the reference's distance-only
comparator over an index-ascending input yields exactly that order.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Dict, Tuple

import numpy as np

_GRIDS = np.load(Path(__file__).with_name("iq_grids.npz"))

# decode-byte -> quantizer level l, per family (monotone rank mapping)
_IQ2_BYTE_TO_L = {0x08: 0, 0x19: 1, 0x2B: 2, 0x3E: 3}
_IQ1_BYTE_TO_L = {0xFF: 0, 0x00: 1, 0x01: 2}   # -1, 0, +1


@dataclass
class IQTables:
    grid: np.ndarray        # (N, K) int8, values 2l+1
    kmap: np.ndarray        # (kmap_size,) int32
    neighbours: np.ndarray  # flat uint16


def _expand_grid(name: str) -> np.ndarray:
    """Decode-grid bytes -> (N, K) levels l."""
    g = _GRIDS[name]
    if g.dtype == np.uint64:
        b = g.view(np.uint8).reshape(-1, 8)
        lut = _IQ1_BYTE_TO_L if name == "iq1s_grid" else _IQ2_BYTE_TO_L
        out = np.zeros_like(b, dtype=np.int8)
        for byte, l in lut.items():
            out[b == byte] = l
        # sanity: every byte must be in the lut
        known = np.zeros(256, bool)
        for byte in lut:
            known[byte] = True
        assert known[b].all(), name
        return out
    # iq3: uint32; byte values are a monotone relabeling of l=0..7
    # ({4,12,20,28,36,44,52,62} — the top value is nonlinear)
    b = g.view(np.uint8).reshape(-1, 4)
    vals = np.unique(b)
    assert len(vals) <= 8, name
    lut = np.full(256, -1, np.int8)
    lut[vals] = np.arange(len(vals), dtype=np.int8)
    out = lut[b]
    assert (out >= 0).all(), name
    return out


def _build(name: str, kmap_size: int, nwant: int, bits: int) -> IQTables:
    levels = _expand_grid(name)                       # (N, K) in 0..(2^bits-1)
    n, k = levels.shape
    grid = (2 * levels + 1).astype(np.int8)

    # pattern index: sum l_j << bits*j
    shifts = (np.arange(k) * bits).astype(np.int64)
    idx = (levels.astype(np.int64) << shifts[None, :]).sum(1)

    kmap = np.full(kmap_size, -1, np.int32)
    kmap[idx] = np.arange(n, dtype=np.int32)

    # positions for every off-grid pattern
    off = np.nonzero(kmap < 0)[0]
    lv = ((off[:, None] >> shifts[None, :]) & ((1 << bits) - 1))
    pos = (2 * lv + 1).astype(np.int32)               # (M, K)

    # |p - g|^2 via GEMM (exact: all values are small ints in f64)
    gf = grid.astype(np.float64)
    pf = pos.astype(np.float64)
    d2 = ((pf * pf).sum(1)[:, None] + (gf * gf).sum(1)[None, :]
          - 2.0 * (pf @ gf.T)).astype(np.int32)

    # per pattern: keep every grid point whose distance is among the nwant
    # smallest DISTINCT distances (all ties included — reference loop,
    # ggml-quants.c:3243-3252).  Distances are small ints, so the cutoff
    # comes from a presence histogram instead of a full argsort.
    m = len(off)
    dmax = int(d2.max())
    pres = np.zeros((m, dmax + 1), bool)
    pres[np.repeat(np.arange(m), d2.shape[1]), d2.ravel()] = True
    rank = np.cumsum(pres, axis=1)
    hit = rank >= min(nwant, 10**9)
    cutoff = np.where(hit.any(1), hit.argmax(1), dmax)
    keep = d2 <= cutoff[:, None]
    counts = keep.sum(1)

    rows, js = np.nonzero(keep)
    order = np.lexsort((js, d2[rows, js], rows))      # (row, dist, grid idx)
    entries = js[order].astype(np.uint16)

    neigh = np.empty(int(counts.sum()) + m, np.uint16)
    km = kmap.copy()
    starts = np.concatenate([[0], np.cumsum(1 + counts)[:-1]])
    km[off] = -(starts + 1)
    neigh[starts] = counts
    cmax = int(counts.max())
    mask = np.arange(cmax)[None, :] < counts[:, None]
    dest = (starts[:, None] + 1 + np.arange(cmax)[None, :])[mask]
    neigh[dest] = entries
    return IQTables(grid, km, neigh)


_SPECS = {
    # name -> (grid npz key, kmap_size, nwant, bits per field)
    "iq2_xxs": ("iq2xxs_grid", 43692, 2, 2),
    "iq2_xs": ("iq2xs_grid", 43692, 2, 2),
    "iq2_s": ("iq2s_grid", 43692, 1, 2),
    "iq1": ("iq1s_grid", 43692, 3, 2),      # shared by iq1_s and iq1_m
    "iq3_xxs": ("iq3xxs_grid", 4096, 2, 3),
    "iq3_s": ("iq3s_grid", 4096, 3, 3),
}

_CACHE: Dict[str, IQTables] = {}


def tables(kind: str) -> IQTables:
    t = _CACHE.get(kind)
    if t is None:
        key, kmap_size, nwant, bits = _SPECS[kind]
        t = _CACHE[kind] = _build(key, kmap_size, nwant, bits)
    return t
