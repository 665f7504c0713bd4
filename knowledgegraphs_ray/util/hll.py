"""Minimal mergeable HyperLogLog (dense, numpy-vectorized).

The approximate tier for count-distinct at 100 TB: each block contributes a
2^p-register sketch (uint8, 4 KiB at p=12); sketches merge by elementwise
max — associative and commutative, so they can be combined per batch first
(fastagg-style) and the driver only ever sees one row per (column, batch).

Standard estimator (Flajolet et al. 2007) with the small-range linear
counting correction; relative error ≈ 1.04/sqrt(2^p) (~1.6% at p=12).
"""

from __future__ import annotations

import numpy as np

DEFAULT_P = 12


def hll_new(p: int = DEFAULT_P) -> np.ndarray:
    return np.zeros(1 << p, dtype=np.uint8)


def hll_add_hashes(registers: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Fold uint64 hashes into the sketch (vectorized, in place)."""
    if len(hashes) == 0:
        return registers
    p = int(np.log2(len(registers)))
    h = hashes.astype(np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # sentinel low bits
    # rank = leading zeros of the remaining 64-p bits, +1
    lz = np.zeros(len(h), dtype=np.uint8)
    cur = rest.copy()
    bit = np.uint64(1) << np.uint64(63)
    # vectorized leading-zero count via float log2 would lose precision at
    # 64 bits; use the portable trick: 63 - floor(log2) on the high word
    nz = cur != 0
    f = np.zeros(len(h))
    f[nz] = np.log2(cur[nz].astype(np.float64))
    # clip: float64 rounding can push values just below 2^k to exactly 2^k
    # (bias ~2^-53 — negligible vs the 1.04/sqrt(m) sketch error)
    lz = np.where(nz, np.clip(63 - np.floor(f).astype(np.int64), 0, 64), 64).astype(
        np.uint8
    )
    rank = (lz + 1).astype(np.uint8)
    np.maximum.at(registers, idx, rank)
    return registers


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(registers: np.ndarray) -> float:
    m = float(len(registers))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.power(2.0, -registers.astype(np.float64)).sum()
    zeros = int((registers == 0).sum())
    if est <= 2.5 * m and zeros:
        return m * np.log(m / zeros)  # linear counting
    return float(est)
