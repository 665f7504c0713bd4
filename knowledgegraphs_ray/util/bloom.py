"""Mergeable Bloom filter (dense bitmap, numpy-vectorized).

The membership-sketch tier between "broadcast the value set" and "hash-join
everything": at 100 TB a benchmark/blocklist gram set can be too large to
ship as strings to every task (tens of GB) while its Bloom bitmap is a few
hundred MB — `ray.put` once, probed per batch with vectorized bit math.

Guarantee: NO false negatives; false positives at rate
``(1 - e^{-k n / m})^k``. Used as a **pre-filter** (dedup/decontam candidate
generation) the end result stays exact: only probe-positive rows enter the
exact verify join, so a false positive costs one extra joined row, never a
wrong answer.

Bit layout: ``m_bits`` bits packed into uint64 words. Per-element positions
come from Kirsch–Mitzenmacher double hashing, ``(h1 + i*h2) mod m`` for
``i in 0..k-1``, over two independent-seed xxhash64 passes (polars
``Series.hash`` — the same vectorized hash the exact-dedup and HLL tiers
use). Bitmaps merge by elementwise OR — associative and commutative, so
block-level partials tree-reduce without ordering constraints.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import ray
import ray.data

_SEED_A = 0x51
_SEED_B = 0xA3


def bloom_new(m_bits: int) -> np.ndarray:
    assert m_bits % 64 == 0, "m_bits must be a multiple of 64"
    return np.zeros(m_bits // 64, dtype=np.uint64)


def bloom_params(n_items: int, *, fp_rate: float = 1e-3) -> tuple[int, int]:
    """Optimal (m_bits, k) for ``n_items`` at the target false-positive
    rate: m = -n ln p / (ln 2)^2, k = (m/n) ln 2; m rounded up to 64."""
    n = max(n_items, 1)
    m = int(np.ceil(-n * np.log(fp_rate) / (np.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, int(round(m / n * np.log(2))))
    return m, k


def _hash_pair(values: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """Two independent vectorized uint64 hashes per value (polars xxhash64
    at two seeds). Nulls hash like polars hashes them — deterministic."""
    s = pl.from_arrow(
        values.combine_chunks() if isinstance(values, pa.ChunkedArray) else values
    )
    if isinstance(s, pl.DataFrame):  # single-column table slipped in
        s = s.to_series()
    h1 = s.hash(seed=_SEED_A).to_numpy().astype(np.uint64)
    h2 = s.hash(seed=_SEED_B).to_numpy().astype(np.uint64)
    return h1, h2


def _positions(h1: np.ndarray, h2: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """(n, k) bit positions via double hashing; h2 forced odd so the probe
    sequence cycles through the full ring even when m is a power of two."""
    i = np.arange(k, dtype=np.uint64)
    odd_h2 = h2 | np.uint64(1)
    return ((h1[:, None] + i[None, :] * odd_h2[:, None]) % np.uint64(m_bits)).astype(
        np.int64
    )


def bloom_add(bits: np.ndarray, values: pa.Array | pa.ChunkedArray, *, k: int) -> np.ndarray:
    """Fold ``values`` into the bitmap in place (vectorized)."""
    if len(values) == 0:
        return bits
    h1, h2 = _hash_pair(values)
    pos = _positions(h1, h2, k, len(bits) * 64).ravel()
    np.bitwise_or.at(bits, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64))
    return bits


def bloom_contains(bits: np.ndarray, values: pa.Array | pa.ChunkedArray, *, k: int) -> np.ndarray:
    """bool[n]: True ⇔ all k probe bits set (possible member); False is
    definitive (no false negatives)."""
    if len(values) == 0:
        return np.zeros(0, dtype=bool)
    h1, h2 = _hash_pair(values)
    pos = _positions(h1, h2, k, len(bits) * 64)
    probed = (bits[pos >> 6] >> (pos & 63).astype(np.uint64)) & np.uint64(1)
    return probed.all(axis=1)


def bloom_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.bitwise_or(a, b)


def bloom_from_dataset(
    ds: ray.data.Dataset,
    column: str,
    *,
    m_bits: int,
    k: int,
) -> np.ndarray:
    """Distributed build: one packed bitmap per block (raw Ray tasks over
    the block refs — a shared mergeable reduce the Dataset API can't
    express), OR-merged in a binary tree so no single task ever holds more
    than two bitmaps. Driver receives exactly one bitmap."""

    @ray.remote
    def block_bitmap(block: pa.Table) -> np.ndarray:
        if block.num_rows == 0:  # empty blocks can be zero-COLUMN tables
            return bloom_new(m_bits)
        return bloom_add(bloom_new(m_bits), block[column], k=k)

    @ray.remote
    def merge2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return bloom_merge(a, b)

    refs = [block_bitmap.remote(r) for r in ds.to_arrow_refs()]
    if not refs:
        return bloom_new(m_bits)
    while len(refs) > 1:
        nxt = [merge2.remote(refs[i], refs[i + 1]) for i in range(0, len(refs) - 1, 2)]
        if len(refs) % 2:
            nxt.append(refs[-1])
        refs = nxt
    return ray.get(refs[0])
