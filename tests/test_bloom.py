"""util/bloom.py — mergeable Bloom filter.

Checks: (1) no false negatives ever, (2) false-positive rate near the
analytic value at the sized (m, k), (3) OR-merge == single-pass build,
(4) distributed build over many blocks == local build, (5) sizing math."""

import numpy as np
import pyarrow as pa
import ray.data

from knowledgegraphs_ray.util.bloom import (
    bloom_add,
    bloom_contains,
    bloom_from_dataset,
    bloom_merge,
    bloom_new,
    bloom_params,
)


def _strs(prefix: str, n: int) -> pa.Array:
    return pa.array([f"{prefix}{i}" for i in range(n)], pa.string())


def test_no_false_negatives_and_fp_rate():
    members = _strs("in", 5000)
    m_bits, k = bloom_params(5000, fp_rate=1e-3)
    bits = bloom_add(bloom_new(m_bits), members, k=k)
    assert bloom_contains(bits, members, k=k).all()  # zero false negatives
    probes = _strs("out", 20000)
    fp = bloom_contains(bits, probes, k=k).mean()
    assert fp < 5e-3, fp  # target 1e-3 with slack


def test_merge_equals_single_build():
    a, b = _strs("a", 300), _strs("b", 300)
    m_bits, k = bloom_params(600, fp_rate=1e-2)
    merged = bloom_merge(
        bloom_add(bloom_new(m_bits), a, k=k), bloom_add(bloom_new(m_bits), b, k=k)
    )
    both = bloom_add(bloom_add(bloom_new(m_bits), a, k=k), b, k=k)
    assert np.array_equal(merged, both)


def test_distributed_build_matches_local():
    vals = [f"v{i}" for i in range(2000)]
    m_bits, k = bloom_params(2000, fp_rate=1e-3)
    ds = ray.data.from_arrow(pa.table({"gram": pa.array(vals)})).repartition(7)
    dist = bloom_from_dataset(ds, "gram", m_bits=m_bits, k=k)
    local = bloom_add(bloom_new(m_bits), pa.array(vals), k=k)
    assert np.array_equal(dist, local)


def test_empty_dataset_and_empty_probe():
    m_bits, k = bloom_params(10, fp_rate=1e-2)
    ds = ray.data.from_arrow(pa.table({"gram": pa.array([], pa.string())}))
    bits = bloom_from_dataset(ds, "gram", m_bits=m_bits, k=k)
    assert not bits.any()
    assert bloom_contains(bits, pa.array([], pa.string()), k=k).shape == (0,)
    assert not bloom_contains(bits, _strs("x", 10), k=k).any()


def test_params_sizing():
    m, k = bloom_params(1_000_000, fp_rate=1e-3)
    assert m % 64 == 0
    assert 13 <= m / 1_000_000 <= 16  # ~14.4 bits/element at p=1e-3
    assert 8 <= k <= 12  # ~10 hashes
