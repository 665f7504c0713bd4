"""Skew utilities: hot-key detection, salting fan-out, two-phase counts."""

import ray.data

from knowledgegraphs_ray.canon.skew import add_salted_key, hot_keys, salted_group_counts


def _skewed(n_hot=500, n_cold=20):
    rows = [{"k": "user"} for _ in range(n_hot)]
    rows += [{"k": f"rare{i}"} for i in range(n_cold)]
    return ray.data.from_items(rows)


def test_hot_keys_detection():
    ds = _skewed()
    hot = hot_keys(ds, key="k", threshold=100)
    assert hot == {"user"}


def test_salting_fans_out_hot_key():
    ds = _skewed().repartition(4)
    salted = add_salted_key(ds, key="k", hot={"user"}, n_salts=8).to_pandas()
    hot_salts = salted[salted["salted_key"].str.startswith("user#")]["salted_key"].unique()
    assert len(hot_salts) > 1  # fan-out happened
    cold = salted[~salted["salted_key"].str.startswith("user#")]
    assert (cold["salted_key"].str.endswith("#0")).all()  # cold keys unsalted


def test_two_phase_counts_exact():
    ds = _skewed(n_hot=777, n_cold=5)
    out = salted_group_counts(ds, key="k", threshold=100, n_salts=8).to_pandas()
    got = dict(zip(out["base_key"], out["n"]))
    assert got["user"] == 777
    assert all(got[f"rare{i}"] == 1 for i in range(5))
