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


def test_bucket_join_auto_salting_identical_results():
    """Auto-salted bucket join == unsalted join on skewed data; the hot key's
    rows spread across multiple buckets."""
    import numpy as np
    import pandas as pd
    import ray.data

    from knowledgegraphs_ray.extract.joins import bucket_join

    rng = np.random.default_rng(6)
    # one key (7) holds 80% of the left side
    keys = np.where(rng.random(2000) < 0.8, 7, rng.integers(0, 50, 2000))
    left = pd.DataFrame({"k": keys.astype("int64"), "lv": np.arange(2000, dtype="int64")})
    right = pd.DataFrame(
        {"k": np.arange(0, 50, dtype="int64"), "rv": np.arange(100, 150, dtype="int64")}
    )
    lds = ray.data.from_pandas(left).repartition(6)
    rds = ray.data.from_pandas(right)

    plain = bucket_join(lds, rds, left_on="k", right_on="k", n_buckets=16).to_pandas()
    salted = bucket_join(
        lds, rds, left_on="k", right_on="k", n_buckets=16,
        salt_threshold=100, n_salts=4,
    ).to_pandas()
    key = lambda df: sorted(map(tuple, df[["k", "lv", "rv"]].itertuples(index=False)))
    assert key(plain) == key(salted)
    assert len(salted) == 2000  # every left row matched exactly once
