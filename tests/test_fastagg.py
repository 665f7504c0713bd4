"""fastagg: driver fast path and distributed fallback agree."""

import pandas as pd
import ray.data

from knowledgegraphs_ray.util.fastagg import sum_partials


def _partials():
    rows = []
    for b in range(4):  # 4 "blocks" of partial sums
        for k in range(10):
            rows.append({"key": f"k{k}", "n": b + k, "m": 2 * k})
    return ray.data.from_items(rows)


def _norm(ds):
    df = ds.to_pandas().sort_values("key").reset_index(drop=True)
    return df[["key", "n", "m"]].astype({"n": "int64", "m": "int64"})


def test_driver_and_distributed_paths_agree():
    fast = _norm(sum_partials(_partials(), keys=["key"], sum_cols=["n", "m"]))
    dist = _norm(
        sum_partials(_partials(), keys=["key"], sum_cols=["n", "m"], driver_limit=0)
    )
    pd.testing.assert_frame_equal(fast, dist)
    assert fast.loc[fast["key"] == "k3", "n"].iloc[0] == sum(b + 3 for b in range(4))


def test_empty_partials():
    empty = ray.data.from_items([{"key": "x", "n": 1}]).filter(lambda r: False)
    out = sum_partials(empty, keys=["key"], sum_cols=["n"])
    assert out.count() == 0
