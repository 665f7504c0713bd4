"""GROUPING SETS / ROLLUP aggregation (pipelines/analytics.py):
hand-checked grains, the SQL GROUPING() bitmask (incl. genuine-NULL-key
disambiguation), DuckDB-twin equivalence, and parallelism invariance."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray

from knowledgegraphs_ray.pipelines.analytics import (
    grouping_sets_agg,
    grouping_sets_oracle_sql,
)

ROLLUP = [["a", "b"], ["a"], []]


def _run(df, sets=ROLLUP, nparts=4):
    return grouping_sets_agg(
        ray.data.from_pandas(df).repartition(nparts),
        key_cols=["a", "b"],
        sets=sets,
        sum_cols={"tot": "m"},
    ).to_pandas()


def _canon(d):
    d = d[sorted(d.columns)].copy()
    for c in d.columns:
        d[c] = d[c].astype(str)
    return d.sort_values(list(d.columns), kind="mergesort").reset_index(drop=True)


def test_rollup_hand_checked():
    df = pd.DataFrame(
        {"a": ["x", "x", "y"], "b": ["1", "2", "1"], "m": [10, 20, 30]}
    )
    out = _run(df)
    rows = {
        (r.a if pd.notna(r.a) else None, r.b if pd.notna(r.b) else None, r.gid): (
            r.n,
            r.tot,
        )
        for r in out.itertuples()
    }
    assert rows[("x", "1", 0)] == (1, 10)
    assert rows[("x", "2", 0)] == (1, 20)
    assert rows[("y", "1", 0)] == (1, 30)
    assert rows[("x", None, 1)] == (2, 30)  # b rolled up -> LSB set
    assert rows[("y", None, 1)] == (1, 30)
    assert rows[(None, None, 3)] == (3, 60)  # grand total
    assert len(rows) == 6


def test_rollup_null_key_vs_rolled_up_null():
    # a genuine NULL key at full grain keeps gid=0; the rolled-up cell
    # carries gid bits — exactly SQL's disambiguation
    df = pd.DataFrame({"a": [None, None], "b": ["1", "1"], "m": [5, 7]})
    out = _run(df)
    rows = {(r.gid): (r.n, r.tot) for r in out.itertuples()}
    assert rows[0] == (2, 12)  # (NULL, '1') genuine group
    assert rows[1] == (2, 12)  # (NULL, rolled) group
    assert rows[3] == (2, 12)  # grand total


def test_grouping_sets_matches_duckdb_twin():
    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "a": rng.choice(["x", "y", "z", None], 800),
            "b": rng.choice(["1", "2", "3"], 800),
            "m": rng.integers(0, 1000, 800).astype("int64"),
        }
    )
    con = duckdb.connect()
    con.register("t", df)
    # CUBE-shaped sets exercise a non-prefix grouping set too
    sets = [["a", "b"], ["a"], ["b"], []]
    want = con.execute(
        grouping_sets_oracle_sql(
            "SELECT * FROM t", key_cols=["a", "b"], sets=sets, sum_cols={"tot": "m"}
        )
    ).df()
    got1 = _run(df, sets=sets, nparts=1)
    got9 = _run(df, sets=sets, nparts=9)
    pd.testing.assert_frame_equal(_canon(got1), _canon(want), check_dtype=False)
    pd.testing.assert_frame_equal(_canon(got9), _canon(want), check_dtype=False)


def test_grouping_sets_rejects_unknown_column():
    df = pd.DataFrame({"a": ["x"], "b": ["1"], "m": [1]})
    with pytest.raises(ValueError, match="non-key"):
        grouping_sets_agg(
            ray.data.from_pandas(df),
            key_cols=["a"],
            sets=[["a", "b"]],
            sum_cols={"tot": "m"},
        )
