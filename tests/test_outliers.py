"""group_zscore_outliers vs DuckDB HUGEINT twin, incl. forced boundary ties
and magnitudes past float64's exact range."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data

from knowledgegraphs_ray.util.outliers import group_zscore_outliers


def _oracle(df, z2=4):
    con = duckdb.connect()
    con.register("t", df)
    return con.execute(
        f"""
        WITH g AS (SELECT k, COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS s,
                   CAST(SUM(CAST(v AS HUGEINT) * v) AS HUGEINT) AS q
                   FROM t GROUP BY k)
        SELECT t.id, (CAST(g.n AS HUGEINT) * t.v - g.s)
                   * (CAST(g.n AS HUGEINT) * t.v - g.s)
               > {z2} * (CAST(g.n AS HUGEINT) * g.q - CAST(g.s AS HUGEINT) * g.s)
               AS is_outlier
        FROM t JOIN g USING (k) ORDER BY t.id
        """
    ).df()


def _run(df, z2=4, blocks=5):
    ds = ray.data.from_pandas(df).repartition(blocks)
    out = group_zscore_outliers(ds, key_cols=["k"], val_col="v", z2=z2)
    return out.to_pandas().sort_values("id").reset_index(drop=True)


def test_matches_duckdb_random():
    rng = np.random.default_rng(2)
    df = pd.DataFrame(
        {
            "id": np.arange(3000, dtype="int64"),
            "k": rng.integers(0, 40, 3000).astype("int64"),
            "v": rng.integers(-500, 2000, 3000).astype("int64"),
        }
    )
    # plant obvious spikes
    df.loc[df.sample(20, random_state=1).index, "v"] = 10_000_000
    exp = _oracle(df)
    got = _run(df)
    np.testing.assert_array_equal(
        got["is_outlier"].to_numpy(), exp["is_outlier"].to_numpy()
    )
    assert got["is_outlier"].sum() >= 20


def test_exact_at_boundary():
    # engineered exact tie: group {0, 0, 6, 6} has n=4, S=12, Q=72;
    # lhs for v=6: (24-12)^2 = 144; rhs z2=2: 2*(288-144) = 288 -> False;
    # z2=1: 144 > 144 False; v=0: (0-12)^2=144 same. Decisions must come
    # from the EXACT path, not float luck — replicate at huge offsets too.
    base = pd.DataFrame(
        {
            "id": np.arange(4, dtype="int64"),
            "k": np.zeros(4, dtype="int64"),
            "v": np.array([0, 0, 6, 6], dtype="int64"),
        }
    )
    # huge magnitudes: same shape shifted by 3e6 (past exact float products)
    big = base.assign(
        id=base["id"] + 10, k=1, v=base["v"] + 3_000_000
    )
    df = pd.concat([base, big], ignore_index=True)
    for z2 in (1, 2, 4):
        exp = _oracle(df, z2)
        got = _run(df, z2, blocks=2)
        np.testing.assert_array_equal(
            got["is_outlier"].to_numpy(), exp["is_outlier"].to_numpy(),
            err_msg=f"z2={z2}",
        )


def test_singleton_and_constant_groups():
    df = pd.DataFrame(
        {
            "id": np.arange(5, dtype="int64"),
            "k": np.array([0, 1, 1, 1, 1], dtype="int64"),
            "v": np.array([7, 5, 5, 5, 5], dtype="int64"),
        }
    )
    got = _run(df, blocks=1)
    assert not got["is_outlier"].any()  # zero variance -> nothing flagged


def test_partitioning_invariance():
    rng = np.random.default_rng(8)
    df = pd.DataFrame(
        {
            "id": np.arange(1200, dtype="int64"),
            "k": rng.integers(0, 7, 1200).astype("int64"),
            "v": rng.integers(0, 100, 1200).astype("int64"),
        }
    )
    a = _run(df, blocks=1)
    b = _run(df, blocks=23)
    np.testing.assert_array_equal(
        a["is_outlier"].to_numpy(), b["is_outlier"].to_numpy()
    )
