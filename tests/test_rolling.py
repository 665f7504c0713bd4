"""sorted_rolling_agg vs DuckDB window frames — exact int64 equality, with
the halo path forced via tiny blocks and hot keys spanning many blocks."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from knowledgegraphs_ray.streaming.rolling import sorted_rolling_agg


def _synth(n=800, n_keys=7, seed=11, span=500):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n).astype("int64"),
            "rv": rng.integers(0, span, n).astype("int64"),
            "id": np.arange(n, dtype="int64"),
            "v": rng.integers(-50, 200, n).astype("int64"),
        }
    )
    return df


def _oracle(df, w, r):
    con = duckdb.connect()
    con.register("t", df)
    return con.execute(
        f"""
        SELECT k, rv, id, v,
          SUM(v)   OVER rows_w AS roll_sum,
          COUNT(v) OVER rows_w AS roll_cnt,
          MIN(v)   OVER rows_w AS roll_min,
          MAX(v)   OVER rows_w AS roll_max,
          SUM(v)   OVER range_w AS range_sum,
          COUNT(v) OVER range_w AS range_cnt
        FROM t
        WINDOW
          rows_w AS (PARTITION BY k ORDER BY rv, id
                     ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW),
          range_w AS (PARTITION BY k ORDER BY rv
                      RANGE BETWEEN {r} PRECEDING AND CURRENT ROW)
        ORDER BY k, rv, id
        """
    ).df()


def _run(df, w, r, blocks):
    ds = ray.data.from_pandas(df).repartition(blocks)
    out = sorted_rolling_agg(
        ds,
        key_cols=["k"],
        order_cols=["rv", "id"],
        val_col="v",
        rows_window=w,
        range_window=r,
        range_col="rv",
    )
    got = out.to_pandas().sort_values(["k", "rv", "id"]).reset_index(drop=True)
    return got


@pytest.mark.parametrize("blocks", [1, 3, 17])
def test_rolling_matches_duckdb(blocks):
    df = _synth()
    w, r = 4, 60
    exp = _oracle(df, w, r)
    got = _run(df, w, r, blocks)
    for c in ["roll_sum", "roll_cnt", "roll_min", "roll_max", "range_sum", "range_cnt"]:
        np.testing.assert_array_equal(
            got[c].to_numpy().astype("int64"),
            exp[c].to_numpy().astype("int64"),
            err_msg=f"{c} @ blocks={blocks}",
        )


def test_hot_key_spans_many_blocks():
    # one key, ties everywhere, 40 blocks of ~5 rows: every block's frame
    # reaches through multiple predecessors (multi-hop halo walk)
    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "k": np.zeros(200, dtype="int64"),
            "rv": np.sort(rng.integers(0, 40, 200)).astype("int64"),
            "id": np.arange(200, dtype="int64"),
            "v": rng.integers(0, 9, 200).astype("int64"),
        }
    )
    w, r = 12, 10
    exp = _oracle(df, w, r)
    got = _run(df, w, r, 40)
    for c in ["roll_sum", "roll_cnt", "roll_min", "roll_max", "range_sum", "range_cnt"]:
        np.testing.assert_array_equal(
            got[c].to_numpy().astype("int64"), exp[c].to_numpy().astype("int64"),
            err_msg=c,
        )


def test_range_peers_included():
    # rows tying the current rv belong to the RANGE frame even when they
    # sort after the current row (ANSI peer semantics)
    df = pd.DataFrame(
        {
            "k": [1, 1, 1],
            "rv": [5, 5, 5],
            "id": [0, 1, 2],
            "v": [10, 20, 30],
        }
    ).astype("int64")
    got = _run(df, 2, 0, 1)
    assert got["range_sum"].tolist() == [60, 60, 60]
    assert got["range_cnt"].tolist() == [3, 3, 3]
    assert got["roll_sum"].tolist() == [10, 30, 50]  # ROWS stays positional


def test_hot_key_halo_guard():
    df = pd.DataFrame(
        {
            "k": np.zeros(100, dtype="int64"),
            "rv": np.arange(100, dtype="int64"),
            "id": np.arange(100, dtype="int64"),
            "v": np.ones(100, dtype="int64"),
        }
    )
    ds = ray.data.from_pandas(df).repartition(20)
    with pytest.raises(ValueError, match="hot"):
        sorted_rolling_agg(
            ds,
            key_cols=["k"],
            order_cols=["rv", "id"],
            val_col="v",
            range_window=1000,
            range_col="rv",
            max_halo_rows=10,
        )


def test_validation():
    ds = ray.data.from_pandas(_synth(50))
    with pytest.raises(ValueError, match="rows_window"):
        sorted_rolling_agg(ds, key_cols=["k"], order_cols=["rv"], val_col="v")
    with pytest.raises(ValueError, match="order_cols"):
        sorted_rolling_agg(
            ds,
            key_cols=["k"],
            order_cols=["id", "rv"],
            val_col="v",
            range_window=5,
            range_col="rv",
        )
