"""Sorted-neighborhood blocking (linking/blocking.py) vs the row_number
self-join twin, including cross-block windows and tiny-block halos."""

import duckdb
import pandas as pd
import pyarrow as pa
import ray.data

from knowledgegraphs_ray.linking.blocking import (
    snm_oracle_sql,
    sorted_neighborhood_pairs,
)


def _oracle(df: pd.DataFrame, **kw) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", df)
    return con.execute(snm_oracle_sql(table="t", **kw)).fetch_df()


def _assert_match(res, exp):
    res = res.to_pandas().reset_index(drop=True).astype("int64")
    exp = exp.reset_index(drop=True).astype("int64")
    pd.testing.assert_frame_equal(res, exp)


def test_snm_matches_oracle(ray_session):
    df = pd.DataFrame(
        {
            "rid": range(1, 41),
            "key": [f"k{(i * 7) % 13:02d}" for i in range(40)],
        }
    )
    res = sorted_neighborhood_pairs(
        ray.data.from_pandas(df), key_cols=["key"], id_col="rid", window=4
    )
    exp = _oracle(df, id_expr="rid", key_exprs=["key"], window=4)
    assert len(exp) == 3 * 40 - (1 + 2 + 3)  # n*(w-1) minus the tail
    _assert_match(res, exp)


def test_snm_cross_block_windows(ray_session):
    # many tiny blocks force halo gathering across SEVERAL successors
    df = pd.DataFrame({"rid": range(100), "key": [f"{i:03d}" for i in range(100)]})
    ds = ray.data.from_pandas(df).repartition(37)
    res = sorted_neighborhood_pairs(ds, key_cols=["key"], id_col="rid", window=6)
    exp = _oracle(df, id_expr="rid", key_exprs=["key"], window=6)
    _assert_match(res, exp)


def test_snm_window_two_is_adjacent_pairs(ray_session):
    df = pd.DataFrame({"rid": [3, 1, 2], "key": ["b", "a", "a"]})
    res = sorted_neighborhood_pairs(
        ray.data.from_pandas(df), key_cols=["key"], id_col="rid", window=2
    )
    tbl = res.to_pandas()
    # sort order: (a,1), (a,2), (b,3) -> pairs (1,2), (2,3)
    assert tbl.values.tolist() == [[1, 2], [2, 3]]


def test_snm_single_row(ray_session):
    df = pd.DataFrame({"rid": [1], "key": ["x"]})
    res = sorted_neighborhood_pairs(
        ray.data.from_pandas(df), key_cols=["key"], id_col="rid", window=5
    )
    assert res.count() == 0
    assert res.schema().names == ["id_a", "id_b"]
