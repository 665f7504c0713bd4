"""Pivot (long->wide) counts/cents (pipelines/pivot.py) vs the
SUM(CASE ...) twin, incl. OOV pooling and absent categories."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet
import ray.data

from knowledgegraphs_ray.pipelines.pivot import pivot_counts, pivot_oracle_sql

SF = "/root/testdata/sf0.001"
CATS = ["view", "click", "purchase", "signup"]


def test_pivot_matches_oracle(ray_session):
    def cents(t: pa.Table) -> pa.Table:
        return t.append_column(
            "cents", pc.cast(pc.round(pc.multiply(t["value"], 100)), pa.int64())
        )

    ev = ray.data.read_parquet(
        f"{SF}/events.parquet", columns=["user_id", "event_type", "value"]
    ).map_batches(cents, batch_format="pyarrow")
    res = pivot_counts(
        ev,
        group_col="user_id",
        pivot_col="event_type",
        categories=CATS,
        value_cents_col="cents",
    ).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    exp = con.execute(
        pivot_oracle_sql(
            table="events",
            group_col="user_id",
            pivot_col="event_type",
            categories=CATS,
            value_cents_expr="CAST(round(value * 100) AS BIGINT)",
        )
    ).fetch_df()
    pd.testing.assert_frame_equal(
        res.reset_index(drop=True).astype("int64"),
        exp.reset_index(drop=True).astype("int64"),
    )
    # 'error' events exist in the fixture and must pool into other
    assert res["n_other"].sum() > 0


def test_pivot_absent_category_and_no_other(ray_session):
    df = pd.DataFrame(
        {"g": [1, 1, 2], "k": ["a", "b", "a"], "cents": [100, 250, 40]}
    )
    res = pivot_counts(
        ray.data.from_pandas(df),
        group_col="g",
        pivot_col="k",
        categories=["a", "b", "zzz"],  # zzz never occurs
        value_cents_col="cents",
        include_other=False,
    ).to_pandas()
    assert list(res.columns) == [
        "g", "n_a", "n_b", "n_zzz", "cents_a", "cents_b", "cents_zzz",
    ]
    assert res["n_zzz"].tolist() == [0, 0]
    assert res["cents_a"].tolist() == [100, 40]


def test_pivot_counts_only(ray_session):
    df = pd.DataFrame({"g": [1, 2, 2], "k": ["a", "a", "x"]})
    res = pivot_counts(
        ray.data.from_pandas(df), group_col="g", pivot_col="k", categories=["a"]
    ).to_pandas()
    assert list(res.columns) == ["g", "n_a", "n_other"]
    assert res.values.tolist() == [[1, 1, 0], [2, 1, 1]]


def test_pivot_null_group_and_null_pivot_match_oracle(ray_session, tmp_path):
    """NULL group keys stay a real group (dropna=False) and NULL pivot
    values count in NO column — the oracle's NOT IN NULL semantics."""
    df = pd.DataFrame(
        {
            "g": pd.array([1, 1, None, None, 2, 2], dtype="Int64"),
            "k": ["a", None, "a", "x", None, "b"],
            "cents": [10, 20, 30, 40, 50, 60],
        }
    )
    p = str(tmp_path / "ev.parquet")
    pa.parquet.write_table(pa.Table.from_pandas(df, preserve_index=False), p)
    res = (
        pivot_counts(
            ray.data.read_parquet(p),
            group_col="g",
            pivot_col="k",
            categories=["a", "b"],
            value_cents_col="cents",
        )
        .to_pandas()
        .sort_values("g", na_position="last")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW ev AS SELECT * FROM read_parquet('{p}')")
    exp = (
        con.execute(
            pivot_oracle_sql(
                table="ev",
                group_col="g",
                pivot_col="k",
                categories=["a", "b"],
                value_cents_expr="cents",
            )
        )
        .fetch_df()
        .sort_values("g", na_position="last")
        .reset_index(drop=True)
    )
    assert len(res) == 3  # groups 1, 2 and the NULL group
    pd.testing.assert_frame_equal(
        res.astype({c: "int64" for c in res.columns if c != "g"}),
        exp.astype({c: "int64" for c in exp.columns if c != "g"}),
        check_dtype=False,
    )
    # NULL pivot values counted nowhere: group 1 has n_a=1, n_other=0
    r1 = res[res["g"] == 1].iloc[0]
    assert r1["n_a"] == 1 and r1["n_other"] == 0 and r1["cents_other"] == 0


def test_pivot_oracle_sql_escapes_quotes():
    """A category containing a single quote yields valid SQL literals."""
    quoted = pivot_oracle_sql(
        table="t", group_col="g", pivot_col="k", categories=["o'brien"]
    )
    assert "'o''brien'" in quoted
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g INT, k VARCHAR)")
    con.execute("INSERT INTO t VALUES (1, 'o''brien'), (1, 'x')")
    # the column alias keeps the raw category string — quote it for DuckDB
    out = con.execute(
        quoted.replace("AS n_o'brien", 'AS nq').replace(
            "AS n_other", "AS n_other"
        )
    ).fetch_df()
    assert out["nq"].tolist() == [1]
    assert out["n_other"].tolist() == [1]
