import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data

from knowledgegraphs_ray.state.upsert import (
    changelog_upsert,
    changelog_upsert_oracle_sql,
)


def _changelog(n_keys=30, n_rows=200, seed=11):
    rng = np.random.default_rng(seed)
    base = np.datetime64("2024-03-01T00:00:00", "us")
    df = pd.DataFrame(
        {
            "id": rng.integers(0, n_keys, n_rows).astype("int64"),
            "val": rng.integers(0, 1000, n_rows).astype("int64"),
            "name": [f"v{i}" for i in range(n_rows)],
            "ts": base + rng.integers(0, 10_000, n_rows).astype("timedelta64[s]"),
            "seq": np.arange(n_rows, dtype="int64"),
            "op": np.where(rng.random(n_rows) < 0.15, "delete", "upsert"),
        }
    )
    return df[["id", "val", "name", "ts", "seq", "op"]]


def _expected(df: pd.DataFrame, keep_tombstones=False) -> pd.DataFrame:
    latest = df.sort_values(
        ["id", "ts", "seq"], ascending=[True, False, False], kind="mergesort"
    ).drop_duplicates("id", keep="first")
    if not keep_tombstones:
        latest = latest[latest["op"] != "delete"].drop(columns=["op"])
    return latest.sort_values("id").reset_index(drop=True)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values("id").reset_index(drop=True)[
        sorted(df.columns)
    ]


def test_cold_start_matches_bruteforce_and_oracle():
    df = _changelog()
    ds = ray.data.from_pandas(df).repartition(7)
    got = _canon(changelog_upsert(None, ds, key="id").to_pandas())
    want = _canon(_expected(df))
    pd.testing.assert_frame_equal(got, want)

    con = duckdb.connect()
    con.register("log_df", df)
    sql = changelog_upsert_oracle_sql(
        None, "SELECT * FROM log_df", key="id",
        out_cols="id, val, name, ts, seq",
    )
    gold = _canon(con.execute(sql).fetchdf())
    pd.testing.assert_frame_equal(got, gold)


def test_incremental_equals_one_shot_with_tombstones():
    df = _changelog(n_rows=300)
    # split by seq parity — deliberately NOT version-ordered, so
    # correctness of the two-phase path rests on kept tombstones
    c1, c2 = df[df["seq"] % 2 == 0], df[df["seq"] % 2 == 1]
    snap = changelog_upsert(
        None, ray.data.from_pandas(c1).repartition(3),
        key="id", keep_tombstones=True,
    ).materialize()
    two_phase = changelog_upsert(
        snap, ray.data.from_pandas(c2).repartition(3), key="id"
    ).to_pandas()
    one_shot = changelog_upsert(
        None, ray.data.from_pandas(df).repartition(5), key="id"
    ).to_pandas()
    pd.testing.assert_frame_equal(_canon(two_phase), _canon(one_shot))


def test_tombstone_prevents_resurrection():
    base = np.datetime64("2024-03-01T00:00:00", "us")
    # key 1: upsert at t=1, delete at t=9; the late batch carries an
    # OLDER upsert at t=5 — must stay deleted
    c1 = pd.DataFrame(
        {
            "id": [1, 1],
            "val": [10, 0],
            "ts": [base + np.timedelta64(1, "s"), base + np.timedelta64(9, "s")],
            "seq": [0, 1],
            "op": ["upsert", "delete"],
        }
    )
    late = pd.DataFrame(
        {
            "id": [1],
            "val": [99],
            "ts": [base + np.timedelta64(5, "s")],
            "seq": [2],
            "op": ["upsert"],
        }
    )
    snap = changelog_upsert(
        None, ray.data.from_pandas(c1), key="id", keep_tombstones=True
    ).materialize()
    assert snap.count() == 1  # the tombstone row
    out = changelog_upsert(snap, ray.data.from_pandas(late), key="id").to_pandas()
    assert len(out) == 0
    # WITHOUT tombstones the same sequence resurrects the key (documented)
    snap_nt = changelog_upsert(None, ray.data.from_pandas(c1), key="id").materialize()
    out_nt = changelog_upsert(
        snap_nt, ray.data.from_pandas(late), key="id"
    ).to_pandas()
    assert len(out_nt) == 1 and out_nt["val"].iloc[0] == 99


def test_duplicate_version_raises():
    base = np.datetime64("2024-03-01T00:00:00", "us")
    df = pd.DataFrame(
        {
            "id": [1, 1],
            "val": [1, 2],
            "ts": [base, base],
            "seq": [7, 7],
            "op": ["upsert", "upsert"],
        }
    )
    # same (key, ts, seq) in different blocks -> detected at the merge
    ds = ray.data.from_pandas([df.iloc[:1], df.iloc[1:]])
    with pytest.raises(Exception, match="duplicate|total"):
        changelog_upsert(None, ds, key="id").materialize()


def test_parallelism_invariance():
    df = _changelog(n_rows=250, seed=5)
    a = changelog_upsert(
        None, ray.data.from_pandas(df).repartition(2), key="id"
    ).to_pandas()
    b = changelog_upsert(
        None, ray.data.from_pandas(df).repartition(13), key="id"
    ).to_pandas()
    pd.testing.assert_frame_equal(_canon(a), _canon(b))
