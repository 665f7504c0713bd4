import duckdb
import numpy as np
import pandas as pd
import ray.data

from knowledgegraphs_ray.streaming.retention import (
    WEEK_US,
    retention_cohorts,
    retention_oracle_sql,
)


def _events(n_users=40, seed=3):
    rng = np.random.default_rng(seed)
    rows = []
    base = np.datetime64("2024-01-01T00:00:00", "us")
    for u in range(n_users):
        start_wk = int(rng.integers(0, 4))
        for wk in sorted(set([start_wk] + list(rng.integers(start_wk, 12, 5)))):
            for _ in range(int(rng.integers(1, 4))):  # multiple events/week
                off_us = int(rng.integers(0, 7 * 86400)) * 1_000_000
                rows.append(
                    {
                        "user_id": u,
                        "ts": base + np.timedelta64(wk * 7 * 86400 * 1_000_000 + off_us, "us"),
                        "event_type": "view",
                    }
                )
    return pd.DataFrame(rows)


def test_retention_matches_bruteforce_and_oracle():
    df = _events()
    ds = ray.data.from_pandas(df).repartition(5)
    out = (
        retention_cohorts(ds)
        .to_pandas()
        .sort_values(["cohort_week", "week_offset"])
        .reset_index(drop=True)
    )
    # brute force
    b = df.assign(wk=df["ts"].astype("datetime64[us]").astype("int64") // WEEK_US)
    first = b.groupby("user_id")["wk"].min().rename("cw")
    j = b.merge(first, on="user_id")
    want = (
        j.assign(week_offset=j["wk"] - j["cw"])
        .groupby(["cw", "week_offset"])["user_id"]
        .nunique()
        .rename("users")
        .reset_index()
        .rename(columns={"cw": "cohort_week"})
        .sort_values(["cohort_week", "week_offset"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
    # offset-0 row per cohort equals cohort size
    sizes = first.value_counts().sort_index()
    z = out[out["week_offset"] == 0].set_index("cohort_week")["users"].sort_index()
    assert (z.to_numpy() == sizes.to_numpy()).all()
    # parallelism invariance
    out2 = (
        retention_cohorts(ds.repartition(2))
        .to_pandas()
        .sort_values(["cohort_week", "week_offset"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)
    # exact DuckDB twin
    con = duckdb.connect()
    con.register("events", df)
    sql = con.execute(retention_oracle_sql()).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(out, sql, check_dtype=False)
