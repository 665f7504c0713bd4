"""streaming/watermark.py — watermark-aware incremental tumbling windows.

Checks: (1) in-order shards with generous lateness reproduce the plain
tumbling aggregate (no late drops), (2) an out-of-order straggler shard
is late-dropped, never amends a finalized window, and the late counter
sees it, (3) the multi-shard emission union matches the per-shard
watermark DuckDB twin exactly, (4) single-shot == sharded when nothing
is late, (5) windows are emitted exactly once."""

import duckdb
import numpy as np
import pandas as pd
import ray.data

from knowledgegraphs_ray.streaming.watermark import (
    WindowState,
    tumbling_advance,
    tumbling_flush,
    watermark_tumbling_oracle_sql,
)

BASE = np.datetime64("2024-02-01T00:00:00", "us")


def _events(n=400, seed=9, span_hours=50):
    rng = np.random.default_rng(seed)
    off = rng.integers(0, span_hours * 3600, n)
    return pd.DataFrame(
        {
            "user_id": rng.integers(0, 12, n).astype("int64"),
            "ts": BASE + off.astype("timedelta64[s]"),
            "value": np.round(rng.random(n) * 50, 2),
        }
    )


def _run_shards(shards, *, window_sec=3600, lateness_sec=0):
    st = WindowState(window_sec=window_sec, lateness_sec=lateness_sec)
    emitted = []
    for sh in shards:
        st, fin = tumbling_advance(st, ray.data.from_pandas(sh).repartition(3))
        emitted.append(fin.to_pandas())
    emitted.append(tumbling_flush(st).to_pandas())
    out = pd.concat([e for e in emitted if len(e)], ignore_index=True)
    return st, out.sort_values(["user_id", "window_start"]).reset_index(drop=True)


def _plain_tumbling(df, window_sec=3600):
    ep = df["ts"].astype("int64")
    g = pd.DataFrame(
        {
            "user_id": df["user_id"],
            "window_start": (ep // (window_sec * 1_000_000)) * window_sec,
            "cents": np.round(df["value"] * 100).astype("int64"),
        }
    ).groupby(["user_id", "window_start"], as_index=False).agg(
        n_events=("cents", "size"), sum_cents=("cents", "sum")
    )
    return g.sort_values(["user_id", "window_start"]).reset_index(drop=True)


def test_in_order_shards_equal_plain_tumbling():
    df = _events().sort_values("ts").reset_index(drop=True)
    shards = [df.iloc[:150], df.iloc[150:300], df.iloc[300:]]
    st, got = _run_shards(shards, lateness_sec=7200)
    # in ts order with 2h lateness and 1h windows: nothing is late
    assert st.late_events == 0
    pd.testing.assert_frame_equal(got, _plain_tumbling(df), check_dtype=False)


def test_straggler_dropped_and_counted():
    df = _events().sort_values("ts").reset_index(drop=True)
    early, rest = df.iloc[:50].copy(), df.iloc[50:]
    st, got = _run_shards([rest, early], lateness_sec=0)
    # every early event's window closed when shard 1's max advanced the
    # watermark past it
    assert st.late_events == len(early)
    pd.testing.assert_frame_equal(got, _plain_tumbling(rest), check_dtype=False)
    # exactly-once: no (user, window) appears twice
    assert not got.duplicated(["user_id", "window_start"]).any()


def test_oracle_match_mixed_lateness():
    df = _events(n=600, seed=4)
    stragglers = df[df.index % 10 == 0]
    timely = df[df.index % 10 != 0].sort_values("ts")
    cut = len(timely) // 2
    shards = [
        timely.iloc[:cut],
        timely.iloc[cut:],
        stragglers,  # arrive last: some late, some inside lateness
    ]
    st, got = _run_shards(shards, lateness_sec=6 * 3600)
    con = duckdb.connect()
    for i, sh in enumerate(shards):
        con.register(f"sh_df{i}", sh)
    sql = watermark_tumbling_oracle_sql(
        [f"SELECT * FROM sh_df{i}" for i in range(3)],
        lateness_sec=6 * 3600,
    )
    gold = (
        con.execute(sql)
        .fetchdf()
        .sort_values(["user_id", "window_start"])
        .reset_index(drop=True)
    )
    assert st.late_events > 0  # the scenario really exercises lateness
    pd.testing.assert_frame_equal(
        got.astype("int64"), gold.astype("int64")
    )


def test_parallelism_invariance():
    df = _events(n=500, seed=8).sort_values("ts").reset_index(drop=True)
    shards = [df.iloc[:250], df.iloc[250:]]

    def run(nblocks):
        st = WindowState(window_sec=3600, lateness_sec=3600)
        outs = []
        for sh in shards:
            st, fin = tumbling_advance(
                st, ray.data.from_pandas(sh).repartition(nblocks)
            )
            outs.append(fin.to_pandas())
        outs.append(tumbling_flush(st).to_pandas())
        out = pd.concat([o for o in outs if len(o)], ignore_index=True)
        return (
            out.sort_values(["user_id", "window_start"])
            .reset_index(drop=True)
            .astype("int64"),
            st.late_events,
        )

    a, la = run(2)
    b, lb = run(11)
    assert la == lb
    pd.testing.assert_frame_equal(a, b)
