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


# --- session windows (r5) ---------------------------------------------------

from knowledgegraphs_ray.streaming.watermark import (  # noqa: E402
    SessionState,
    sessions_advance,
    sessions_flush,
    watermark_sessions_oracle_sql,
)


def _run_session_shards(shards, *, gap_sec=3600, lateness_sec=0, **kw):
    st = SessionState(gap_sec=gap_sec, lateness_sec=lateness_sec, **kw)
    emitted = []
    for sh in shards:
        st, fin = sessions_advance(st, ray.data.from_pandas(sh).repartition(3))
        emitted.append(fin.to_pandas())
    emitted.append(sessions_flush(st).to_pandas())
    out = pd.concat([e for e in emitted if len(e)], ignore_index=True)
    return st, out.sort_values(["user_id", "start_us"]).reset_index(drop=True)


def _session_oracle(shards, *, gap_sec=3600, lateness_sec=0):
    con = duckdb.connect()
    sqls = []
    for i, sh in enumerate(shards):
        con.register(f"shard{i}", sh)
        sqls.append(f"SELECT user_id, ts, value FROM shard{i}")
    out = con.execute(
        watermark_sessions_oracle_sql(
            sqls, gap_sec=gap_sec, lateness_sec=lateness_sec
        )
    ).fetch_df()
    return out.sort_values(["user_id", "start_us"]).reset_index(drop=True)


def test_sessions_match_oracle_mixed_lateness():
    df = _events(500, seed=3)
    ep = df["ts"].astype("int64")
    cut = int(ep.quantile(0.6))
    shards = [
        df[ep < cut].reset_index(drop=True),
        df[ep >= cut].reset_index(drop=True),
        # replayed stragglers: resend the oldest 10% after the log moved on
        df[ep <= ep.quantile(0.1)].reset_index(drop=True),
    ]
    st, out = _run_session_shards(shards, gap_sec=1800, lateness_sec=3600)
    exp = _session_oracle(shards, gap_sec=1800, lateness_sec=3600)
    assert st.late_events > 0, "straggler shard must be late-dropped"
    pd.testing.assert_frame_equal(
        out.astype("int64"), exp.astype("int64")
    )


def test_session_merge_bridging_event():
    """A later-shard event landing between two open sessions within gap of
    BOTH must merge them into one session (the merge-capable state)."""
    t0 = BASE.astype("int64")

    def mk(offs_sec, uid=1):
        return pd.DataFrame(
            {
                "user_id": np.full(len(offs_sec), uid, dtype="int64"),
                "ts": BASE + np.asarray(offs_sec).astype("timedelta64[s]"),
                "value": np.full(len(offs_sec), 1.0),
            }
        )

    # shard 1: two sessions 0-60s and 300-360s (gap 240s > 100s gap rule)
    sh1 = mk([0, 60, 300, 360])
    # shard 2: ts=180 bridges both (120s from each end, <= 100? no —
    # use gap 150: 180-60=120<=150 and 300-180=120<=150 -> one session)
    sh2 = mk([180])
    st, out = _run_session_shards([sh1, sh2], gap_sec=150, lateness_sec=86400)
    assert len(out) == 1
    row = out.iloc[0]
    assert row["n_events"] == 5
    assert row["start_us"] == t0 and row["end_us"] == t0 + 360 * 1_000_000
    exp = _session_oracle([sh1, sh2], gap_sec=150, lateness_sec=86400)
    pd.testing.assert_frame_equal(out.astype("int64"), exp.astype("int64"))


def test_session_finalized_never_amended():
    """An event past the watermark horizon of a FINALIZED session is
    dropped (late), not appended — exactly-once emission."""

    def mk(offs_sec):
        return pd.DataFrame(
            {
                "user_id": np.full(len(offs_sec), 7, dtype="int64"),
                "ts": BASE + np.asarray(offs_sec).astype("timedelta64[s]"),
                "value": np.full(len(offs_sec), 2.0),
            }
        )

    # shard 1 spans [0, 10] and [100000]: with lateness 0 the watermark
    # jumps to 100000, finalizing session [0,10] (end+gap << wm)
    sh1 = mk([0, 10, 100_000])
    # shard 2 tries to extend the finalized session at ts=20 -> late
    sh2 = mk([20])
    st, out = _run_session_shards([sh1, sh2], gap_sec=60, lateness_sec=0)
    assert st.late_events == 1
    assert out["n_events"].tolist() == [2, 1]
    exp = _session_oracle([sh1, sh2], gap_sec=60, lateness_sec=0)
    pd.testing.assert_frame_equal(out.astype("int64"), exp.astype("int64"))


def test_sessions_distributed_merge_tier_equivalent():
    df = _events(300, seed=5)
    shards = [df.iloc[:150].reset_index(drop=True), df.iloc[150:].reset_index(drop=True)]
    _, a = _run_session_shards(shards, gap_sec=1800, lateness_sec=86400 * 30)
    _, b = _run_session_shards(
        shards, gap_sec=1800, lateness_sec=86400 * 30, driver_limit=0
    )
    pd.testing.assert_frame_equal(a.astype("int64"), b.astype("int64"))
