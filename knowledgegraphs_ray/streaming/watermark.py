"""Watermark-aware incremental tumbling windows — Flink-style late-data
semantics as a Dataset-level operator (no actors: window state is itself
a keyed Dataset of partial aggregates, so it scales and spills like any
other table).

Protocol (per arriving shard, via :func:`tumbling_advance`):

1. the shard is pre-aggregated per (key, window) INSIDE map_batches
   (combine-before-shuffle — the exchange moves one row per
   (key, window, block), never per event);
2. events whose window is already FINALIZED (window_end ≤ current
   watermark) are LATE: excluded from the aggregates and counted into
   ``state.late_events`` — exactly-once emission means a closed window
   can never be amended;
3. state partials ∪ shard partials merge with one keyed exchange;
4. the watermark advances to ``max(seen ts) − allowed_lateness``
   (monotone across shards);
5. windows with window_end ≤ the new watermark FINALIZE: emitted now,
   removed from state. Open windows stay as state partials.

:func:`tumbling_flush` force-finalizes whatever remains (end of log).
Emission union over any shard split equals the batch twin
(:func:`watermark_tumbling_oracle_sql`) — pinned by pytest and the
driver gate; late events are deterministic given the shard order, so
the twin reproduces them with per-shard watermark CTEs.

State is O(open (key, window) pairs) and rides in the object store as
Dataset blocks; the watermark and late count are the only driver-held
scalars (lineage metadata, checkpointable alongside the partials).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from knowledgegraphs_ray.util.fastagg import sum_partials


@dataclass
class WindowState:
    """Open-window partials + watermark + late-event count."""

    partials: ray.data.Dataset | None = None  # (key, window_start, n, cents)
    watermark_us: int = -(2**62)  # -inf until the first shard
    late_events: int = 0
    key: str = "user_id"
    window_sec: int = 3600
    lateness_sec: int = 0


def _assign(batch: pa.Table, *, key, ts_col, value_col, window_sec):
    ts_us = batch[ts_col].combine_chunks().cast(pa.timestamp("us"), safe=False)
    ep_us = pc.cast(ts_us, pa.int64())
    win = pc.multiply(pc.divide(ep_us, window_sec * 1_000_000), window_sec)
    cents = pc.cast(pc.round(pc.multiply(batch[value_col], 100)), pa.int64())
    return pd.DataFrame(
        {
            key: batch[key].to_numpy(zero_copy_only=False),
            "window_start": win.to_numpy(zero_copy_only=False),
            "cents": cents.to_numpy(zero_copy_only=False),
            "__ep_us": ep_us.to_numpy(zero_copy_only=False),
        }
    )


def tumbling_advance(
    state: WindowState,
    shard: ray.data.Dataset,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
) -> tuple[WindowState, ray.data.Dataset]:
    """Fold one arriving shard into ``state``; returns (new_state,
    finalized windows emitted by this shard)."""
    key, window_sec = state.key, state.window_sec
    wm = state.watermark_us

    NEG_INF = -(2**62)

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = _assign(
            batch, key=key, ts_col=ts_col, value_col=value_col,
            window_sec=window_sec,
        )
        # late = the event's window already finalized under the CURRENT
        # watermark (window_end ≤ wm). Late events never carry the block
        # max ts either: late ⇒ ts < window_end ≤ wm ≤ running max, so
        # the kept-only max equals the all-events max (twin relies on it).
        late = (df["window_start"] + window_sec) * 1_000_000 <= wm
        n_late = int(late.sum())
        df = df[~late]
        g = df.groupby([key, "window_start"], as_index=False).agg(
            n_events=("cents", "size"), sum_cents=("cents", "sum"),
            __max_ep=("__ep_us", "max"),
        )
        g["__late"] = 0
        if len(g):
            g.iloc[0, g.columns.get_loc("__late")] = n_late
        elif n_late:
            # all-late block: a zero-event sentinel row carries the count
            g = pd.DataFrame(
                {
                    key: pd.Series([None], dtype=object),
                    "window_start": [0],
                    "n_events": [0],
                    "sum_cents": [0],
                    "__max_ep": [NEG_INF],
                    "__late": [n_late],
                }
            )
        return g

    parts = shard.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    if parts.count() == 0:
        n_late = 0
        merged = state.partials
    else:
        # driver scalars: max kept ts + late count (block-partial maxima)
        stats = parts.map_batches(
            lambda df: pd.DataFrame(
                {"m": [df["__max_ep"].max()], "l": [df["__late"].sum()]}
            ),
            batch_format="pandas",
        ).to_pandas()
        n_late = int(stats["l"].sum())
        max_ep = int(stats["m"].max())
        if max_ep > NEG_INF:
            wm = max(wm, max_ep - state.lateness_sec * 1_000_000)
        parts = parts.map_batches(
            lambda df: df[df["n_events"] > 0][
                [key, "window_start", "n_events", "sum_cents"]
            ],
            batch_format="pandas",
        )
        merged = (
            parts
            if state.partials is None
            else state.partials.union(parts)
        )
    if merged is None:
        return state, ray.data.from_items([])
    merged = sum_partials(
        merged, keys=[key, "window_start"], sum_cols=["n_events", "sum_cents"]
    ).materialize()

    def split(df: pd.DataFrame, *, final: bool) -> pd.DataFrame:
        closed = (df["window_start"] + window_sec) * 1_000_000 <= wm
        return df[closed] if final else df[~closed]

    finalized = merged.map_batches(
        lambda df: split(df, final=True), batch_format="pandas"
    ).materialize()
    remaining = merged.map_batches(
        lambda df: split(df, final=False), batch_format="pandas"
    ).materialize()
    new_state = WindowState(
        partials=remaining,
        watermark_us=wm,
        late_events=state.late_events + n_late,
        key=key,
        window_sec=window_sec,
        lateness_sec=state.lateness_sec,
    )
    return new_state, finalized


def tumbling_flush(state: WindowState) -> ray.data.Dataset:
    """Force-finalize all open windows (end of log)."""
    if state.partials is None:
        return ray.data.from_items([])
    return state.partials


def watermark_tumbling_oracle_sql(
    shard_sqls: list[str],
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_sec: int = 3600,
    lateness_sec: int = 0,
) -> str:
    """DuckDB twin of advance(shard_1) … advance(shard_n) + flush: the
    union of all emissions. Watermark after shard i =
    max over shards 1..i of (max event ts − lateness); an event in shard
    i is late iff its window end ≤ watermark after shard i−1. Each
    window aggregates exactly the non-late events that arrived before it
    finalized — i.e. ALL its non-late events, because finalization
    happens at window_end ≤ watermark and lateness is measured against
    the same boundary. So the union equals: tumbling agg over non-late
    events."""
    w_us = window_sec * 1_000_000
    shard_ctes = []
    for i, s in enumerate(shard_sqls):
        shard_ctes.append(
            f"sh{i} AS (SELECT {key}, "
            f"epoch_us(CAST({ts_col} AS TIMESTAMP)) AS ep_us, "
            f"CAST(round({value_col} * 100) AS BIGINT) AS cents FROM ({s}))"
        )
    # running watermark BEFORE each shard: wm_0 = -inf, wm_i = max over
    # shards < i of (max ep − lateness)
    wm_exprs = ["CAST(-4611686018427387904 AS BIGINT)"]
    for i in range(1, len(shard_sqls)):
        prev = " UNION ALL ".join(f"SELECT ep_us FROM sh{j}" for j in range(i))
        wm_exprs.append(
            f"(SELECT max(ep_us) - {lateness_sec * 1_000_000} FROM ({prev}))"
        )
    keep_selects = []
    for i in range(len(shard_sqls)):
        keep_selects.append(
            f"SELECT {key}, ep_us, cents FROM sh{i} "
            f"WHERE ((ep_us // {w_us}) * {window_sec} + {window_sec}) "
            f"* 1000000 > ({wm_exprs[i]})"
        )
    keep = " UNION ALL ".join(keep_selects)
    return (
        "WITH " + ",\n".join(shard_ctes) + ",\n"
        f"kept AS ({keep})\n"
        f"SELECT {key}, (ep_us // {w_us}) * {window_sec} AS window_start, "
        f"count(*)::BIGINT AS n_events, sum(cents)::BIGINT AS sum_cents "
        f"FROM kept GROUP BY 1, 2"
    )


# --- watermark-aware SESSION windows ---------------------------------------
#
# Gap-based sessions with allowed lateness, same protocol family as the
# tumbling operator above but with MERGE-capable state: an open session is
# an interval (key, start_us, end_us, n_events, sum_cents); a kept event
# landing within ``gap`` of two open sessions bridges them into one (the
# classic session-window merge). State is a keyed Dataset of open-session
# intervals — O(open sessions), spills like any table.
#
# Finalization is safe by construction: a session with
# end_us + gap_us <= watermark can never merge again, because every kept
# future event has ts > watermark >= end_us + gap_us, i.e. strictly more
# than ``gap`` past the session end — it starts a new session. So the
# union of per-shard emissions + flush equals batch sessionization over
# the kept (non-late) events, which is what the SQL twin computes with
# per-shard watermark CTEs.


@dataclass
class SessionState:
    """Open-session intervals + watermark + late-event count."""

    partials: ray.data.Dataset | None = None
    watermark_us: int = -(2**62)
    late_events: int = 0
    key: str = "user_id"
    gap_sec: int = 1800
    lateness_sec: int = 0
    driver_limit: int = 5_000_000


def _merge_session_intervals(
    df: pd.DataFrame, *, key: str, gap_us: int
) -> pd.DataFrame:
    """Vectorized interval merge: sort by (key, start_us); a session breaks
    where start exceeds the running max end of its key by more than gap."""
    if df.empty:
        return df
    df = df.sort_values([key, "start_us", "end_us"], kind="mergesort")
    cm = df.groupby(key, sort=False)["end_us"].cummax()
    prev_end = cm.shift(1)
    k = df[key].to_numpy()
    new_key = np.r_[True, k[1:] != k[:-1]]
    brk = new_key | (df["start_us"].to_numpy() > prev_end.to_numpy() + gap_us)
    sid = np.cumsum(brk)
    out = (
        pd.DataFrame(
            {
                key: df[key].to_numpy(),
                "__sid": sid,
                "start_us": df["start_us"].to_numpy(),
                "end_us": df["end_us"].to_numpy(),
                "n_events": df["n_events"].to_numpy(),
                "sum_cents": df["sum_cents"].to_numpy(),
            }
        )
        .groupby([key, "__sid"], as_index=False)
        .agg(
            start_us=("start_us", "min"),
            end_us=("end_us", "max"),
            n_events=("n_events", "sum"),
            sum_cents=("sum_cents", "sum"),
        )
        .drop(columns="__sid")
    )
    for c in ("start_us", "end_us", "n_events", "sum_cents"):
        out[c] = out[c].astype("int64")
    return out


def sessions_advance(
    state: SessionState,
    shard: ray.data.Dataset,
    *,
    ts_col: str = "ts",
    value_col: str = "value",
) -> tuple[SessionState, ray.data.Dataset]:
    """Fold one arriving shard into ``state``; returns (new_state,
    finalized sessions emitted by this shard). See the session-window
    block comment above for the protocol and safety argument."""
    key, gap_us = state.key, state.gap_sec * 1_000_000
    wm = state.watermark_us
    NEG_INF = -(2**62)

    def partial(batch: pa.Table) -> pd.DataFrame:
        ts_us = batch[ts_col].combine_chunks().cast(pa.timestamp("us"), safe=False)
        ep = pc.cast(ts_us, pa.int64()).to_numpy(zero_copy_only=False)
        cents = pc.cast(
            pc.round(pc.multiply(batch[value_col], 100)), pa.int64()
        ).to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                key: batch[key].to_numpy(zero_copy_only=False),
                "ep": ep,
                "cents": cents,
            }
        )
        late = df["ep"].to_numpy() <= wm
        n_late = int(late.sum())
        df = df[~late]
        if len(df):
            df = df.sort_values([key, "ep"], kind="mergesort")
            k = df[key].to_numpy()
            e = df["ep"].to_numpy()
            brk = np.r_[True, (k[1:] != k[:-1]) | (e[1:] - e[:-1] > gap_us)]
            df = df.assign(__sid=np.cumsum(brk))
            g = df.groupby([key, "__sid"], as_index=False).agg(
                start_us=("ep", "min"),
                end_us=("ep", "max"),
                n_events=("ep", "size"),
                sum_cents=("cents", "sum"),
            ).drop(columns="__sid")
            g["__max_ep"] = int(e.max())
        else:
            g = pd.DataFrame(
                {
                    key: pd.Series([], dtype=object),
                    "start_us": pd.Series([], dtype="int64"),
                    "end_us": pd.Series([], dtype="int64"),
                    "n_events": pd.Series([], dtype="int64"),
                    "sum_cents": pd.Series([], dtype="int64"),
                    "__max_ep": pd.Series([], dtype="int64"),
                }
            )
        g["__late"] = 0
        if len(g):
            g.iloc[0, g.columns.get_loc("__late")] = n_late
        elif n_late:
            g = pd.DataFrame(
                {
                    key: pd.Series([None], dtype=object),
                    "start_us": [0],
                    "end_us": [0],
                    "n_events": [0],
                    "sum_cents": [0],
                    "__max_ep": [NEG_INF],
                    "__late": [n_late],
                }
            )
        return g

    parts = shard.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_late = 0
    merged_in = state.partials
    if parts.count() > 0:
        stats = parts.map_batches(
            lambda df: pd.DataFrame(
                {"m": [df["__max_ep"].max()], "l": [df["__late"].sum()]}
            ),
            batch_format="pandas",
        ).to_pandas()
        n_late = int(stats["l"].sum())
        max_ep = int(stats["m"].max())
        if max_ep > NEG_INF:
            wm = max(wm, max_ep - state.lateness_sec * 1_000_000)
        micro = parts.map_batches(
            lambda df: df[df["n_events"] > 0][
                [key, "start_us", "end_us", "n_events", "sum_cents"]
            ],
            batch_format="pandas",
        )
        merged_in = (
            micro if state.partials is None else state.partials.union(micro)
        )
    if merged_in is None:
        return state, ray.data.from_items([])

    merged_in = merged_in.materialize()
    if merged_in.count() <= state.driver_limit:
        sess = ray.data.from_pandas(
            _merge_session_intervals(
                merged_in.to_pandas(), key=key, gap_us=gap_us
            ).reset_index(drop=True)
        )
    else:
        # distributed tier: per-key interval merge, key-parallel — open
        # sessions per key are few, so groups stay tiny
        sess = merged_in.groupby(key).map_groups(
            lambda g: _merge_session_intervals(g, key=key, gap_us=gap_us),
            batch_format="pandas",
        )
    sess = sess.materialize()

    def split(df: pd.DataFrame, *, final: bool) -> pd.DataFrame:
        closed = df["end_us"] + gap_us <= wm
        return df[closed] if final else df[~closed]

    finalized = sess.map_batches(
        lambda df: split(df, final=True), batch_format="pandas"
    ).materialize()
    remaining = sess.map_batches(
        lambda df: split(df, final=False), batch_format="pandas"
    ).materialize()
    new_state = SessionState(
        partials=remaining,
        watermark_us=wm,
        late_events=state.late_events + n_late,
        key=key,
        gap_sec=state.gap_sec,
        lateness_sec=state.lateness_sec,
        driver_limit=state.driver_limit,
    )
    return new_state, finalized


def sessions_flush(state: SessionState) -> ray.data.Dataset:
    """Force-finalize all open sessions (end of log)."""
    if state.partials is None:
        return ray.data.from_items([])
    return state.partials


def watermark_sessions_oracle_sql(
    shard_sqls: list[str],
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_sec: int = 1800,
    lateness_sec: int = 0,
) -> str:
    """DuckDB twin of sessions_advance(shard_1) … + flush: per-shard
    watermark CTEs drop late events (ep <= watermark standing when the
    shard arrived), then batch gaps-and-islands sessionization over the
    kept union — equal to the incremental emission by the finalization
    safety argument in the module."""
    gap_us = gap_sec * 1_000_000
    shard_ctes = []
    for i, s in enumerate(shard_sqls):
        shard_ctes.append(
            f"sh{i} AS (SELECT {key}, "
            f"epoch_us(CAST({ts_col} AS TIMESTAMP)) AS ep_us, "
            f"CAST(round({value_col} * 100) AS BIGINT) AS cents FROM ({s}))"
        )
    wm_exprs = ["CAST(-4611686018427387904 AS BIGINT)"]
    for i in range(1, len(shard_sqls)):
        prev = " UNION ALL ".join(f"SELECT ep_us FROM sh{j}" for j in range(i))
        wm_exprs.append(
            f"(SELECT max(ep_us) - {lateness_sec * 1_000_000} FROM ({prev}))"
        )
    keep = " UNION ALL ".join(
        f"SELECT {key}, ep_us, cents FROM sh{i} WHERE ep_us > ({wm_exprs[i]})"
        for i in range(len(shard_sqls))
    )
    return (
        "WITH " + ",\n".join(shard_ctes) + ",\n"
        f"kept AS ({keep}),\n"
        f"s AS (SELECT *, CASE WHEN ep_us - lag(ep_us) OVER "
        f"  (PARTITION BY {key} ORDER BY ep_us) > {gap_us} "
        f"  THEN 1 ELSE 0 END AS brk FROM kept),\n"
        f"t AS (SELECT *, SUM(brk) OVER (PARTITION BY {key} ORDER BY ep_us "
        f"  ROWS UNBOUNDED PRECEDING) AS sid FROM s)\n"
        f"SELECT {key}, min(ep_us) AS start_us, max(ep_us) AS end_us, "
        f"count(*)::BIGINT AS n_events, sum(cents)::BIGINT AS sum_cents "
        f"FROM t GROUP BY {key}, sid"
    )
