"""Ordered funnel analysis over an event stream — how many entities reach
each step of a step sequence IN ORDER (each step's first qualifying event
strictly after the previous step's reach time).

Events-analytics companion to ``streaming/windows.py`` sessionization;
the reference models event streams only as KG rows (`events` virtual
dimension), so this is an engine-first operator for the events table.

Scale shape: events slim to (entity, ts-int64, step-index) AT THE READ
(non-step events never enter the exchange), ONE hash exchange co-locates
each entity's rows, and the per-bucket scan is fully vectorized (one
sorted pass + k ``np.unique`` first-occurrence scans for k funnel steps —
no per-entity Python loop). Each bucket emits k partial rows
(step, users); the merge is k·n_buckets rows. An entity lives in exactly
one bucket, so partial user counts add exactly.

Determinism: reach times are int64 timestamp views compared with the same
strict ``>`` as the DuckDB chained-CTE twin (:func:`funnel_oracle_sql`) —
pure integer comparisons, bit-exact at any parallelism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from knowledgegraphs_ray.util.blocks import compact_nonempty
from knowledgegraphs_ray.util.fastagg import sum_partials

_NEVER = np.iinfo(np.int64).max  # "did not reach": no ts can exceed it
_ALWAYS = np.iinfo(np.int64).min  # step 0 has no predecessor constraint


def _nparts() -> int:
    return max(2, min(32, int(ray.cluster_resources().get("CPU", 8))))


def funnel_counts(
    events: ray.data.Dataset,
    *,
    steps: list[str],
    by: str = "user_id",
    ts: str = "ts",
    event_col: str = "event_type",
) -> ray.data.Dataset:
    """-> one row per funnel step: (step_idx, step, users) where ``users``
    is the number of ``by`` entities whose first step-i event strictly
    follows their step-(i-1) reach time (reach time = that first event's
    timestamp). Repeated step names are allowed (e.g. view -> view) — each
    occurrence must strictly follow the previous reach."""
    assert steps, "steps must be non-empty"
    nparts = _nparts()
    step_idx = {s: i for i, s in enumerate(steps)}  # first index wins
    k = len(steps)

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        m = df[event_col].isin(step_idx).to_numpy()
        d = df[m]
        ent = d[by].to_numpy()
        h = pd.util.hash_array(ent) % np.uint64(nparts)
        return pd.DataFrame(
            {
                "ent": ent,
                "t": d[ts].to_numpy().astype("datetime64[us]").view("i8"),
                "e": d[event_col].to_numpy(),
                "__b": h.astype(np.int64),
            }
        )

    bucketed = events.map_batches(slim, batch_format="pandas")

    def bucket_funnel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ent", "t"], kind="mergesort")
        uid, _ = pd.factorize(g["ent"], sort=False)
        n_users = int(uid.max()) + 1 if len(uid) else 0
        tsv = g["t"].to_numpy()
        et = g["e"].to_numpy()
        prev = np.full(n_users, _ALWAYS, dtype=np.int64)
        users = np.zeros(k, dtype=np.int64)
        for i, s in enumerate(steps):
            m = (et == s) & (tsv > prev[uid])
            reached, first = np.unique(uid[m], return_index=True)
            users[i] = len(reached)
            nxt = np.full(n_users, _NEVER, dtype=np.int64)
            # rows are ts-sorted within entity, so the first qualifying
            # occurrence IS the earliest qualifying event
            nxt[reached] = tsv[m][first]
            prev = nxt
        return pd.DataFrame(
            {
                "step_idx": np.arange(k, dtype=np.int64),
                "step": list(steps),
                "users": users,
            }
        )

    parts = compact_nonempty(
        bucketed.groupby("__b").map_groups(bucket_funnel, batch_format="pandas"),
        pa.schema(
            [("step_idx", pa.int64()), ("step", pa.string()), ("users", pa.int64())]
        ),
    )
    merged = sum_partials(parts, keys=["step_idx", "step"], sum_cols=["users"])
    # SQL-twin parity: every step appears even with zero reach (an all-miss
    # corpus produces no buckets at all) — output is k rows, driver-trivial
    mdf = (
        merged.to_pandas()
        if merged.count()
        else pd.DataFrame(columns=["step_idx", "step", "users"])
    )
    full = pd.DataFrame(
        {"step_idx": np.arange(k, dtype=np.int64), "step": list(steps)}
    )
    out = full.merge(mdf, on=["step_idx", "step"], how="left")
    out["users"] = (
        pd.to_numeric(out["users"], errors="coerce").fillna(0).astype(np.int64)
    )
    return ray.data.from_pandas(out)


def funnel_oracle_sql(
    steps: list[str],
    *,
    table: str = "events",
    by: str = "user_id",
    ts: str = "ts",
    event_col: str = "event_type",
) -> str:
    """DuckDB twin: chained CTEs — step i's reach time is the MIN ts of a
    step-i event strictly after step (i-1)'s reach time."""
    ctes = [
        f"s0 AS (SELECT {by} AS ent, MIN({ts}) AS t FROM {table} "
        f"WHERE {event_col} = '{steps[0]}' GROUP BY 1)"
    ]
    for i, s in enumerate(steps[1:], start=1):
        ctes.append(
            f"s{i} AS (SELECT e.{by} AS ent, MIN(e.{ts}) AS t FROM {table} e "
            f"JOIN s{i - 1} p ON e.{by} = p.ent AND e.{ts} > p.t "
            f"WHERE e.{event_col} = '{s}' GROUP BY 1)"
        )
    selects = [
        f"SELECT {i}::BIGINT AS step_idx, '{s}' AS step, "
        f"(SELECT COUNT(*) FROM s{i})::BIGINT AS users"
        for i, s in enumerate(steps)
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(selects)
        + "\nORDER BY step_idx"
    )
