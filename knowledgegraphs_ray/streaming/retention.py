"""Cohort retention analysis over an event stream — for each signup
cohort (the epoch-week of an entity's FIRST event), how many distinct
entities are still active N weeks later.

Events-analytics companion to ``streaming/funnel.py``; the reference
models event streams only as KG rows (`events` virtual dimension), so
this is an engine-first operator for the events table.

Scale shape: events slim to (entity, epoch-week) AT THE READ, ONE hash
exchange co-locates each entity's rows (an entity lives in exactly one
bucket), and the per-bucket scan is fully vectorized: drop-duplicate
(entity, week), ``np.minimum.at`` for the cohort week, one groupby-size
for the (cohort, offset) partials. Partial user counts add exactly
across buckets, so the merge is a slim ``sum_partials`` over
O(cohorts x offsets x buckets) rows.

Determinism: the week index is int64 floor division of the microsecond
epoch (``ts // 604_800_000_000``) — numpy ``//`` floors and DuckDB's
integer ``//`` floors, so the twin (:func:`retention_oracle_sql`) is
bit-exact at any parallelism, including pre-1970 timestamps.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from knowledgegraphs_ray.util.blocks import compact_nonempty
from knowledgegraphs_ray.util.fastagg import sum_partials

WEEK_US = 604_800_000_000


def _nparts() -> int:
    return max(2, min(32, int(ray.cluster_resources().get("CPU", 8))))


def retention_cohorts(
    events: ray.data.Dataset,
    *,
    by: str = "user_id",
    ts: str = "ts",
    week_us: int = WEEK_US,
) -> ray.data.Dataset:
    """-> (cohort_week, week_offset, users): ``users`` distinct ``by``
    entities whose first-ever event falls in epoch week ``cohort_week``
    and who have at least one event in week ``cohort_week +
    week_offset``. Offset 0 rows give cohort sizes; users / cohort size
    at each offset is the classic retention curve."""
    nparts = _nparts()

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        ent = df[by].to_numpy()
        wk = df[ts].to_numpy().astype("datetime64[us]").view("i8") // week_us
        out = pd.DataFrame({"ent": ent, "wk": wk})
        # per-block dedup: the exchange carries at most one row per
        # (entity, week) per block, not one per event
        out = out.drop_duplicates()
        h = pd.util.hash_array(out["ent"].to_numpy()) % np.uint64(nparts)
        out["__b"] = h.astype(np.int64)
        return out

    bucketed = events.map_batches(slim, batch_format="pandas")

    def bucket_retention(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["ent", "wk"])
        uid, _ = pd.factorize(g["ent"], sort=False)
        n_users = int(uid.max()) + 1 if len(uid) else 0
        wk = g["wk"].to_numpy()
        first = np.full(n_users, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(first, uid, wk)
        cohort = first[uid]
        part = (
            pd.DataFrame({"cohort_week": cohort, "week_offset": wk - cohort})
            .groupby(["cohort_week", "week_offset"], sort=False)
            .size()
            .rename("users")
            .reset_index()
        )
        part["users"] = part["users"].astype(np.int64)
        return part

    parts = compact_nonempty(
        bucketed.groupby("__b").map_groups(bucket_retention, batch_format="pandas"),
        pa.schema(
            [
                ("cohort_week", pa.int64()),
                ("week_offset", pa.int64()),
                ("users", pa.int64()),
            ]
        ),
    )
    return sum_partials(
        parts, keys=["cohort_week", "week_offset"], sum_cols=["users"]
    )


def retention_oracle_sql(
    *,
    table: str = "events",
    by: str = "user_id",
    ts: str = "ts",
    week_us: int = WEEK_US,
) -> str:
    """DuckDB twin: MIN week per entity, then COUNT(DISTINCT entity) per
    (cohort week, offset) — the same int64 floor-divided week index."""
    return f"""
WITH w AS (
  SELECT {by} AS ent, epoch_us({ts}) // {week_us} AS wk FROM {table}
),
f AS (SELECT ent, MIN(wk) AS cw FROM w GROUP BY 1)
SELECT f.cw AS cohort_week, w.wk - f.cw AS week_offset,
       CAST(COUNT(DISTINCT w.ent) AS BIGINT) AS users
FROM w JOIN f USING (ent)
GROUP BY 1, 2
ORDER BY 1, 2
""".strip()
