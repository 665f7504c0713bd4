"""CDC changelog upsert — apply an (upsert | delete) changelog to a
keyed snapshot, latest-version-wins, in ONE pre-pruned row exchange.

The table-maintenance primitive behind incremental KG state: the
reference repo re-derives its per-table state from scratch on every run
(InsertDataBase.java rebuilds the triple store; the processed-file cache
in ``state/checkpoint.py`` only skips whole files). At 100 TB the engine
must instead *merge a delta into standing state* — dimension-table
maintenance, entity-profile updates, tombstoned retractions.

Semantics (latest-wins over a TOTAL version order):

* every row — snapshot and changelog — carries ``(ts, seq)``; the winner
  per key is the row with the lexicographically greatest ``(ts, seq)``.
  Callers must keep ``(ts, seq)`` unique per key across both inputs
  (``seq`` = event id / log offset does this for free); equal versions
  would tie-break non-deterministically and are asserted against inside
  each merge group.
* changelog rows carry ``op`` ∈ {'upsert', 'delete'}; a winning 'delete'
  removes the key. With ``keep_tombstones=True`` the winning delete row
  is RETAINED (with its ``op``) so the output can serve as the snapshot
  for the next incremental batch — without tombstones, an out-of-order
  older upsert in a later batch would resurrect a deleted key. The final
  materialization filters ``op != 'delete'``.
* associativity: ``upsert(upsert(S, C1), C2) == upsert(S, C1 ∪ C2)``
  whenever tombstones are kept or the batches are version-ordered
  (pytest pins both, including the resurrection counter-example).

Scale shape: per-block prune to latest-per-key FIRST (vectorized
sort + drop_duplicates — the combiner), so the single hash exchange
moves at most one row per (key, block); the per-bucket finish is one
vectorized pass per bucket, never per key. Payload columns ride along
untouched; nothing is ever collected on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data


def _nparts() -> int:
    return max(2, min(32, int(ray.cluster_resources().get("CPU", 8))))


_HELPER = "__src_rank"


def _latest_per_key(
    df: pd.DataFrame, key: str, ts_col: str, seq_col: str, *, check: bool = False
) -> pd.DataFrame:
    """Vectorized argmax per key over (ts, seq): one stable sort, keep the
    first row of each key group."""
    if df.empty:
        return df
    out = df.sort_values(
        [key, ts_col, seq_col], ascending=[True, False, False], kind="mergesort"
    ).drop_duplicates(subset=[key], keep="first")
    if check:
        dup = df.duplicated(subset=[key, ts_col, seq_col], keep=False)
        if bool(dup.any()):
            bad = df.loc[dup, key].iloc[0]
            raise ValueError(
                f"changelog_upsert: duplicate (key, ts, seq) version for key "
                f"{bad!r} — the (ts, seq) order must be total per key"
            )
    return out


def changelog_upsert(
    snapshot: ray.data.Dataset | None,
    changelog: ray.data.Dataset,
    *,
    key: str = "id",
    ts_col: str = "ts",
    seq_col: str = "seq",
    op_col: str = "op",
    keep_tombstones: bool = False,
) -> ray.data.Dataset:
    """Merge ``changelog`` into ``snapshot``; return the new snapshot.

    ``snapshot``: one live row per key, columns (key, payload..., ts, seq)
    and optionally ``op`` (a tombstoned snapshot from a previous
    incremental call). ``None`` or empty = cold start.
    ``changelog``: (key, payload..., ts, seq, op).

    Output columns = changelog columns (op included iff
    ``keep_tombstones``); one row per surviving key.
    """

    log_cols = list(changelog.schema().names)

    def norm_snapshot(df: pd.DataFrame) -> pd.DataFrame:
        if op_col not in df.columns:
            df = df.assign(**{op_col: "upsert"})
        # align column order to the changelog so union blocks agree
        return df[log_cols]

    parts = [changelog]
    if snapshot is not None:
        parts.append(snapshot.map_batches(norm_snapshot, batch_format="pandas"))
    allrows = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])

    nparts = _nparts()

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        # block-local prune (the combiner) + bucket assignment: the
        # exchange carries ≤ one row per (key, block)
        df = _latest_per_key(df, key, ts_col, seq_col)
        h = pd.util.hash_array(df[key].to_numpy()) % np.uint64(nparts)
        return df.assign(__b=h.astype(np.int64))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = _latest_per_key(g, key, ts_col, seq_col, check=True)
        if not keep_tombstones:
            g = g[g[op_col] != "delete"].drop(columns=[op_col])
        return g.drop(columns=["__b"])

    return (
        allrows.map_batches(combine, batch_format="pandas")
        .groupby("__b")
        .map_groups(finish, batch_format="pandas")
    )


def changelog_upsert_oracle_sql(
    snapshot_sql: str | None,
    changelog_sql: str,
    *,
    key: str = "id",
    ts_col: str = "ts",
    seq_col: str = "seq",
    op_col: str = "op",
    out_cols: str = "*",
) -> str:
    """DuckDB twin: row_number() over (key ORDER BY ts DESC, seq DESC),
    keep rn = 1, drop deletes. ``snapshot_sql`` rows must already carry
    ``op`` (or pass None)."""
    union = changelog_sql
    if snapshot_sql is not None:
        union = f"({changelog_sql}) UNION ALL ({snapshot_sql})"
    return f"""
WITH all_rows AS ({union}),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY {key} ORDER BY {ts_col} DESC, {seq_col} DESC
  ) AS __rn
  FROM all_rows
)
SELECT {out_cols} FROM ranked WHERE __rn = 1 AND {op_col} != 'delete'
"""
