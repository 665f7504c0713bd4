"""As-of (time-travel) join — keyed, ordered lookup of the latest right-side
row at or before each left-side timestamp.

Ray Data has no native as-of join; the documented composition (Ray guide):
co-locate both sides per key with one groupby, sort within the group, and
run ``pd.merge_asof`` per key. Partitioning assumption: one key's rows fit a
worker (salt hot keys upstream via ``canon.skew`` if not).
"""

from __future__ import annotations

import pandas as pd
import ray.data


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    key: str,
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    strict: bool = True,
) -> ray.data.Dataset:
    """For every left row: columns of the latest right row of the same key
    with right.ts < left.ts (strict) or <= (not strict). Right rows with no
    match produce nulls (left join semantics)."""

    lmark = left.map_batches(
        lambda df: df.assign(__side=0), batch_format="pandas"
    )
    rsel = right if right_cols is None else right.select_columns(
        sorted(set([key, ts_col] + right_cols))
    )
    rmark = rsel.map_batches(lambda df: df.assign(__side=1), batch_format="pandas")
    both = lmark.union(rmark)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == 0].drop(columns="__side").dropna(axis=1, how="all")
        r = g[g["__side"] == 1].drop(columns="__side").dropna(axis=1, how="all")
        if l.empty:
            return pd.DataFrame()
        l = l.sort_values(ts_col, kind="mergesort")
        if r.empty:
            out = l.copy()
            cols = right_cols or []
            for c in cols:
                out[c + suffix] = pd.NA
            out[ts_col + suffix] = pd.NaT
            return out
        r = r.sort_values(ts_col, kind="mergesort")
        out = pd.merge_asof(
            l,
            r.drop(columns=[key]),
            on=ts_col,
            direction="backward",
            allow_exact_matches=not strict,
            suffixes=("", suffix),
        )
        # keep the matched right timestamp explicit
        if ts_col + suffix not in out.columns:
            # merge_asof drops the right ts; recompute it via a second asof on ts only
            rr = r[[ts_col]].copy()
            rr[ts_col + suffix] = rr[ts_col]
            out = pd.merge_asof(
                out, rr, on=ts_col, direction="backward", allow_exact_matches=not strict
            )
        return out

    return both.groupby(key).map_groups(per_key, batch_format="pandas")
