"""As-of (time-travel) join — keyed, ordered lookup of the latest right-side
row at or before each left-side timestamp.

Ray Data has no native as-of join; the documented composition (Ray guide):
co-locate both sides per key with one groupby, sort within the group, and
run ``pd.merge_asof`` per key. Partitioning assumption: one key's rows fit a
worker (salt hot keys upstream via ``canon.skew`` if not).

The per-group output schema is CONSTANT — columns and dtypes are projected
from the input schemas up front, never inferred from the data of a group
(a data-dependent ``dropna(axis=1)`` here used to make Ray log "RefBundle
with a different schema" warnings and break downstream Arrow ops).
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
    with right.ts < left.ts (strict) or <= (not strict). Left rows with no
    match get nulls (left-join semantics)."""

    left_cols = list(left.schema().names)
    rsel_cols = sorted(set([key, ts_col] + (right_cols or [])))
    rsel = right.select_columns(rsel_cols)
    rvalue_cols = [c for c in rsel_cols if c not in (key, ts_col)]
    # right value columns keep their name unless it collides with a left one
    out_name = {c: (c + suffix if c in left_cols else c) for c in rvalue_cols}
    out_name[ts_col] = ts_col + suffix
    out_cols = left_cols + [out_name[c] for c in rvalue_cols] + [ts_col + suffix]

    # dtype templates from the input schemas — constant across groups
    from knowledgegraphs_ray.util.blocks import empty_pandas_template

    l_template = empty_pandas_template(left)
    r_template = empty_pandas_template(rsel)
    out_template = l_template.copy()
    for c in rvalue_cols:
        out_template[out_name[c]] = r_template[c]
    out_template[ts_col + suffix] = r_template[ts_col]

    # widen both sides to one constant column set before the union so every
    # block in the shuffle shares a schema (no RefBundle schema warnings)
    import numpy as np

    union_cols = left_cols + [c for c in rsel_cols if c not in left_cols]

    def _nullable(dtype):
        # placeholder dtype that can hold a null for the absent side; per_key
        # casts each side back to its template dtype (values are non-null)
        if np.issubdtype(dtype, np.datetime64):
            return dtype
        if np.issubdtype(dtype, np.integer) or np.issubdtype(dtype, np.floating):
            return np.dtype("float64")
        return np.dtype("object")

    union_dtype = {
        c: _nullable(
            l_template[c].dtype if c in l_template.columns else r_template[c].dtype
        )
        for c in union_cols
    }

    def _null_value(dtype):
        return pd.NaT if np.issubdtype(dtype, np.datetime64) else np.nan

    def widen(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.assign(__side=side)
            for c in union_cols:
                if c not in df.columns:
                    df[c] = pd.Series(
                        _null_value(union_dtype[c]), dtype=union_dtype[c], index=df.index
                    )
            return df[union_cols + ["__side"]].astype(
                {c: union_dtype[c] for c in union_cols}
            )

        return fn

    lmark = left.map_batches(widen(0), batch_format="pandas")
    rmark = rsel.map_batches(widen(1), batch_format="pandas")
    both = lmark.union(rmark)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g["__side"] == 0, left_cols]
        r = g.loc[g["__side"] == 1, rsel_cols]
        if l.empty:
            return out_template.copy()
        l = l.sort_values(ts_col, kind="mergesort")
        # coerce to the template dtypes (the union upcasts disjoint columns)
        l = l.astype({c: out_template[c].dtype for c in left_cols})
        if r.empty:
            out = l.copy()
            for c in rvalue_cols + [ts_col]:
                dt = _nullable(out_template[out_name[c]].dtype)
                out[out_name[c]] = pd.Series(
                    _null_value(dt), dtype=dt, index=out.index
                )
            return out[out_cols]
        r = r.sort_values(ts_col, kind="mergesort")
        rr = r.drop(columns=[key]).rename(
            columns={c: out_name[c] for c in rvalue_cols}
        )
        # right value columns use the null-capable dtype in the OUTPUT too
        # (unmatched left rows hold nulls), so every group agrees on schema
        rr = rr.astype(
            {
                **{
                    out_name[c]: _nullable(out_template[out_name[c]].dtype)
                    for c in rvalue_cols
                },
                ts_col: out_template[ts_col].dtype,
            }
        )
        rr[ts_col + suffix] = rr[ts_col]
        out = pd.merge_asof(
            l,
            rr,
            on=ts_col,
            direction="backward",
            allow_exact_matches=not strict,
        )
        return out[out_cols]

    return both.groupby(key).map_groups(per_key, batch_format="pandas")
