"""Grouped z-score outlier flagging — integer-EXACT decision semantics.

Flags rows whose int64 ``val_col`` deviates from its group's mean by more
than ``z`` population standard deviations. The decision is evaluated as the
integer inequality

    (n*x - S)^2  >  z^2 * (n*Q - S^2)        (n, S=Σx, Q=Σx² per group)

which is the z-score test cleared of divisions and square roots — so a SQL
twin computes the identical predicate with HUGEINT arithmetic and no float
comparison ever decides a row (the repo's float-parity discipline: DuckDB
float kernels reassociate, integers don't lie).

Products of int64s overflow int64, so the kernel compares in float64 first
and re-evaluates ONLY the rows whose two sides land within a conservative
relative margin (≈1e-9) with Python arbitrary-precision integers — exact at
any magnitude, vectorized everywhere except the boundary sliver.

Scale shape: one combine-before-shuffle stats pass (per-block (key, n, S,
Q) partials -> ``sum_partials``), then the group-stats table — bounded by
key cardinality — broadcasts once via ``ray.put`` and flagging is MAP-ONLY
(per-batch pandas merge against the broadcast). No row-level shuffle at
any size; above ``merge_partials``' driver limit the stats pass falls back
to the distributed aggregate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

from knowledgegraphs_ray.util.fastagg import sum_partials

_REL_MARGIN = 1e-9


def _stats_partials(key_cols: list[str], val_col: str):
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    **{k: pd.Series([], dtype=df[k].dtype) for k in key_cols},
                    "n": pd.Series([], dtype="int64"),
                    "s": pd.Series([], dtype="int64"),
                    "q": pd.Series([], dtype="int64"),
                }
            )
        v = df[val_col].to_numpy().astype(np.int64)
        g = df.assign(_v=v, _q=v * v).groupby(key_cols, sort=False)
        out = g.agg(n=("_v", "size"), s=("_v", "sum"), q=("_q", "sum"))
        return out.reset_index()

    return partial


def _flag(stats_ref, key_cols: list[str], val_col: str, z2: int):
    def flag(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            out = df.copy()
            out["is_outlier"] = pd.Series([], dtype="bool")
            return out
        stats = ray.get(stats_ref)
        m = df.merge(stats, on=key_cols, how="left", sort=False)
        n = m["n"].to_numpy().astype(np.float64)
        s = m["s"].to_numpy().astype(np.float64)
        q = m["q"].to_numpy().astype(np.float64)
        x = df[val_col].to_numpy().astype(np.float64)
        lhs = (n * x - s) ** 2
        rhs = z2 * (n * q - s * s)
        margin = _REL_MARGIN * np.maximum(np.abs(lhs), np.abs(rhs))
        flags = lhs > rhs
        near = np.abs(lhs - rhs) <= margin
        if near.any():  # boundary sliver: exact arbitrary-precision integers
            ni = m["n"].to_numpy().astype(np.int64)
            si = m["s"].to_numpy().astype(np.int64)
            qi = m["q"].to_numpy().astype(np.int64)
            xi = df[val_col].to_numpy().astype(np.int64)
            for i in np.flatnonzero(near):
                d = int(ni[i]) * int(xi[i]) - int(si[i])
                flags[i] = d * d > z2 * (int(ni[i]) * int(qi[i]) - int(si[i]) ** 2)
        out = df.copy()
        out["is_outlier"] = flags
        return out

    return flag


def group_zscore_outliers(
    ds: ray.data.Dataset,
    *,
    key_cols: list[str],
    val_col: str,
    z2: int = 4,
    driver_limit: int = 5_000_000,
) -> ray.data.Dataset:
    """-> ``ds`` + ``is_outlier``: true iff (n*x - S)^2 > z2 * (n*Q - S^2)
    within the row's group (z2 = z squared, so 4 = two population sigmas).
    ``val_col`` must be int64 (quantize floats upstream); per-group Q = Σx²
    must fit int64 — |x| ≤ 3M leaves room for a billion rows per group."""
    stats = sum_partials(
        ds.map_batches(_stats_partials(key_cols, val_col), batch_format="pandas"),
        keys=key_cols,
        sum_cols=["n", "s", "q"],
        driver_limit=driver_limit,
    ).to_pandas()
    return ds.map_batches(
        _flag(ray.put(stats), key_cols, val_col, z2), batch_format="pandas"
    )
