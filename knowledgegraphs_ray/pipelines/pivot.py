"""Pivot (long -> wide) aggregation: one output row per group key, one
column pair per category of a pivot column — the report-shaped projection
every analytics consumer asks of an event log (SQL ``PIVOT`` /
``SUM(CASE WHEN ...)``).

Distributed shape: the category vocabulary is FIXED by the caller (the
contract that keeps output schema deterministic and partials bounded), so
each block computes a (group x category) partial in one vectorized pandas
pass and only |groups| x |categories|-bounded partial rows move through
``fastagg.sum_partials`` — the combine-before-shuffle discipline, never a
per-event exchange. Categories outside the vocabulary pool into an
``other`` column (droppable), mirroring the bounded-vocab OOV pooling of
``text/lm.py``.

Money stays in integer cents (the engine-wide rule), so the DuckDB
``SUM(CASE ...)`` twin is bit-exact.

Reference anchor: the reference's per-class/per-predicate count tables
(POextractor summary maps) are driver-side dict folds; this is the
distributed generalization (SURVEY.md §2 A-family).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from knowledgegraphs_ray.util.fastagg import sum_partials


def pivot_counts(
    ds: ray.data.Dataset,
    *,
    group_col: str,
    pivot_col: str,
    categories: list[str],
    value_cents_col: str | None = None,
    include_other: bool = True,
    driver_limit: int = 5_000_000,
) -> ray.data.Dataset:
    """One row per ``group_col`` value; per category c in ``categories``:
    ``n_<c>`` = event count and (with ``value_cents_col``) ``cents_<c>`` =
    integer-cent sum. Unlisted categories pool into ``n_other`` /
    ``cents_other`` when ``include_other``."""
    cats = list(categories)
    assert len(cats) == len(set(cats)), "duplicate pivot categories"
    sum_cols = [f"n_{c}" for c in cats]
    if include_other:
        sum_cols.append("n_other")
    if value_cents_col is not None:
        sum_cols += [f"cents_{c}" for c in cats]
        if include_other:
            sum_cols.append("cents_other")

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "g": batch[group_col].to_numpy(zero_copy_only=False),
                "c": batch[pivot_col].to_numpy(zero_copy_only=False),
            }
        )
        if value_cents_col is not None:
            df["v"] = batch[value_cents_col].to_numpy(zero_copy_only=False)
        # SQL-twin NULL semantics: a NULL pivot value matches NO category
        # (NOT IN yields NULL -> ELSE 0 in the oracle), so it lands in the
        # dropped "__null__" bucket — but its GROUP row must still appear,
        # so the row stays in the groupby rather than being filtered out.
        is_null = df["c"].isna()
        known = df["c"].isin(cats) & ~is_null
        df.loc[~known, "c"] = "__other__"
        df.loc[is_null, "c"] = "__null__"
        agg = {"n": ("c", "size")}
        if value_cents_col is not None:
            agg["v"] = ("v", "sum")
        # dropna=False semantics: the oracle keeps NULL group keys as a real
        # group — factorize with NaN as its own code so the pandas pivot
        # (whose NaN-index handling is version-dependent) never sees nulls
        gcodes, guniques = pd.factorize(df["g"], use_na_sentinel=False)
        df["g"] = gcodes
        p = df.groupby(["g", "c"], as_index=False).agg(**agg)
        wide = p.pivot(index="g", columns="c", values="n").fillna(0)
        out = pd.DataFrame({group_col: pd.Series(guniques)[wide.index].to_numpy()})
        for c in cats:
            out[f"n_{c}"] = (
                wide[c].to_numpy() if c in wide.columns else 0
            )
        if include_other:
            out["n_other"] = (
                wide["__other__"].to_numpy() if "__other__" in wide.columns else 0
            )
        if value_cents_col is not None:
            widev = p.pivot(index="g", columns="c", values="v").fillna(0)
            for c in cats:
                out[f"cents_{c}"] = (
                    widev[c].to_numpy() if c in widev.columns else 0
                )
            if include_other:
                out["cents_other"] = (
                    widev["__other__"].to_numpy()
                    if "__other__" in widev.columns
                    else 0
                )
        for c in out.columns:
            if c != group_col:
                out[c] = out[c].astype("int64")
        return out

    merged = sum_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=[group_col],
        sum_cols=sum_cols,
        driver_limit=driver_limit,
    )
    return merged


def pivot_oracle_sql(
    *,
    table: str,
    group_col: str,
    pivot_col: str,
    categories: list[str],
    value_cents_expr: str | None = None,
    include_other: bool = True,
) -> str:
    """SUM(CASE ...) twin with the identical column naming and OOV pool.
    Category values are escaped for SQL string literals (embedded quotes)."""
    cols = []

    def lit(c: str) -> str:
        return "'" + c.replace("'", "''") + "'"

    in_list = ", ".join(lit(c) for c in categories)
    for c in categories:
        cols.append(
            f"CAST(SUM(CASE WHEN {pivot_col} = {lit(c)} THEN 1 ELSE 0 END) "
            f"AS BIGINT) AS n_{c}"
        )
    if include_other:
        cols.append(
            f"CAST(SUM(CASE WHEN {pivot_col} NOT IN ({in_list}) THEN 1 "
            f"ELSE 0 END) AS BIGINT) AS n_other"
        )
    if value_cents_expr is not None:
        for c in categories:
            cols.append(
                f"CAST(SUM(CASE WHEN {pivot_col} = {lit(c)} THEN "
                f"{value_cents_expr} ELSE 0 END) AS BIGINT) AS cents_{c}"
            )
        if include_other:
            cols.append(
                f"CAST(SUM(CASE WHEN {pivot_col} NOT IN ({in_list}) THEN "
                f"{value_cents_expr} ELSE 0 END) AS BIGINT) AS cents_other"
            )
    sel = ",\n  ".join(cols)
    return (
        f"SELECT {group_col},\n  {sel}\nFROM {table} "
        f"GROUP BY {group_col} ORDER BY {group_col}"
    )
