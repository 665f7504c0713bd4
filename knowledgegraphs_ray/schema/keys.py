"""Candidate-key and foreign-key discovery from data.

Reference: TabularSpecificRules.java:57-144 — a column is a candidate key if
its distinct count equals the row count (A1, `TabularFilesReader` unique
sets); an FK edge src.col -> ref.key is inferred when every src value is
contained in ref.key (J5 isJoin, RelationalDB.java:111-115).

Ray-Data-first: distinct counts via per-block partial distincts (hash sets
per block) merged with a tiny groupby — the corpus never ships whole;
containment via the broadcast semi-join of ``extract.containment``.
"""

from __future__ import annotations

import pandas as pd
import polars as pl
import pyarrow as pa
import ray.data

from knowledgegraphs_ray.extract.containment import containment_check


def distinct_counts(
    ds: ray.data.Dataset,
    columns: list[str] | None = None,
    *,
    driver_limit: int = 2_000_000,
    approx: bool = False,
) -> pd.DataFrame:
    """-> (column, n_distinct, n_rows) via per-block partial distincts.

    Three tiers (the output is always one tiny row per column):

    * driver merge — below ``driver_limit`` total partial distinct values,
      one polars pass over the collected partials (exact, fast);
    * distributed exact — above the limit, the partial values become
      (column, value) rows deduped with a Dataset groupby, and the per-column
      counts come back through ``fastagg.sum_partials``; the driver never
      holds the value set (a near-unique column — the exact thing this
      operator looks for — no longer makes the driver corpus-sized);
    * ``approx=True`` — mergeable HyperLogLog sketches (``util.hll``,
      ~1.6 % error): per-block registers combined by elementwise max inside
      each batch, one 4 KiB row per (column, batch) to the driver.
    """
    columns = columns or ds.schema().names

    if approx:
        return _distinct_counts_hll(ds, columns)

    def partial(batch: pa.Table) -> pd.DataFrame:
        out = []
        df = pl.from_arrow(batch)
        for c in columns:
            vals = df[c].unique().drop_nulls()
            out.append(
                {
                    "column": c,
                    "values": vals.cast(pl.Utf8).to_list(),
                    "n_vals": len(vals),
                    "n_rows": batch.num_rows,
                }
            )
        return pd.DataFrame(out)

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    if parts.sum("n_vals") <= driver_limit:
        pdf = parts.to_pandas()
        rows = []
        for c, g in pdf.groupby("column"):
            distinct: set = set()
            for vs in g["values"]:
                distinct.update(vs)
            rows.append(
                {
                    "column": c,
                    "n_distinct": len(distinct),
                    "n_rows": int(g["n_rows"].sum()),
                }
            )
        return pd.DataFrame(rows).sort_values("column").reset_index(drop=True)

    # distributed exact: dedupe (column, value) rows with a groupby, then
    # count per column via partial sums (combine-before-shuffle both times)
    from knowledgegraphs_ray.util.fastagg import sum_partials

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        return df[["column", "values"]].explode("values").dropna().rename(
            columns={"values": "value"}
        )

    from ray.data.aggregate import Count

    distinct_rows = (
        parts.map_batches(explode, batch_format="pandas")
        .groupby(["column", "value"])
        .aggregate(Count(alias_name="cnt"))
    )
    count_parts = distinct_rows.map_batches(
        lambda df: df.groupby("column", as_index=False).size().rename(
            columns={"size": "n_distinct"}
        ),
        batch_format="pandas",
    )
    nd = sum_partials(count_parts, keys=["column"], sum_cols=["n_distinct"]).to_pandas()
    nr = sum_partials(
        parts.select_columns(["column", "n_rows"]),
        keys=["column"],
        sum_cols=["n_rows"],
    ).to_pandas()
    out = nd.merge(nr, on="column")
    return out.sort_values("column").reset_index(drop=True)


def _distinct_counts_hll(ds: ray.data.Dataset, columns: list[str]) -> pd.DataFrame:
    """Approximate tier: per-batch HLL registers, merged by max."""
    import numpy as np

    from knowledgegraphs_ray.util.hll import (
        DEFAULT_P,
        hll_add_hashes,
        hll_estimate,
        hll_merge,
        hll_new,
    )

    def sketch(batch: pa.Table) -> pd.DataFrame:
        df = pl.from_arrow(batch)
        out = []
        for c in columns:
            vals = df[c].drop_nulls()
            h = vals.hash(seed=7).to_numpy().astype(np.uint64)
            regs = hll_add_hashes(hll_new(DEFAULT_P), h)
            out.append({"column": c, "regs": regs, "n_rows": batch.num_rows})
        return pd.DataFrame(out)

    parts = ds.map_batches(sketch, batch_format="pyarrow", zero_copy_batch=True)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c, g in df.groupby("column"):
            regs = hll_new(DEFAULT_P)
            for r in g["regs"]:
                regs = hll_merge(regs, np.asarray(r, dtype=np.uint8))
            rows.append(
                {"column": c, "regs": regs, "n_rows": int(g["n_rows"].sum())}
            )
        return pd.DataFrame(rows)

    merged = parts.map_batches(combine, batch_format="pandas").to_pandas()
    final = combine(merged)
    final["n_distinct"] = [
        int(round(hll_estimate(np.asarray(r, dtype=np.uint8)))) for r in final["regs"]
    ]
    return (
        final[["column", "n_distinct", "n_rows"]]
        .sort_values("column")
        .reset_index(drop=True)
    )


def candidate_keys(ds: ray.data.Dataset, columns: list[str] | None = None) -> pd.DataFrame:
    """Columns whose distinct count == row count (null-free)."""
    dc = distinct_counts(ds, columns)
    dc["is_candidate_key"] = dc["n_distinct"] == dc["n_rows"]
    return dc.astype({"n_distinct": "int64", "n_rows": "int64"})


def fk_candidate_pairs(
    columns_by_table: dict[str, list[str]],
    keys: dict[str, list[str]],
) -> list[tuple[str, str, str, str]]:
    """Name-compatibility gate before any data check — the deterministic
    (src_table, src_col, ref_table, ref_key) candidate list shared by
    ``discover_fks`` and its SQL oracle."""
    pairs = []
    for tname, cols in columns_by_table.items():
        for ref_name, ref_keys in keys.items():
            if ref_name == tname:
                continue
            for rk in ref_keys:
                for col in cols:
                    if col == rk or col.endswith(rk) or rk.endswith(col.split("_")[-1]):
                        pairs.append((tname, col, ref_name, rk))
    return pairs


def discover_fks(
    tables: dict[str, ray.data.Dataset],
    keys: dict[str, list[str]],
) -> pd.DataFrame:
    """For every (table.column, ref_table.key) pair with compatible names,
    test containment; emit discovered FK edges.

    ``keys``: ref_table -> its candidate key columns (from candidate_keys).
    """
    rows = []
    cols_by_table = {t: ds.schema().names for t, ds in tables.items()}
    for tname, col, ref_name, rk in fk_candidate_pairs(cols_by_table, keys):
        res = containment_check(
            tables[tname].select_columns([col]), col,
            tables[ref_name].select_columns([rk]), rk,
        )
        if res["contained"] and res["n_src_rows"] > 0:
            rows.append(
                {
                    "src_table": tname,
                    "src_column": col,
                    "ref_table": ref_name,
                    "ref_column": rk,
                }
            )
    return pd.DataFrame(
        rows, columns=["src_table", "src_column", "ref_table", "ref_column"]
    ).sort_values(["src_table", "src_column", "ref_table"]).reset_index(drop=True)
