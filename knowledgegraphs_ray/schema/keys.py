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
    ds: ray.data.Dataset, columns: list[str] | None = None
) -> pd.DataFrame:
    """-> (column, n_distinct, n_rows) via per-block partial distincts.

    Each block contributes its local distinct values (deduped), the partials
    are unioned per column with one polars pass — exact, and the shuffle
    volume is bounded by the true cardinality, not the row count. For
    ultra-high-cardinality columns at 100 TB swap the exact set for a
    mergeable HLL sketch (same pipeline shape)."""
    columns = columns or ds.schema().names

    def partial(batch: pa.Table) -> pd.DataFrame:
        out = []
        df = pl.from_arrow(batch)
        for c in columns:
            vals = df[c].unique().drop_nulls()
            out.append(
                {
                    "column": c,
                    "values": vals.cast(pl.Utf8).to_list(),
                    "n_rows": batch.num_rows,
                }
            )
        return pd.DataFrame(out)

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    rows = []
    for c, g in parts.groupby("column"):
        distinct: set = set()
        for vs in g["values"]:
            distinct.update(vs)
        rows.append(
            {"column": c, "n_distinct": len(distinct), "n_rows": int(g["n_rows"].sum())}
        )
    return pd.DataFrame(rows).sort_values("column").reset_index(drop=True)


def candidate_keys(ds: ray.data.Dataset, columns: list[str] | None = None) -> pd.DataFrame:
    """Columns whose distinct count == row count (null-free)."""
    dc = distinct_counts(ds, columns)
    dc["is_candidate_key"] = dc["n_distinct"] == dc["n_rows"]
    return dc.astype({"n_distinct": "int64", "n_rows": "int64"})


def discover_fks(
    tables: dict[str, ray.data.Dataset],
    keys: dict[str, list[str]],
) -> pd.DataFrame:
    """For every (table.column, ref_table.key) pair with compatible names or
    types, test containment; emit discovered FK edges.

    ``keys``: ref_table -> its candidate key columns (from candidate_keys).
    """
    rows = []
    for tname, ds in tables.items():
        cols = ds.schema().names
        for ref_name, ref_keys in keys.items():
            if ref_name == tname:
                continue
            for rk in ref_keys:
                for col in cols:
                    # cheap name-compatibility gate before the data check
                    if col == rk or col.endswith(rk) or rk.endswith(col.split("_")[-1]):
                        res = containment_check(
                            ds.select_columns([col]), col,
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
