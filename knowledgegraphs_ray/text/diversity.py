"""Per-group n-gram diversity — the distinct-n measure (Li et al. 2016's
distinct-N generalized to shingles): for each group (e.g. language or
source), the total shingle count, the DISTINCT shingle count, and their
ratio. Low diversity flags templated / machine-generated / mode-collapsed
slices of a corpus before they enter a training mix.

Gram identity is the exact shingle hash shared with the minhash family
(``dedup.minhash.shingle_stream`` — token Horner fold + 3-shingle
combine, short-doc raw-token fallback), so the DuckDB twin reuses the
proven ``tok_sh_cte`` verbatim.

Scale shape: each block emits its PER-BLOCK-UNIQUE (group, gram) rows
with the block-local multiplicity — the only thing that ever moves
(~24 B/row, bounded by distinct-per-block x blocks). One
``merge_partials`` sums multiplicities per (group, gram); the final fold
(count + sum per group) is one polars pass over the distinct rows.
Above ``driver_limit`` distinct rows this tier fails fast — at that
scale use per-group HLL sketches (same split as ``text/overlap.py``).

Determinism: counts and the ``* 1_000_000 // total`` ratio are int64
end to end — bit-exact at any parallelism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from knowledgegraphs_ray.dedup.minhash import shingle_stream, tok_sh_cte
from knowledgegraphs_ray.util.fastagg import merge_partials


def ngram_diversity(
    docs: ray.data.Dataset,
    *,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    driver_limit: int = 50_000_000,
) -> ray.data.Dataset:
    """-> one row per group: (group_col, n_grams, n_distinct,
    diversity_micro) with diversity_micro = n_distinct * 1e6 // n_grams
    (0 for an all-empty group)."""

    def block(batch: pa.Table) -> pd.DataFrame:
        _, flat, seglens = shingle_stream(
            batch, id_col=id_col, text_col=text_col, k=shingle_k
        )
        grp = np.repeat(
            np.asarray(batch[group_col].to_pandas(), dtype=object), seglens
        )
        df = pd.DataFrame({"grp": grp, "g": flat.view(np.int64)})
        part = df.groupby(["grp", "g"], sort=False).size().rename("c").reset_index()
        part["c"] = part["c"].astype(np.int64)
        return part

    rows = docs.map_batches(
        block, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    n_partial = rows.count()
    if n_partial > driver_limit:
        # merge_partials' distributed fallback pays sort-shuffle constants
        # per distinct key — wrong tool at this size; fail fast toward a
        # per-group HLL sketch tier (see text/overlap.py's split)
        raise ValueError(
            f"{n_partial} (group, gram) partial rows exceed driver_limit="
            f"{driver_limit} — sketch per-group distincts with HLL instead"
        )
    distinct = merge_partials(
        rows, keys=["grp", "g"], agg={"c": "sum"}, driver_limit=n_partial + 1
    ).materialize()
    import polars as pl

    pdf = pl.from_pandas(distinct.to_pandas())
    if pdf.height == 0:
        return ray.data.from_pandas(
            pd.DataFrame(
                columns=[group_col, "n_grams", "n_distinct", "diversity_micro"]
            )
        )
    agg = (
        pdf.group_by("grp")
        .agg(
            pl.col("c").sum().cast(pl.Int64).alias("n_grams"),
            pl.len().cast(pl.Int64).alias("n_distinct"),
        )
        .with_columns(
            pl.when(pl.col("n_grams") > 0)
            .then(pl.col("n_distinct") * 1_000_000 // pl.col("n_grams"))
            .otherwise(0)
            .cast(pl.Int64)
            .alias("diversity_micro")
        )
        .rename({"grp": group_col})
        .sort(group_col)
    )
    return ray.data.from_arrow(agg.to_arrow())


def ngram_diversity_oracle_sql(
    *,
    table: str = "documents",
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin: the shared tok/sh CTE, unnested, re-joined to the
    group column, COUNT vs COUNT DISTINCT per group."""
    cte = tok_sh_cte(table=table, id_col=id_col, text_col=text_col)
    return f"""
WITH {cte}, x AS (
  SELECT d.{group_col}, u.g
  FROM sh JOIN {table} d ON d.{id_col} = sh.doc_id, unnest(sh.s) AS u(g)
)
SELECT {group_col},
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(DISTINCT g) AS BIGINT) AS n_distinct,
       CAST((count(DISTINCT g) * 1000000) // count(*) AS BIGINT)
         AS diversity_micro
FROM x GROUP BY {group_col} ORDER BY {group_col}
""".strip()
