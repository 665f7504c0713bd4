"""n-gram (token-set) Jaccard near-duplicate pairs with prefix blocking.

The oracle-friendly dedup variant: block documents by a text prefix, compare
all pairs within a block by token-SET Jaccard, report intersection/union as
INTEGER counts (engine-portable — no float summation order issues).
Blocking assumption (documented per SURVEY.md §2 custom-operator rule):
near-duplicates share their leading characters; pairs that differ in the
first ``prefix_len`` chars are not candidates. MinHash (dedup.minhash)
covers prefix-divergent near-dups.
"""

from __future__ import annotations

import pandas as pd
import polars as pl
import pyarrow as pa
import ray.data

TOKEN_RE = "[a-z0-9_]+"


def add_block_and_tokens(
    batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text", prefix_len: int = 16
) -> pa.Table:
    df = pl.from_arrow(batch.select([id_col, text_col]))
    out = df.select(
        pl.col(id_col),
        pl.col(text_col).str.slice(0, prefix_len).alias("block"),
        pl.col(text_col)
        .str.to_lowercase()
        .str.extract_all(TOKEN_RE)
        .list.unique()
        .alias("toks"),
    )
    return out.to_arrow()


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_len: int = 16,
    threshold_pct: int = 60,
    max_block: int = 1000,
) -> ray.data.Dataset:
    """-> (doc_a, doc_b, n_inter, n_union) for pairs with
    Jaccard >= threshold_pct/100, integer-exact (n_inter*100 >= pct*n_union)."""

    blocked = ds.map_batches(
        lambda b: add_block_and_tokens(
            b, id_col=id_col, text_col=text_col, prefix_len=prefix_len
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col).head(max_block)
        ids = g[id_col].to_numpy()
        toks = [set(t) for t in g["toks"]]
        rows = {"doc_a": [], "doc_b": [], "n_inter": [], "n_union": []}
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = len(toks[i] & toks[j])
                union = len(toks[i] | toks[j])
                if union and inter * 100 >= threshold_pct * union:
                    rows["doc_a"].append(ids[i])
                    rows["doc_b"].append(ids[j])
                    rows["n_inter"].append(inter)
                    rows["n_union"].append(union)
        return pd.DataFrame(rows).astype(
            {"doc_a": "int64", "doc_b": "int64", "n_inter": "int64", "n_union": "int64"}
        )

    return blocked.groupby("block").map_groups(pairs, batch_format="pandas")


def ngram_pairs_oracle_sql(
    *, prefix_len: int = 16, threshold_pct: int = 60, table: str = "documents"
) -> str:
    """DuckDB twin of ``ngram_jaccard_pairs`` (same blocking, same integer
    threshold arithmetic)."""
    return f"""
WITH d AS (
  SELECT doc_id, substr(text, 1, {prefix_len}) AS block,
         list_distinct(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS toks
  FROM {table}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS n_inter,
       CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS BIGINT) AS n_union
FROM d a JOIN d b ON a.block = b.block AND a.doc_id < b.doc_id
WHERE len(list_distinct(list_concat(a.toks, b.toks))) > 0
  AND len(list_intersect(a.toks, b.toks)) * 100 >=
      {threshold_pct} * len(list_distinct(list_concat(a.toks, b.toks)))
"""
