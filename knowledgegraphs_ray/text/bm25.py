"""BM25 keyword search over the documents table — the lexical retrieval
twin of the embedding ANN operators (sim/ann.py), sharing their scale
shape: corpus statistics via tiny per-block partials, the query broadcast,
per-block scoring + local top-k, one bounded driver merge.

Determinism contract with the DuckDB oracle: idf uses ``math.log`` (libm —
bit-identical to DuckDB ``ln``; numpy.log differs by 1 ulp), the per-term
score is a FIXED expression tree evaluated in float64 (no reassociation),
and the per-doc score sums terms in query order — so scores hash-match
exactly, not just to tolerance.

Reference analogue: the reference ranks candidate ontology concepts with
tf-idf over annotation tokens (AnnotationIndex idf candidates, J2); this is
the full-corpus document-retrieval generalization.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import polars as pl
import pyarrow as pa
import ray
import ray.data

from knowledgegraphs_ray.text.analysis import TOKEN_RE


def _corpus_stats(
    docs: ray.data.Dataset, terms: list[str], *, text_col: str
) -> tuple[int, int, dict[str, int]]:
    """ONE streaming pass -> (n_docs, total_tokens, df per query term).
    Emits a single fixed-schema partial row per block; the driver sum is
    O(blocks x terms)."""

    def block(batch: pa.Table) -> pa.Table:
        toks = (
            pl.from_arrow(batch[text_col])
            .rename("t")
            .str.to_lowercase()
            .str.extract_all(TOKEN_RE)
        )
        row = {
            "n_docs": [len(batch)],
            "total_tokens": [int(toks.list.len().sum() or 0)],
        }
        for i, t in enumerate(terms):
            row[f"df_{i}"] = [int(toks.list.contains(t).sum() or 0)]
        return pa.table(row)

    pdf = (
        docs.map_batches(block, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    n_docs = int(pdf["n_docs"].sum())
    total = int(pdf["total_tokens"].sum())
    df = {t: int(pdf[f"df_{i}"].sum()) for i, t in enumerate(terms)}
    return n_docs, total, df


def bm25_topk(
    docs: ray.data.Dataset,
    query: str | list[str],
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """Top-k documents by BM25 (Robertson/Sparck-Jones, the ``+1`` idf
    variant: idf = ln((N - df + .5)/(df + .5) + 1), non-negative).

    -> DataFrame (id_col, score, rank) — k rows, rank 1-based, ties broken
    by ascending id. Per-block local top-k keeps the driver merge at
    O(k x blocks) regardless of corpus size."""
    terms = query.lower().split() if isinstance(query, str) else [t.lower() for t in query]
    n_docs, total_tokens, df = _corpus_stats(docs, terms, text_col=text_col)
    if n_docs == 0:
        return pd.DataFrame({id_col: [], "score": [], "rank": []})
    avgdl = total_tokens / n_docs
    idf = {t: math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0) for t in terms}

    def score_block(batch: pa.Table) -> pa.Table:
        lf = pl.from_arrow(batch.select([id_col, text_col]))
        toks = lf[text_col].str.to_lowercase().str.extract_all(TOKEN_RE)
        dl = toks.list.len().to_numpy().astype(np.float64)
        score = np.zeros(len(lf), dtype=np.float64)
        denom_base = k1 * (1.0 - b + b * dl / avgdl)
        for t in terms:  # fixed query order == the SQL expression order
            tf = toks.list.count_matches(t).to_numpy().astype(np.float64)
            score = score + idf[t] * (tf * (k1 + 1.0)) / (tf + denom_base)
        ids = lf[id_col].to_numpy()
        top = np.lexsort((ids, -score))[:k]
        return pa.table(
            {
                id_col: pa.array(ids[top]),
                "score": pa.array(score[top], pa.float64()),
            }
        )

    part = docs.map_batches(
        score_block, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    top = part.sort_values(
        ["score", id_col], ascending=[False, True], kind="mergesort"
    ).head(k)
    top = top.reset_index(drop=True)
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top


def bm25_oracle_sql(
    query: str | list[str],
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin with the IDENTICAL expression tree (see module docstring)."""
    terms = query.lower().split() if isinstance(query, str) else [t.lower() for t in query]
    tf_cols = ",\n    ".join(
        f"CAST(len(list_filter(toks, x -> x = '{t}')) AS DOUBLE) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"CAST(count(*) FILTER (WHERE list_contains(toks, '{t}')) AS BIGINT) AS df_{i}"
        for i, t in enumerate(terms)
    )
    score_terms = " + ".join(
        f"ln((s.n_docs - s.df_{i} + 0.5) / (s.df_{i} + 0.5) + 1.0)"
        f" * (tf_{i} * ({k1} + 1.0)) / (tf_{i} + {k1} * (1.0 - {b} + {b} * dl / s.avgdl))"
        for i in range(len(terms))
    )
    return f"""
WITH tok AS (
  SELECT {id_col}, regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks FROM {table}
),
s AS (
  SELECT count(*) AS n_docs,
         CAST(sum(len(toks)) AS DOUBLE) / count(*) AS avgdl,
         {df_cols}
  FROM tok
),
scored AS (
  SELECT {id_col}, CAST(len(toks) AS DOUBLE) AS dl,
    {tf_cols}
  FROM tok
)
SELECT {id_col}, {score_terms} AS score,
       CAST(row_number() OVER (ORDER BY {score_terms} DESC, {id_col}) AS BIGINT) AS rank
FROM scored, s
QUALIFY rank <= {k}
""".strip()
