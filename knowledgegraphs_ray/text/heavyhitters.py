"""Frequent-token / heavy-hitter operators over the documents table.

Two tiers, the standard two-pass exact design for unbounded key spaces:

* ``frequent_tokens`` — EXACT: per-block partial (token, n) counts
  (combine-before-shuffle) merged via ``fastagg.merge_partials`` and
  filtered to ``min_count``. The merged table is one row per distinct
  token; above ``driver_limit`` partials the merge is the distributed
  aggregate, so nothing here is corpus-sized on the driver.
* ``heavy_hitters_sketch`` — BOUNDED MEMORY: per-block Misra–Gries
  summaries (<= k counters each) merged with the MG decrement on the
  driver, then one exact recount pass over the surviving candidates
  (broadcast — at most k tokens). Guarantee: every token with true
  frequency > total_tokens / k is in the candidate set, and the returned
  counts are exact — so for min_count > N/k the sketch tier returns the
  SAME rows as the exact tier (property-tested), with driver state O(k)
  regardless of vocabulary size.

Reference analogue: the IDF candidate index counts annotation-token
document frequencies (reference AnnotationIndex / tfidf candidate scoring);
this widens it to the corpus-statistics operator a curation pipeline needs
(boilerplate/stopword discovery feeding dedup_paragraphs and quality rules).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import polars as pl
import pyarrow as pa
import ray
import ray.data

from knowledgegraphs_ray.text.analysis import TOKEN_RE
from knowledgegraphs_ray.util.fastagg import merge_partials

_TOKEN_RE_FULL = TOKEN_RE


def _token_counts_block(
    batch: pa.Table, *, text_col: str, lower: bool
) -> pa.Table:
    s = pl.from_arrow(batch[text_col]).rename("t")
    if lower:
        s = s.str.to_lowercase()
    counts = (
        s.str.extract_all(_TOKEN_RE_FULL)
        .explode()
        .drop_nulls()
        .value_counts()
    )
    # value_counts returns struct rows (t, count); flatten to columns
    df = counts.struct.unnest() if hasattr(counts, "struct") else counts
    df = df.rename({"t": "token", "count": "n"})
    return df.select(
        pl.col("token"), pl.col("n").cast(pl.Int64)
    ).to_arrow()


def frequent_tokens(
    docs: ray.data.Dataset,
    *,
    min_count: int,
    text_col: str = "text",
    lower: bool = True,
    driver_limit: int = 5_000_000,
) -> ray.data.Dataset:
    """EXACT (token, n) rows for every token with corpus frequency >=
    ``min_count`` (tokenizer = ``analysis.TOKEN_RE``, lowercased)."""
    partials = docs.map_batches(
        lambda b: _token_counts_block(b, text_col=text_col, lower=lower),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    merged = merge_partials(
        partials, keys=["token"], agg={"n": "sum"}, driver_limit=driver_limit
    )
    return merged.map_batches(
        lambda df: df[df["n"] >= min_count], batch_format="pandas"
    )


def frequent_tokens_oracle_sql(
    *, min_count: int, table: str = "documents", lower: bool = True
) -> str:
    expr = "lower(text)" if lower else "text"
    return (
        "SELECT token, CAST(count(*) AS BIGINT) AS n FROM ("
        f"SELECT unnest(regexp_extract_all({expr}, '{_TOKEN_RE_FULL}')) AS token "
        f"FROM {table}) GROUP BY token HAVING count(*) >= {min_count}"
    )


# --- Misra–Gries sketch tier -------------------------------------------------


def _mg_summary(tokens: np.ndarray, counts: np.ndarray, k: int):
    """Reduce an exact (token, count) table to a Misra–Gries summary of at
    most k counters: keep the top-k counts and subtract the (k+1)-th."""
    if len(tokens) <= k:
        return tokens, counts
    order = np.argsort(-counts, kind="stable")
    cut = counts[order[k]]
    top = order[:k]
    kept = counts[top] - cut
    nz = kept > 0
    return tokens[top][nz], kept[nz]


def heavy_hitters_sketch(
    docs: ray.data.Dataset,
    *,
    k: int,
    min_count: int | None = None,
    text_col: str = "text",
    lower: bool = True,
) -> ray.data.Dataset:
    """Single-shuffle-free heavy hitters with O(k) driver state.

    Pass 1: per-block exact counts reduced to an MG(k) summary (<= k rows
    per block leave the block). MG summaries merge by summation followed by
    the same decrement, preserving the deviation bound |est - true| <=
    total_tokens / k, so every token with true count > N/k survives.
    Pass 2: exact recount of the <= k candidates (broadcast), filtered to
    ``min_count`` (default N/k + 1, the smallest exact-guarantee threshold).
    Returns exact (token, n) rows."""
    partials = docs.map_batches(
        lambda b: _mg_block(b, text_col=text_col, lower=lower, k=k),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    # driver merge: concat summaries (O(k x blocks)), sum per token, decrement
    pdf = partials.to_pandas()
    total = int(pdf["total"].sum()) if len(pdf) else 0
    pdf = pdf[pdf["token"].notna()]
    if len(pdf):
        g = pdf.groupby("token", as_index=False)["n"].sum()
        cand_tokens, _ = _mg_summary(
            g["token"].to_numpy(), g["n"].to_numpy(), k
        )
    else:
        cand_tokens = np.empty(0, dtype=object)
    thresh = min_count if min_count is not None else total // k + 1

    cand = ray.put(pl.Series("token", cand_tokens, dtype=pl.String))

    class Recount:
        def __init__(self, ref):
            self.ref = ref
            self._c = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self._c is None:
                self._c = ray.get(self.ref)
            t = _token_counts_block(batch, text_col=text_col, lower=lower)
            return (
                pl.from_arrow(t)
                .filter(pl.col("token").is_in(self._c))
                .to_arrow()
            )

    exact = docs.map_batches(
        Recount(cand), batch_format="pyarrow", zero_copy_batch=True
    )
    merged = merge_partials(exact, keys=["token"], agg={"n": "sum"})
    return merged.map_batches(
        lambda df: df[df["n"] >= thresh], batch_format="pandas"
    )


def _mg_block(batch: pa.Table, *, text_col: str, lower: bool, k: int) -> pa.Table:
    """MG(k) summary rows for one block, plus one null-token row carrying the
    block's true token total (summed on the driver for the N/k threshold)."""
    t = _token_counts_block(batch, text_col=text_col, lower=lower)
    tok = t["token"].to_numpy(zero_copy_only=False)
    n = t["n"].to_numpy()
    total = int(n.sum())
    stok, sn = _mg_summary(tok, n, k)
    return pa.table(
        {
            "token": pa.array(list(stok) + [None], pa.string()),
            "n": pa.array(list(sn.astype(np.int64)) + [0], pa.int64()),
            "total": pa.array([0] * len(stok) + [total], pa.int64()),
        }
    )
