"""Gopher-style document quality/repetition signals + rule filter.

The published large-corpus quality heuristics (Gopher / MassiveText, Rae et
al. 2021 §A1.1) re-expressed as one vectorized map-only Arrow/polars kernel:
word counts and mean word length, symbol-to-word ratio, alphabetic-word
fraction, most-frequent-token share (the repetition family's cheapest and
most discriminating member on single-line corpora), and duplicate-line
fraction. ``gopher_pass`` applies the rule conjunction; thresholds are
keyword-tunable with defaults in the published ranges.

Every ratio is a single division of two exact integers, so the DuckDB twin
(``gopher_oracle_sql``) reproduces each double bit-for-bit — this module is
value-oracle-checkable end to end, unlike score-model quality filters.
Per-row cost is O(tokens); no shuffle (each doc is one row of one batch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

TOKEN_RE = "[a-z0-9_]+"
SYMBOL_RE = r"#|\.\.\.|…"  # hash or ellipsis (ASCII and unicode)

# rule thresholds (Gopher §A1.1 ranges; top_token_frac stands in for the
# duplicate-n-gram family on single-line documents)
DEFAULTS = dict(
    min_tokens=20,
    min_mean_word_len=3.0,
    max_mean_word_len=10.0,
    max_symbol_ratio=0.1,
    min_alpha_frac=0.8,
    max_top_token_frac=0.125,
    max_dup_line_frac=0.3,
)


def repetition_stats(
    batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text", **thresholds
) -> pa.Table:
    """-> (id_col, n_tokens, mean_word_len, top_token_frac, frac_alpha_words,
    symbol_ratio, n_lines, dup_line_frac, gopher_pass) — one row per doc."""
    th = {**DEFAULTS, **thresholds}
    ids = batch[id_col]
    text = batch[text_col].combine_chunks()

    df = pl.from_arrow(batch.select([id_col, text_col]))
    per_tok = (
        df.select(
            pl.col(id_col),
            pl.col(text_col).str.to_lowercase().str.extract_all(TOKEN_RE).alias("t"),
        )
        .explode("t")
        .drop_nulls("t")
        .group_by([id_col, "t"])
        .agg(pl.len().alias("c"))
    )
    agg = per_tok.group_by(id_col).agg(
        pl.col("c").sum().alias("n_tokens"),
        pl.col("c").max().alias("top_n"),
        (pl.col("c") * pl.col("t").str.len_chars()).sum().alias("len_sum"),
        pl.col("c").filter(pl.col("t").str.contains("[a-z]")).sum().alias("alpha_n"),
    )
    a = (
        pl.from_arrow(pa.table({id_col: ids}))
        .join(agg, on=id_col, how="left")
        .fill_null(0)
        .to_pandas()
    )
    n_tok = a["n_tokens"].to_numpy().astype(np.int64)
    top_n = a["top_n"].to_numpy().astype(np.int64)
    len_sum = a["len_sum"].to_numpy().astype(np.int64)
    alpha_n = a["alpha_n"].to_numpy().astype(np.int64)

    lines = pl.from_arrow(pa.table({"x": text})).select(
        pl.col("x").str.split("\n").alias("l")
    )
    n_lines = lines.select(pl.col("l").list.len()).to_series().to_numpy().astype(np.int64)
    n_uniq = (
        lines.select(pl.col("l").list.n_unique()).to_series().to_numpy().astype(np.int64)
    )
    n_sym = (
        pc.count_substring_regex(text, SYMBOL_RE).to_numpy(zero_copy_only=False).astype(np.int64)
    )

    denom = np.where(n_tok > 0, n_tok, 1).astype(np.float64)
    mean_word_len = np.where(n_tok > 0, len_sum / denom, 0.0)
    top_frac = np.where(n_tok > 0, top_n / denom, 0.0)
    alpha_frac = np.where(n_tok > 0, alpha_n / denom, 0.0)
    sym_ratio = np.where(n_tok > 0, n_sym / denom, 0.0)
    line_denom = np.where(n_lines > 0, n_lines, 1).astype(np.float64)
    dup_line_frac = np.where(n_lines > 0, (n_lines - n_uniq) / line_denom, 0.0)

    gopher_pass = (
        (n_tok >= th["min_tokens"])
        & (mean_word_len >= th["min_mean_word_len"])
        & (mean_word_len <= th["max_mean_word_len"])
        & (sym_ratio < th["max_symbol_ratio"])
        & (alpha_frac >= th["min_alpha_frac"])
        & (top_frac <= th["max_top_token_frac"])
        & (dup_line_frac <= th["max_dup_line_frac"])
    )
    return pa.table(
        {
            id_col: ids,
            "n_tokens": pa.array(n_tok, pa.int64()),
            "mean_word_len": pa.array(mean_word_len, pa.float64()),
            "top_token_frac": pa.array(top_frac, pa.float64()),
            "frac_alpha_words": pa.array(alpha_frac, pa.float64()),
            "symbol_ratio": pa.array(sym_ratio, pa.float64()),
            "n_lines": pa.array(n_lines, pa.int64()),
            "dup_line_frac": pa.array(dup_line_frac, pa.float64()),
            "gopher_pass": pa.array(gopher_pass, pa.bool_()),
        }
    )


def gopher_stats(
    ds: ray.data.Dataset, *, id_col: str = "doc_id", text_col: str = "text", **thresholds
) -> ray.data.Dataset:
    return ds.map_batches(
        lambda b: repetition_stats(b, id_col=id_col, text_col=text_col, **thresholds),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def gopher_filter(
    ds: ray.data.Dataset, *, id_col: str = "doc_id", text_col: str = "text", **thresholds
) -> ray.data.Dataset:
    """Corpus rows passing the rule conjunction (original schema)."""

    def filt(batch: pa.Table) -> pa.Table:
        stats = repetition_stats(batch, id_col=id_col, text_col=text_col, **thresholds)
        return batch.filter(stats["gopher_pass"])

    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)


def gopher_oracle_sql(
    *, table: str = "documents", id_col: str = "doc_id", **thresholds
) -> str:
    th = {**DEFAULTS, **thresholds}
    return f"""
WITH per_tok AS (
  SELECT {id_col}, tok, count(*) AS c FROM (
    SELECT {id_col}, unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS tok
    FROM {table}
  ) GROUP BY {id_col}, tok
),
agg AS (
  SELECT {id_col}, sum(c) AS n_tokens, max(c) AS top_n,
         sum(c * length(tok)) AS len_sum,
         coalesce(sum(CASE WHEN regexp_matches(tok, '[a-z]') THEN c END), 0) AS alpha_n
  FROM per_tok GROUP BY {id_col}
),
base AS (
  SELECT d.{id_col},
         CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
         CASE WHEN coalesce(a.n_tokens, 0) > 0
              THEN a.len_sum / CAST(a.n_tokens AS DOUBLE) ELSE 0.0 END AS mean_word_len,
         CASE WHEN coalesce(a.n_tokens, 0) > 0
              THEN a.top_n / CAST(a.n_tokens AS DOUBLE) ELSE 0.0 END AS top_token_frac,
         CASE WHEN coalesce(a.n_tokens, 0) > 0
              THEN a.alpha_n / CAST(a.n_tokens AS DOUBLE) ELSE 0.0 END AS frac_alpha_words,
         CASE WHEN coalesce(a.n_tokens, 0) > 0
              THEN len(regexp_extract_all(d.text, '{SYMBOL_RE}')) / CAST(a.n_tokens AS DOUBLE)
              ELSE 0.0 END AS symbol_ratio,
         CAST(len(string_split(d.text, chr(10))) AS BIGINT) AS n_lines,
         CASE WHEN len(string_split(d.text, chr(10))) > 0
              THEN (len(string_split(d.text, chr(10))) -
                    len(list_distinct(string_split(d.text, chr(10)))))
                   / CAST(len(string_split(d.text, chr(10))) AS DOUBLE)
              ELSE 0.0 END AS dup_line_frac
  FROM {table} d LEFT JOIN agg a USING ({id_col})
)
SELECT *,
       (n_tokens >= {th["min_tokens"]}
        AND mean_word_len >= {th["min_mean_word_len"]}
        AND mean_word_len <= {th["max_mean_word_len"]}
        AND symbol_ratio < {th["max_symbol_ratio"]}
        AND frac_alpha_words >= {th["min_alpha_frac"]}
        AND top_token_frac <= {th["max_top_token_frac"]}
        AND dup_line_frac <= {th["max_dup_line_frac"]}) AS gopher_pass
FROM base
"""
