"""Exact distributed quantiles over bounded non-negative integer columns
(token counts, document lengths, session sizes) via mergeable histogram
partials — the corpus-statistics operator behind length-based curation
thresholds (Gopher rules pick min/max token bounds from these).

Scale shape: each block emits ONE partial histogram (np.bincount — an
int64 array of length max_value+1); the driver sums histograms, never
values. Driver state is O(max_value), independent of corpus size — for
token counts that is a few thousand bins. For genuinely unbounded values,
cap with ``clip_max`` (values above it land in the top bin, so upper
quantiles saturate at the cap by construction, never silently wrong).

The discrete-quantile rule matches DuckDB ``quantile_disc`` exactly
(value at sorted index ceil(q*n)-1, clamped at 0), so the oracle SQL
hash-matches.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from knowledgegraphs_ray.text.analysis import TOKEN_RE


def _hist_table(values: np.ndarray) -> pa.Table:
    h = np.bincount(values)
    return pa.table(
        {
            "bin": pa.array(np.arange(len(h), dtype=np.int64)),
            "n": pa.array(h, pa.int64()),
        }
    )


def _quantiles_from_partials(parts: pd.DataFrame, qs: list[float]) -> pd.DataFrame:
    merged = parts.groupby("bin")["n"].sum().sort_index()
    counts = merged.to_numpy()
    bins = merged.index.to_numpy()
    n = int(counts.sum())
    cum = np.cumsum(counts)
    out = []
    for q in qs:
        idx = max(0, math.ceil(q * n) - 1)  # the quantile_disc rule
        pos = int(np.searchsorted(cum, idx + 1))
        out.append({"q": q, "value": int(bins[pos])})
    return pd.DataFrame(out)


def histogram_quantiles(
    ds: ray.data.Dataset,
    column: str,
    qs: list[float],
    *,
    clip_max: int | None = None,
) -> pd.DataFrame:
    """-> DataFrame (q, value): exact discrete quantiles of an int column."""

    def hist_block(batch: pa.Table) -> pa.Table:
        v = batch[column].to_numpy(zero_copy_only=False).astype(np.int64)
        if clip_max is not None:
            v = np.minimum(v, clip_max)
        return _hist_table(v)

    parts = ds.map_batches(
        hist_block, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    return _quantiles_from_partials(parts, qs)


def token_count_quantiles(
    docs: ray.data.Dataset,
    qs: list[float],
    *,
    text_col: str = "text",
) -> pd.DataFrame:
    """Exact quantiles of per-document token counts; the count and the
    histogram partial are built in the same streaming pass."""

    def hist_block(batch: pa.Table) -> pa.Table:
        n_tok = pc.cast(
            pc.count_substring_regex(batch[text_col].combine_chunks(), TOKEN_RE),
            pa.int64(),
        ).to_numpy()
        return _hist_table(n_tok)

    parts = docs.map_batches(
        hist_block, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    return _quantiles_from_partials(parts, qs)


def token_count_quantiles_oracle_sql(
    qs: list[float], *, table: str = "documents"
) -> str:
    rows = " UNION ALL ".join(
        f"SELECT {q} AS q, CAST(quantile_disc(n_tok, {q}) AS BIGINT) AS value FROM t"
        for q in qs
    )
    return (
        f"WITH t AS (SELECT len(regexp_extract_all(text, '{TOKEN_RE}')) AS n_tok "
        f"FROM {table}) {rows}"
    )
