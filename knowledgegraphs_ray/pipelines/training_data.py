"""Training-data curation pipeline — the composition every large-scale
corpus build runs: language filter -> quality filter -> length filter ->
exact dedup -> cleaned corpus.

All filters are vectorized pyarrow expressions sharing their regexes with
the DuckDB oracle; dedup keeps min(doc_id) per distinct text. The output is
the "keep list" (doc ids) plus the per-stage survival counts for lineage.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from knowledgegraphs_ray.dedup.exact import dedup_exact
from knowledgegraphs_ray.text.analysis import STOP_RE, TOKEN_RE


def clean_corpus(
    ds: ray.data.Dataset,
    *,
    lang: str | None = "en",
    lang_col: str = "lang",
    min_tokens: int = 20,
    max_punct_ratio: float = 0.2,
    min_stop_ratio: float = 0.0,
) -> ray.data.Dataset:
    """-> (doc_id, text, n_tokens) of surviving, deduplicated documents."""

    def filt(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks()
        keep = pc.is_valid(text)
        if lang is not None:
            keep = pc.and_(keep, pc.equal(batch[lang_col].combine_chunks(), lang))
        n_tok = pc.count_substring_regex(text, TOKEN_RE)
        keep = pc.and_(keep, pc.greater_equal(n_tok, min_tokens))
        n_chars = pc.cast(pc.utf8_length(text), pa.float64())
        n_punct = pc.cast(pc.count_substring_regex(text, "[.,;:!?]"), pa.float64())
        punct_ratio = pc.if_else(
            pc.greater(n_chars, 0.0), pc.divide(n_punct, n_chars), pa.scalar(0.0)
        )
        keep = pc.and_(keep, pc.less_equal(punct_ratio, max_punct_ratio))
        if min_stop_ratio > 0:
            n_stop = pc.cast(
                pc.count_substring_regex(pc.utf8_lower(text), STOP_RE), pa.float64()
            )
            stop_ratio = pc.divide(n_stop, pc.cast(pc.max_element_wise(n_tok, 1), pa.float64()))
            keep = pc.and_(keep, pc.greater_equal(stop_ratio, min_stop_ratio))
        out = batch.filter(keep)
        return out.append_column(
            "n_tokens",
            pc.cast(pc.count_substring_regex(out["text"].combine_chunks(), TOKEN_RE), pa.int64()),
        )

    filtered = ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)
    deduped = dedup_exact(filtered.select_columns(["doc_id", "text"]), column="text", id_column="doc_id")
    # re-attach token counts after dedup (cheap recompute beats carrying the
    # column through the shuffle)
    def retok(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "n_tokens",
            pc.cast(
                pc.count_substring_regex(batch["text"].combine_chunks(), TOKEN_RE),
                pa.int64(),
            ),
        )

    return deduped.map_batches(retok, batch_format="pyarrow").select_columns(
        ["doc_id", "n_copies", "n_tokens"]
    )


def clean_corpus_oracle_sql(
    *, lang: str = "en", min_tokens: int = 20, max_punct_ratio: float = 0.2
) -> str:
    return f"""
WITH f AS (
  SELECT doc_id, text FROM documents
  WHERE text IS NOT NULL AND lang = '{lang}'
    AND len(regexp_extract_all(text, '{TOKEN_RE}')) >= {min_tokens}
    AND (CASE WHEN length(text) > 0
         THEN len(regexp_extract_all(text, '[.,;:!?]')) / CAST(length(text) AS DOUBLE)
         ELSE 0.0 END) <= {max_punct_ratio}
)
SELECT min(doc_id) AS doc_id, count(*) AS n_copies,
       CAST(len(regexp_extract_all(min(text), '{TOKEN_RE}')) AS BIGINT) AS n_tokens
FROM f GROUP BY text
"""
