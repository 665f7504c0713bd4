"""Paragraph-level deduplication — remove boilerplate paragraphs repeated
across the corpus (the RefinedWeb / CCNet curation step), keeping each
document's residual text intact and ordered.

Reference analogue: the reference deduplicates whole annotation/text units
before linking (utils/text_utils.py:31-93 normalizes then set-dedups); this
widens that to the sub-document granularity a crawl corpus needs.

Scale shape (the text never shuffles):
  1. one streaming pass splits each doc on the paragraph delimiter and emits
     per-block PARTIAL (para_hash, n) counts — 16-byte rows, combined
     within-block before anything moves;
  2. ``merge_partials`` sums them (driver polars below its limit, the
     distributed aggregate above) and keeps hashes with count >= min_count —
     this survivor set is bounded by corpus_paragraphs / min_count and in
     practice by the boilerplate vocabulary, NOT the corpus;
  3. the frequent-hash set broadcasts once (``ray.put`` of one sorted uint64
     array) and a second streaming pass drops matching paragraphs and
     rejoins the rest in place.
Paragraph identity is the 64-bit byte-polynomial rolling hash
(``text.analysis.rolling_hashes``), so the DuckDB oracle can group raw
paragraph strings and agree exactly (a 2^-64 collision would surface as a
value mismatch, not a silent pass).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from knowledgegraphs_ray.text.analysis import rolling_hashes
from knowledgegraphs_ray.util.fastagg import merge_partials

PARA_SEP = "\n\n"


def _split_paras(text: pa.ChunkedArray | pa.Array) -> pa.ListArray:
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    return pc.split_pattern(pc.coalesce(text, pa.scalar("")), PARA_SEP)


def _para_count_partial(batch: pa.Table, *, text_col: str) -> pa.Table:
    paras = _split_paras(batch[text_col])
    flat = paras.flatten()
    hashes = rolling_hashes(flat)
    uniq, counts = np.unique(hashes, return_counts=True)
    return pa.table(
        {
            "para_hash": pa.array(uniq, pa.uint64()),
            "n": pa.array(counts.astype(np.int64), pa.int64()),
        }
    )


class _DropFrequent:
    """Broadcast frequent-hash set; instance-passed (task pool) with the
    sorted array cached per task. Rebuilds each doc's text from surviving
    paragraphs entirely inside Arrow/numpy (offsets arithmetic + one
    binary_join), no per-row Python."""

    def __init__(self, ref, id_col: str, text_col: str, keep_empty: bool):
        self.ref = ref
        self.id_col = id_col
        self.text_col = text_col
        self.keep_empty = keep_empty
        self._freq = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._freq is None:
            self._freq = ray.get(self.ref)
        paras = _split_paras(batch[self.text_col])
        flat = paras.flatten()
        hashes = rolling_hashes(flat)
        dup = np.zeros(len(flat), dtype=bool)
        if len(self._freq):
            idx = np.searchsorted(self._freq, hashes)
            idx[idx == len(self._freq)] = 0
            dup = self._freq[idx] == hashes
        offsets = np.asarray(paras.offsets)
        # per-doc removed counts via prefix sums of the dup mask
        cum = np.concatenate(([0], np.cumsum(dup.astype(np.int64))))
        removed = cum[offsets[1:]] - cum[offsets[:-1]]
        keep_idx = np.flatnonzero(~dup)
        kept_vals = flat.take(pa.array(keep_idx, pa.int64()))
        new_offsets = np.concatenate(
            ([0], np.cumsum((offsets[1:] - offsets[:-1]) - removed))
        )
        kept_lists = pa.ListArray.from_arrays(
            pa.array(new_offsets, pa.int32()), kept_vals
        )
        text = pc.binary_join(kept_lists, pa.scalar(PARA_SEP))
        out = batch.set_column(
            batch.schema.get_field_index(self.text_col), self.text_col, text
        ).append_column("n_removed", pa.array(removed, pa.int64()))
        if not self.keep_empty:
            out = out.filter(pc.not_equal(out[self.text_col], ""))
        return out


def dedup_paragraphs(
    docs: ray.data.Dataset,
    *,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_empty: bool = False,
    driver_limit: int = 5_000_000,
) -> ray.data.Dataset:
    """-> the input columns (text rewritten) + ``n_removed``, with
    paragraphs appearing >= ``min_count`` times across the corpus removed;
    docs whose every paragraph was boilerplate are dropped unless
    ``keep_empty``."""
    partials = docs.map_batches(
        lambda b: _para_count_partial(b, text_col=text_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    counts = merge_partials(
        partials, keys=["para_hash"], agg={"n": "sum"}, driver_limit=driver_limit
    )
    freq = counts.map_batches(
        lambda df: df[df["n"] >= min_count][["para_hash"]],
        batch_format="pandas",
    ).to_pandas()  # bounded: one row per REPEATED paragraph, not per doc
    hashes = (
        freq["para_hash"].to_numpy().astype(np.uint64)
        if "para_hash" in freq.columns
        else np.empty(0, np.uint64)  # empty Dataset -> column-less frame
    )
    ref = ray.put(np.sort(hashes))
    return docs.map_batches(
        _DropFrequent(ref, id_col, text_col, keep_empty),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def dedup_paragraphs_oracle_sql(
    *, min_count: int = 2, table: str = "documents"
) -> str:
    """DuckDB twin: group raw paragraph strings (the engine groups their
    byte-polynomial hashes — identical partitions absent a 2^-64 collision)."""
    sep = "chr(10) || chr(10)"
    return f"""
WITH p AS (
  SELECT doc_id,
         unnest(string_split(coalesce(text, ''), {sep})) AS para,
         generate_subscripts(string_split(coalesce(text, ''), {sep}), 1) AS idx
  FROM {table}
),
f AS (SELECT para FROM p GROUP BY para HAVING count(*) >= {min_count}),
m AS (
  SELECT p.doc_id, p.para, p.idx, (f.para IS NOT NULL) AS dup
  FROM p LEFT JOIN f USING (para)
)
SELECT * FROM (
  SELECT doc_id,
         coalesce(string_agg(para, {sep} ORDER BY idx) FILTER (WHERE NOT dup), '') AS text,
         CAST(count(*) FILTER (WHERE dup) AS BIGINT) AS n_removed
  FROM m GROUP BY doc_id
) WHERE text <> ''
""".strip()
