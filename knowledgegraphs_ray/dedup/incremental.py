"""Incremental (cross-corpus) deduplication — keep only rows of a NEW shard
whose payload was never seen in an existing corpus.

The streaming-ingestion counterpart of ``dedup/exact.py``: a 100 TB corpus
is never re-deduplicated from scratch — each arriving shard is filtered
against the history. Reference analogue: the processed-file cache gate of
FilesToTurtle.java (skip inputs already ingested), lifted from file
granularity to row granularity.

Scale design (history ≫ shard, shard itself possibly large):

* **broadcast tier** (history values <= ``broadcast_limit`` after per-block
  unique): the history's value set is collected once via per-block
  combiners, ``ray.put`` as an Arrow array, and every new-shard batch
  probes it with a vectorized ``is_in`` — map-only over the shard, nothing
  shuffles. NOTHING in this operator ever runs a global distinct shuffle:
  per-block unique is enough because every consumer tolerates cross-block
  duplicates (``is_in`` sets, idempotent Bloom folds, and a keep-unmatched
  left join whose matched rows are dropped whatever their multiplicity).
* **bloom tier** (default above the limit): one map pass over the history
  folds every value into a mergeable Bloom bitmap (``util/bloom.py``,
  ~14 bits/distinct at p=1e-3 — a few hundred MB where the string set would
  be tens of GB; duplicate history values are idempotent, so NO distinct
  shuffle of the history is needed). Each shard batch probes the broadcast
  bitmap: probe-NEGATIVE rows are definitively novel (Bloom has no false
  negatives) and stream straight through; only probe-POSITIVE rows — true
  duplicates plus an ``fp_rate`` sliver of novel rows — enter the exact
  verify join against the history's distinct values. With ``verify=False``
  the join is skipped entirely (map-only end to end) and the sliver is
  dropped: an explicitly lossy mode that under-keeps at most ``fp_rate`` of
  novel rows and never lets a duplicate through.

Both exact tiers return identical rows (tier-equivalence pytest); only the
data movement differs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from knowledgegraphs_ray.extract.joins import bucket_join
from knowledgegraphs_ray.util.bloom import (
    bloom_contains,
    bloom_from_dataset,
    bloom_params,
)

_SENTINEL = "__seen__"


def novel_rows(
    new: ray.data.Dataset,
    seen: ray.data.Dataset,
    *,
    column: str = "text",
    seen_column: str | None = None,
    broadcast_limit: int = 2_000_000,
    fp_rate: float = 1e-4,
    verify: bool = True,
    verify_broadcast_limit: int = 5_000_000,
) -> ray.data.Dataset:
    """Rows of ``new`` whose ``column`` value does not occur in ``seen``.

    Keeps ``new``'s full schema and all its rows with unseen values
    (duplicates WITHIN the shard are intentionally retained — compose with
    ``dedup_exact`` for intra-shard dedup). ``seen_column`` defaults to
    ``column``.
    """
    seen_column = seen_column or column
    # Per-block unique ONLY — no global distinct shuffle anywhere in this
    # operator. Every consumer tolerates cross-block duplicates: ``is_in``
    # value sets ignore them, Bloom folds are idempotent, and the verify
    # join's keep-unmatched filter drops matched rows however many right
    # copies they hit. ``n_seen`` is therefore an UPPER BOUND on the
    # distinct count (sum of per-block distincts) — tier selection and
    # Bloom sizing both stay safe under an overestimate.
    from knowledgegraphs_ray.util.blocks import compact_nonempty

    sch = seen.schema()
    if sch is None:  # schema-less (fully empty) history: everything is novel
        return new
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        vtype = base.field(seen_column).type
    else:  # pandas-born dataset: numpy dtype -> arrow (object/str -> string)
        np_t = dict(zip(sch.names, sch.types)).get(seen_column)
        try:
            vtype = pa.from_numpy_dtype(np_t)
        except (pa.ArrowNotImplementedError, TypeError):
            vtype = pa.string()
    vals_schema = pa.schema([(seen_column, vtype)])
    seen_vals = compact_nonempty(
        seen.select_columns([seen_column]).map_batches(
            lambda b, _c=seen_column: pa.table(
                {_c: pc.unique(b[_c].combine_chunks()).cast(vtype)}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        vals_schema,
    )
    n_seen = seen_vals.count()

    if n_seen <= broadcast_limit:
        blocks = [t for t in ray.get(seen_vals.to_arrow_refs()) if t.num_rows]
        if not blocks:
            return new
        tbl = pa.concat_tables(blocks)
        vs_ref = ray.put(pc.unique(tbl[seen_column].combine_chunks()))

        class NotSeen:
            """Broadcast value set; instance-passed so each task pays the
            zero-copy ``ray.get`` once."""

            def __init__(self, ref):
                self.ref = ref
                self._vs = None

            def __call__(self, b: pa.Table) -> pa.Table:
                if self._vs is None:
                    self._vs = ray.get(self.ref)
                mask = pc.is_in(b[column].combine_chunks(), value_set=self._vs)
                return b.filter(pc.invert(mask))

        return new.map_batches(
            NotSeen(vs_ref), batch_format="pyarrow", zero_copy_batch=True
        )

    # bloom tier: fold the materialized per-block-unique values (duplicates
    # idempotent — no shuffle, no second read of the raw history)
    m_bits, k = bloom_params(n_seen, fp_rate=fp_rate)
    bits_ref = ray.put(bloom_from_dataset(seen_vals, seen_column, m_bits=m_bits, k=k))

    class BloomSplit:
        """emit='neg' passes definitively-novel rows (probe negative);
        emit='pos' passes the candidate-duplicate rows for the verify join."""

        def __init__(self, ref, emit):
            self.ref, self.emit = ref, emit
            self._bits = None

        def __call__(self, b: pa.Table) -> pa.Table:
            if self._bits is None:
                self._bits = ray.get(self.ref)
            mask = bloom_contains(self._bits, b[column], k=k)
            keep = ~mask if self.emit == "neg" else mask
            return b.filter(pa.array(keep))

    definite = new.map_batches(
        BloomSplit(bits_ref, "neg"), batch_format="pyarrow", zero_copy_batch=True
    )
    if not verify:
        return definite

    positives = new.map_batches(
        BloomSplit(bits_ref, "pos"), batch_format="pyarrow", zero_copy_batch=True
    )
    sch = new.schema()
    if sch is None:  # schema-less (fully empty) shard: nothing to rescue
        return definite

    arrow_schema = sch.base_schema
    if not isinstance(arrow_schema, pa.Schema):  # pandas-block datasets
        arrow_schema = pa.Table.from_pandas(
            new.limit(1).to_pandas(), preserve_index=False
        ).schema
    cols = list(arrow_schema.names)

    # Exchange discipline for the verify join: bucket_join hash-partitions
    # BOTH sides, so an unfiltered right side would move the history's whole
    # value set every ingest step. While the positive sliver is bounded,
    # broadcast its 64-bit value hashes once and semi-filter the history
    # MAP-ONLY first — a hash collision only admits a harmless extra row
    # into the exact join (the join still compares full values). Above the
    # limit, fall back to the full join (the signal to shard smaller).
    positives = positives.materialize()
    if positives.count() == 0:
        return definite
    if positives.count() <= verify_broadcast_limit:
        import polars as pl

        def _hash_only(b: pa.Table) -> pd.DataFrame:
            h = pl.from_arrow(b[column].combine_chunks()).hash(seed=41)
            return pd.DataFrame({"h": np.unique(h.to_numpy())})

        pos_h = np.unique(
            positives.map_batches(_hash_only, batch_format="pyarrow")
            .to_pandas()["h"]
            .to_numpy()
        )
        ph_ref = ray.put(pos_h)

        def _seen_prefilter(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return df
            h = pl.from_pandas(df[seen_column]).hash(seed=41).to_numpy()
            return df[np.isin(h, ray.get(ph_ref))]

        seen_vals = compact_nonempty(
            seen_vals.map_batches(_seen_prefilter, batch_format="pandas"),
            pa.schema(
                [(seen_column,
                  arrow_schema.field(column).type
                  if column in arrow_schema.names else pa.string())]
            ),
        )
    # rename the right key so the merge keeps the sides' keys distinct
    right_key = seen_column + "_r" if seen_column == column else seen_column
    marked = seen_vals.map_batches(
        lambda df: df.rename(columns={seen_column: right_key}).assign(
            **{_SENTINEL: np.int8(1)}
        ),
        batch_format="pandas",
    )
    joined = bucket_join(
        positives,
        marked,
        left_on=column,
        right_on=right_key,
        how="left",
        right_cols=[right_key, _SENTINEL],
        left_cols=cols,
    )

    def keep_unmatched(df: pd.DataFrame) -> pa.Table:
        # cast back through the shard's Arrow schema: the bucket union feeds
        # the right-side blocks NaN for the left columns, so pandas widened
        # e.g. int64 ids to float64 inside the merge
        out = df.loc[df[_SENTINEL].isna(), cols]
        return pa.Table.from_pandas(out, preserve_index=False).cast(arrow_schema)

    rescued = joined.map_batches(keep_unmatched, batch_format="pandas")
    return definite.union(rescued)
