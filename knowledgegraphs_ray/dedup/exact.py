"""Exact deduplication — hash-partition + per-group representative.

Reference analogue: DataUtils.uniqify order-preserving dedup
(KnowledgeGraphsPython/DeepOnto/src/deeponto/utils/data_utils.py, used by
text_semantics.py:553-557) and the triple-set dedup semantics of
InsertDataBase.java:154-164 — re-expressed for scale: never shuffle the full
payload column; shuffle a 64-bit content hash, verify exact equality within
the (tiny) hash group.
"""

from __future__ import annotations

import pandas as pd
import polars as pl
import pyarrow as pa
import ray.data

HASH_SEED = 42


def add_content_hash(
    batch: pa.Table, *, column: str, out: str = "content_hash"
) -> pa.Table:
    """Vectorized deterministic 64-bit hash of ``column`` (polars xxhash)."""
    h = pl.from_arrow(batch.select([column])).select(
        pl.col(column).hash(seed=HASH_SEED).alias(out)
    )
    return batch.append_column(out, h.to_arrow()[out].cast(pa.uint64()))


def dedup_exact(
    ds: ray.data.Dataset,
    *,
    column: str = "text",
    id_column: str = "doc_id",
    keep_payload: bool = True,
    driver_merge_limit: int = 2_000_000,
) -> ray.data.Dataset:
    """One row per distinct ``column`` value: representative = min(id), plus
    ``n_copies``. Shuffle key is the content hash (8 bytes/row), not the
    payload; exact equality is re-verified inside each hash group so hash
    collisions cannot merge distinct texts.
    """

    from ray.data.aggregate import Min, Sum

    # per-batch partial dedupe first (the combiner): one row per distinct
    # value per block, so the shuffle moves distinct values, not the corpus
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(column, as_index=False, sort=False).agg(
            **{id_column: (id_column, "min"), "n_copies": (id_column, "size")}
        )

    parts = ds.map_batches(partial, batch_format="pandas")
    if driver_merge_limit:
        # small-cardinality fast path: partials merged driver-side in polars
        # (Ray's aggregate has ~5s fixed cost at toy scale). Falls back to the
        # distributed aggregate when partials exceed the limit; materialize so
        # the count probe and the chosen path share one execution.
        import polars as pl
        import ray.data as rd

        parts = parts.materialize()
        if parts.count() <= driver_merge_limit:
            pdf = parts.to_pandas()
            out = (
                pl.from_pandas(pdf)
                .group_by(column)
                .agg(
                    pl.col(id_column).min().alias(id_column),
                    pl.col("n_copies").sum().alias("n_copies"),
                )
                .sort(id_column)
            )
            cols = [id_column, "n_copies"] + ([column] if keep_payload else [])
            return rd.from_arrow(out.select(cols).to_arrow())
    # distributed path: builtin aggregates (C path — a per-group Python UDF
    # here costs ~1ms per distinct value and dominates at scale)
    out = parts.repartition(8).groupby(column).aggregate(
        Min(id_column, alias_name=id_column), Sum("n_copies", alias_name="n_copies")
    )
    if not keep_payload:
        out = out.select_columns([id_column, "n_copies"])
    return out
