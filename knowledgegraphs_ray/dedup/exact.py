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
) -> ray.data.Dataset:
    """One row per distinct ``column`` value: representative = min(id), plus
    ``n_copies``. Shuffle key is the content hash (8 bytes/row), not the
    payload; exact equality is re-verified inside each hash group so hash
    collisions cannot merge distinct texts.
    """

    hashed = ds.map_batches(
        lambda b: add_content_hash(b, column=column),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        agg = (
            g.groupby(column, as_index=False, sort=False)
            .agg(**{id_column: (id_column, "min"), "n_copies": (id_column, "size")})
        )
        cols = [id_column, "n_copies"] + ([column] if keep_payload else [])
        return agg[cols]

    return hashed.groupby("content_hash").map_groups(pick, batch_format="pandas")
