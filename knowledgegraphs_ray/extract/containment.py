"""Containment-join FK inference (isJoin check).

Reference: TabularFilesConnector "are all values of srcTable.fkCol contained
in tgtTable.pkCol?" used to discover FKs
(RelationalDB.java:111-115, TabularSpecificRules.java:119-130).

Ray-Data-first: the reference runs a per-value lookup; here the (small) ref
key column is broadcast once via ``ray.put`` and the check is a vectorized
``is_in`` inside ``map_batches`` — a broadcast semi/anti join, no shuffle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def containment_check(
    src: ray.data.Dataset,
    src_col: str,
    ref: ray.data.Dataset,
    ref_col: str,
) -> dict:
    """Returns {n_src_rows, n_dangling, contained} — contained=True iff every
    non-null src value appears in ref's key column."""
    chunks = []
    for b in ref.select_columns([ref_col]).iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"
    ):
        col = b[ref_col].combine_chunks()
        if pa.types.is_integer(col.type):
            col = col.cast(pa.int64())
        chunks.append(pc.unique(col))
    keys_ref = ray.put(pc.unique(pa.concat_arrays(chunks)))

    class Check:
        """Stateless broadcast-lookup task (instance passed to map_batches —
        plain task pool, no CPU-pinning actors)."""

        def __init__(self, keys_ref):
            self.keys_ref = keys_ref
            self.keys = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self.keys is None:
                self.keys = ray.get(self.keys_ref)
            col = batch[src_col].combine_chunks()
            if pa.types.is_integer(col.type):
                col = col.cast(pa.int64())
            dangling = pc.and_(
                pc.is_valid(col), pc.invert(pc.is_in(col, value_set=self.keys))
            )
            return pa.table(
                {
                    "n_src_rows": pa.array([len(col)], pa.int64()),
                    "n_dangling": pa.array(
                        [pc.sum(pc.cast(dangling, pa.int64())).as_py() or 0], pa.int64()
                    ),
                }
            )

    parts = src.select_columns([src_col]).map_batches(
        Check(keys_ref), batch_format="pyarrow"
    )
    tot = parts.sum(["n_src_rows", "n_dangling"])
    n_rows = int(tot["sum(n_src_rows)"])
    n_dangling = int(tot["sum(n_dangling)"])
    return {
        "n_src_rows": n_rows,
        "n_dangling": n_dangling,
        "contained": n_dangling == 0,
    }
