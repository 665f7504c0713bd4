"""Block-level hygiene helpers.

Ray Data's shuffle operators emit 0-row blocks whose schema is empty (or a
stale pandas-born ``null``-typed one), and ``map_batches`` passes empty
blocks through without invoking the UDF — so a schema-poisoned empty block
survives every downstream stage and breaks Arrow hash joins ("No match for
key field reference ... on right side"). ``compact_nonempty`` materializes a
dataset and drops its 0-row blocks without moving any data through the
driver (block refs stay in the object store).
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data


def empty_pandas_template(ds: ray.data.Dataset):
    """0-row pandas DataFrame with the dataset's column dtypes — works for
    both Arrow-backed schemas and PandasBlockSchema (pandas-born datasets,
    whose ``schema()`` has no ``base_schema``)."""
    import pandas as pd

    sch = ds.schema()
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base.empty_table().to_pandas()

    def _dtype(t):
        return t.to_pandas_dtype() if isinstance(t, pa.DataType) else t

    return pd.DataFrame(
        {n: pd.Series([], dtype=_dtype(t)) for n, t in zip(sch.names, sch.types)}
    )


@ray.remote
def _num_rows(block) -> int:
    # len() covers both pa.Table (== num_rows) and pandas DataFrame blocks —
    # to_arrow_refs hands back pandas-born blocks unconverted
    return len(block)


@ray.remote
def _as_arrow(block) -> pa.Table:
    if isinstance(block, pa.Table):
        return block
    return pa.Table.from_pandas(block, preserve_index=False)


def compact_nonempty(ds: ray.data.Dataset, schema: pa.Schema) -> ray.data.Dataset:
    """Materialize ``ds`` and drop 0-row blocks. If everything is empty,
    return a single empty block with the given ``schema`` (so downstream
    joins/aggregates see stable types)."""
    refs = ds.materialize().to_arrow_refs()
    counts = ray.get([_num_rows.remote(r) for r in refs])
    kept = [_as_arrow.remote(r) for r, n in zip(refs, counts) if n > 0]
    if not kept:
        return ray.data.from_arrow(schema.empty_table())
    return ray.data.from_arrow_refs(kept)


def drop_empty_blocks(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Materialize ``ds`` and drop its 0-row blocks — the centralized join
    hygiene ``extract/joins.native_join`` applies to both sides (Ray's
    hash-shuffle join intermittently fails on schema-poisoned empty
    blocks). Row counts come from block METADATA (no remote calls); when
    no block is empty the materialized dataset is returned untouched, and
    an all-empty dataset is returned as-is (the caller's count()==0
    short-circuits own that case, exactly as before centralization)."""
    mat = ds.materialize()
    refs: list = []
    counts: list = []
    for b in mat.iter_internal_ref_bundles():
        refs.extend(b.block_refs)
        counts.extend(m.num_rows for m in b.metadata)
    if any(c is None for c in counts):  # metadata gap: count remotely
        counts = ray.get([_num_rows.remote(r) for r in refs])
    if all(c > 0 for c in counts) or not any(counts):
        return mat
    kept = [_as_arrow.remote(r) for r, c in zip(refs, counts) if c > 0]
    return ray.data.from_arrow_refs(kept)
