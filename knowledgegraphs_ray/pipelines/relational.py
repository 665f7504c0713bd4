"""Relational-dataset -> knowledge-graph pipeline (the reference's main path).

read_parquet (column-pruned) -> per-table vectorized TripleKernel ->
union -> optional dedup -> sink. Mirrors Pipeline.java:44-110's
B (load) / C (PO extraction) / E (insert) stages, Ray-Data-first: the schema
rules compile on the driver (tiny), all data movement is streaming
``map_batches`` over zero-copy Arrow batches, and there is NO shuffle in the
whole extraction path (deterministic IRIs make FK links map-only).
"""

from __future__ import annotations

import ray.data

from knowledgegraphs_ray.extract.kernel import TripleKernel
from knowledgegraphs_ray.rules.compiler import RuleTable, compile_rules
from knowledgegraphs_ray.schema.model import SchemaGraph, tpch_schema


def read_table(sf_dir: str, table: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Pruned parquet read. Small files read as ONE block: Ray's default
    split fans even a 5-row dimension table into 64 blocks, and a multi-way
    union of such reads schedules hundreds of near-empty blocks for nothing
    (measured: ~0.5s/table of pure overhead at sf0.1). Files above the
    threshold keep Ray's size-based parallelism."""
    import os

    path = f"{sf_dir}/{table}.parquet"
    kwargs = {}
    try:
        if os.path.getsize(path) < 4 << 20:
            kwargs["override_num_blocks"] = 1
    except OSError:
        pass  # globs / remote paths: let Ray decide
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def extract_table_triples(
    sf_dir: str, table: str, rules: RuleTable, schema: SchemaGraph
) -> ray.data.Dataset:
    """Triples of one table: pruned read -> TripleKernel map_batches."""
    plan = rules.plans[table]
    ds = read_table(sf_dir, table, columns=plan.needed_columns)
    kernel = TripleKernel(plan, schema[table].columns)
    # large batches: the kernel is pure Arrow compute — per-call overhead
    # dominates at Ray's default 1024-row batches
    return ds.map_batches(
        kernel, batch_format="pyarrow", zero_copy_batch=True, batch_size=32768
    )


def extract_kg(
    sf_dir: str,
    tables: list[str] | None = None,
    *,
    schema: SchemaGraph | None = None,
    attrs_to_classes: bool = False,
    include_inverse: bool = False,
) -> ray.data.Dataset:
    """Full dataset -> (subj, pred, obj) triple Dataset (streaming union)."""
    g = schema or tpch_schema(tables)
    rules = compile_rules(
        g, attrs_to_classes=attrs_to_classes, include_inverse=include_inverse
    )
    names = [t for t in (tables or list(g.tables)) if t in rules.plans]
    parts = [extract_table_triples(sf_dir, t, rules, g) for t in names]
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds
