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


def read_table(
    sf_dir: str,
    table: str,
    columns: list[str] | None = None,
    *,
    rows_per_block: int = 75_000,
    filter=None,
) -> ray.data.Dataset:
    """Pruned parquet read with block sizing for a TRIPLE-emITTING consumer.

    * Small files read as ONE block: Ray's default split fans even a 5-row
      dimension table into 64 blocks, and a multi-way union of such reads
      schedules hundreds of near-empty blocks for nothing (measured:
      ~0.5s/table of pure overhead at sf0.1).
    * Large single-row-group files get an explicit ``repartition``: Ray can
      only split a parquet read at row-group boundaries, so a monolithic
      600k-row file becomes ONE task — and the downstream kernel amplifies
      ~6-13 triples/row, serializing the dominant compute on one core. At
      production scale inputs arrive as many shards and this path is a
      no-op; the repartition moves each row once (far cheaper than losing
      the cluster's parallelism).
    * ``filter``: a ``pyarrow.dataset.Expression`` pushed into the parquet
      scan — row groups whose statistics exclude the predicate never leave
      storage, and surviving groups are filtered before Arrow
      materialization. Prefer this over a post-read ``map_batches`` filter
      whenever the predicate references read columns.
    """
    import math
    import os

    path = f"{sf_dir}/{table}.parquet"
    kwargs = {}
    n_blocks = None
    try:
        small = os.path.getsize(path) < 4 << 20
        import pyarrow.parquet as pq

        meta = pq.ParquetFile(path).metadata
        if small and meta.num_rows <= rows_per_block:
            kwargs["override_num_blocks"] = 1
        elif meta.num_rows > rows_per_block and meta.num_row_groups <= 1:
            n_blocks = min(64, math.ceil(meta.num_rows / rows_per_block))
    except OSError:
        pass  # globs / remote paths: let Ray decide
    if filter is not None:
        kwargs["filter"] = filter
        # a filtered read's output size is unknowable from file metadata;
        # keep Ray's fragment-level split rather than forcing one block
        kwargs.pop("override_num_blocks", None)
    ds = ray.data.read_parquet(path, columns=columns, **kwargs)
    if n_blocks is not None:
        ds = ds.repartition(n_blocks)
    return ds


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


def extract_link_edges(
    sf_dir: str,
    tables: list[str] | None = None,
    *,
    schema: SchemaGraph | None = None,
) -> ray.data.Dataset:
    """(src, dst) entity-link edge Dataset = the kg:p_* object-property
    triples ONLY, for graph analytics (graph/pagerank.py).

    Equivalent to filtering the full extraction on ``pred LIKE 'kg:p_%'``
    (which is what the DuckDB oracle does) but prunes at the PLAN level:
    each table's emits are cut to LinkEmit before the kernel runs, so
    ``needed_columns`` shrinks to PK+FK columns — the parquet read never
    loads data columns and the kernel never materializes literal strings."""
    from knowledgegraphs_ray.extract.kernel import decode_triples
    from knowledgegraphs_ray.rules.compiler import LinkEmit

    import pyarrow as pa

    g = schema or tpch_schema(tables)
    rules = compile_rules(g)
    for plan in rules.plans.values():
        plan.emits = [e for e in plan.emits if isinstance(e, LinkEmit)]
    names = [
        t
        for t in (tables or list(g.tables))
        if t in rules.plans and rules.plans[t].emits
    ]
    parts = [extract_table_triples(sf_dir, t, rules, g) for t in names]
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)

    def to_edges(b: pa.Table) -> pa.Table:
        return pa.table({"src": b["subj"], "dst": b["obj"]})

    return decode_triples(ds).map_batches(
        to_edges, batch_format="pyarrow", zero_copy_batch=True
    )


def events_schema() -> SchemaGraph:
    """Schema for the driver's event-stream table with ``user_id`` declared
    as an FK to a VIRTUAL ``user`` dimension — no physical user table exists;
    the class and its individuals are minted from the fact table itself
    (TODO'd "virtual-dimension KG"; reference analogue: subset schemas whose
    FK targets sit outside the loaded table set, RelationalDB.java:49-89)."""
    from knowledgegraphs_ray.schema.model import FKPointer, TableSchema

    g = SchemaGraph()
    g.add(
        TableSchema(
            "events",
            {
                "event_id": "int",
                "ts": "timestamp",
                "user_id": "int",
                "event_type": "varchar",
                "value": "double",
                "props": "varchar",
            },
            pks=["event_id"],
            fks={"user_id": FKPointer("user", "user_id")},
        )
    )
    return g


def virtual_dimension_types(
    ds: ray.data.Dataset, fk_col: str, ref_table: str
) -> ray.data.Dataset:
    """Type triples of a virtual dimension: one ``(kg:<ref>/<v>, rdf:type,
    <RefClass>)`` per DISTINCT non-null FK value.

    Scale shape: per-batch ``pc.unique`` partials first, so the global
    distinct shuffles only the already-deduped key column (one int64 per
    distinct-per-block value), then a hash ``groupby`` finishes the dedup and
    the type triples are emitted map-side in the kernel's dictionary-encoded
    form — no driver materialization at any width."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from knowledgegraphs_ray.extract.kernel import TRIPLE_SCHEMA_ENC, _const, _const_dict
    from knowledgegraphs_ray.rules.compiler import KG, RDF_TYPE, class_iri

    cls = class_iri(ref_table)
    base = KG + ref_table + "/"

    def partial(b: pa.Table) -> pa.Table:
        return pa.table({fk_col: pc.unique(b[fk_col]).drop_null()})

    def emit(b: pa.Table) -> pa.Table:
        n = b.num_rows
        if n == 0:
            return TRIPLE_SCHEMA_ENC.empty_table()
        subj = pc.binary_join_element_wise(
            pa.scalar(base), pc.cast(b[fk_col].combine_chunks(), pa.string()), ""
        )
        return pa.table(
            {"subj": subj, "pred": _const_dict(RDF_TYPE, n), "obj": _const(cls, n)},
            schema=TRIPLE_SCHEMA_ENC,
        )

    uniq = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(fk_col)
        .count()
        .drop_columns(["count()"])
    )
    return uniq.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)


def extract_events_kg(sf_dir: str) -> ray.data.Dataset:
    """events fact table -> KG with a minted virtual ``user`` dimension:
    per-row type/data/link triples from the compiled plan, plus one type
    triple per distinct user (the virtual dimension's individuals)."""
    g = events_schema()
    rules = compile_rules(g)
    facts = extract_table_triples(sf_dir, "events", rules, g)
    users = virtual_dimension_types(
        read_table(sf_dir, "events", columns=["user_id"]), "user_id", "user"
    )
    return facts.union(users)
