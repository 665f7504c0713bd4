"""Vectorized triple-extraction kernels.

The analogue of the reference's row-at-a-time data walk
(E_CreateKG/InsertDataRDB.java:69-166 — nested Java for-loops over Tablesaw
rows) re-expressed as pure pyarrow.compute kernels applied per Arrow batch via
``Dataset.map_batches(fn, batch_format="pyarrow")`` — zero-copy in, one
(subj, pred, obj) string table out.

Key departures from the reference, by design:

* **Deterministic IRIs** — row IRI = ``kg:<table>/<pk values joined by _>``
  (vs InsertDataRDB.java:127-132's table-index rowID, and instead of the
  global mutable counters of InsertDataJSON.java:33-52). Pure function of row
  content ⇒ task retries are idempotent and outputs are comparable across
  parallelism levels.
* **FK links without a join** — the target IRI is minted directly from the FK
  value (vs the per-row ref-table lookup of InsertDataRDB.java:197-211).
  At 100 TB this turns an all-to-all join into a map-only stage.
* **Literal formatting is fixed per logical type** (ints as decimal strings,
  doubles as %.2f, timestamps as second-resolution ISO — InsertDataBase
  createTypedLiteral analogue, InsertDataBase.java:209-214) so the emitted
  triple set is bit-stable and oracle-comparable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from knowledgegraphs_ray.rules.compiler import (
    KG,
    NULL_SENTINELS,
    RDF_TYPE,
    DataEmit,
    LinkEmit,
    TablePlan,
    TypeEmit,
)

TRIPLE_SCHEMA = pa.schema(
    [("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string())]
)

# Native edge-table form: predicates are drawn from the compiled rule set
# (~dozens of distinct values), so the kernels emit them dictionary-encoded
# — a 1-value dictionary per emitted chunk costs 4 bytes/row in the object
# store instead of the ~20-byte materialized string (measured 5× smaller
# pickled blocks). Parquet sinks keep the dictionary encoding; the DuckDB
# oracle path decodes at the boundary via ``decode_triples``.
PRED_TYPE = pa.dictionary(pa.int32(), pa.string())
TRIPLE_SCHEMA_ENC = pa.schema(
    [("subj", pa.string()), ("pred", PRED_TYPE), ("obj", pa.string())]
)

_SENTINEL_SET = pa.array(list(NULL_SENTINELS), type=pa.string())


def decode_triples(ds):
    """Encoded (dictionary-pred) triples -> plain-string TRIPLE_SCHEMA.

    The decode fuses into the upstream kernel task, so the oracle-facing
    queries pay exactly the one string materialization per block the
    pre-encoding kernels paid per emit."""

    def _decode(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "subj": batch["subj"].combine_chunks().cast(pa.string()),
                "pred": batch["pred"].combine_chunks().cast(pa.string()),
                "obj": batch["obj"].combine_chunks().cast(pa.string()),
            },
            schema=TRIPLE_SCHEMA,
        )

    return ds.map_batches(_decode, batch_format="pyarrow", zero_copy_batch=True)


def format_literal(arr: pa.ChunkedArray | pa.Array, dtype: str) -> pa.Array:
    """Typed-literal lexical form (InsertDataBase.java:209-214 analogue)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if dtype == "double":
        np_arr = arr.to_numpy(zero_copy_only=False)
        mask = np.isnan(np_arr)
        out = np.char.mod("%.2f", np.nan_to_num(np_arr))
        return pa.array(out, type=pa.string(), mask=mask)
    if dtype == "timestamp":
        # cast to second resolution first — Arrow's %S includes fractional
        # seconds for sub-second timestamp types, unlike DuckDB's strftime
        secs = arr.cast(pa.timestamp("s"), safe=False)
        return pc.strftime(secs, format="%Y-%m-%d %H:%M:%S")
    if dtype == "bool":
        return pc.if_else(arr, pa.scalar("true"), pa.scalar("false"))
    if dtype in ("int", "bigint"):
        return pc.cast(arr, pa.string())
    return pc.cast(arr, pa.string())


def key_string(arr: pa.ChunkedArray | pa.Array, dtype: str) -> pa.Array:
    """Key-position value -> IRI fragment (sanitized for varchar, M8)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if dtype in ("varchar", "string"):
        return pc.replace_substring_regex(arr, r"[/\\%# ]", "_")
    return pc.cast(arr, pa.string())


def _const(value: str, n: int) -> pa.Array:
    return pa.DictionaryArray.from_arrays(
        pa.array(np.zeros(n, dtype=np.int32)), pa.array([value])
    ).cast(pa.string())


def _const_dict(value: str, n: int) -> pa.DictionaryArray:
    """Constant column kept dictionary-encoded (4 bytes/row, never
    materialized as repeated strings)."""
    return pa.DictionaryArray.from_arrays(
        pa.array(np.zeros(n, dtype=np.int32)), pa.array([value])
    )


def _all_true(mask: pa.Array) -> bool:
    """True iff the (non-null boolean) mask selects every row — lets emit()
    skip the filter copy for the common all-valid case."""
    return mask.null_count == 0 and pc.min(mask).as_py() is True


def row_iris(batch: pa.Table, plan: TablePlan, coltypes: dict[str, str]) -> pa.Array:
    """kg:<table>/<pk1>[_<pk2>...] — deterministic subject IRIs."""
    parts: list[pa.Array | str] = [KG + plan.table + "/"]
    for i, col in enumerate(plan.pk_cols):
        if i:
            parts.append("_")
        parts.append(key_string(batch[col], coltypes.get(col, "varchar")))
    if len(parts) == 1:
        raise ValueError(f"table {plan.table} has no PK columns for IRI minting")
    return pc.binary_join_element_wise(
        *[pa.scalar(p) if isinstance(p, str) else p for p in parts], ""
    )


def _valid_mask(arr: pa.Array, dtype: str) -> pa.Array:
    """Null / sentinel filter (M7 — InsertDataBase.java:190-192)."""
    mask = pc.is_valid(arr)
    if dtype in ("varchar", "string"):
        mask = pc.and_(mask, pc.invert(pc.is_in(arr, value_set=_SENTINEL_SET)))
    return mask


class TripleKernel:
    """Compiled per-table kernel: Arrow batch -> (subj, pred, obj) table.

    A plain callable (stateless task) — plan compilation happened on the
    driver; per-batch work is pure pyarrow.compute. Emits the ENCODED form
    (``TRIPLE_SCHEMA_ENC``: dictionary pred); oracle-facing callers append
    ``decode_triples``.
    """

    def __init__(self, plan: TablePlan, coltypes: dict[str, str]):
        self.plan = plan
        self.coltypes = coltypes

    def __call__(self, batch: pa.Table) -> pa.Table:
        plan = self.plan
        n = batch.num_rows
        if n == 0:
            return TRIPLE_SCHEMA_ENC.empty_table()
        subj = row_iris(batch, plan, self.coltypes)
        out: list[pa.Table] = []

        def emit(s: pa.Array, pred_const: str, o: pa.Array, mask: pa.Array | None):
            t = pa.table(
                {"subj": s, "pred": _const_dict(pred_const, len(s)), "obj": o},
                schema=TRIPLE_SCHEMA_ENC,
            )
            if mask is not None and not _all_true(mask):
                t = t.filter(mask)
            out.append(t)

        for e in plan.emits:
            if isinstance(e, TypeEmit):
                emit(subj, RDF_TYPE, _const(e.cls, n), None)
            elif isinstance(e, LinkEmit):
                col = batch[e.col]
                mask = _valid_mask(
                    col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col,
                    self.coltypes.get(e.col, "varchar"),
                )
                tgt = pc.binary_join_element_wise(
                    pa.scalar(KG + e.ref_table + "/"),
                    key_string(col, self.coltypes.get(e.col, "varchar")),
                    "",
                )
                emit(subj, e.pred, tgt, mask)
                if e.inverse_pred:
                    emit(tgt, e.inverse_pred, subj, mask)
            elif isinstance(e, DataEmit):
                col = batch[e.col]
                arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                mask = _valid_mask(arr, e.dtype)
                lit = format_literal(arr, e.dtype)
                if e.attr_cls:
                    # attribute-class mode (DataPropExtractor.java:34-46):
                    # intermediate individual kg:<row>/<col>
                    attr_iri = pc.binary_join_element_wise(
                        subj, pa.scalar(e.col), "/"
                    )
                    emit(subj, e.attr_pred, attr_iri, mask)
                    emit(attr_iri, RDF_TYPE, _const(e.attr_cls, n), mask)
                    emit(attr_iri, e.pred, lit, mask)
                else:
                    emit(subj, e.pred, lit, mask)

        return pa.concat_tables(out)
