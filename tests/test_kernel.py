"""Unit tests for the vectorized triple-extraction kernel (SURVEY.md §2.11)."""

import pyarrow as pa

from knowledgegraphs_ray.extract.kernel import TripleKernel, format_literal
from knowledgegraphs_ray.rules.compiler import compile_rules
from knowledgegraphs_ray.schema.model import FKPointer, SchemaGraph, TableSchema


def _mini_schema() -> SchemaGraph:
    g = SchemaGraph()
    g.add(
        TableSchema(
            "person",
            {
                "pid": "int",
                "name": "varchar",
                "bal": "double",
                "born": "timestamp",
                "active": "bool",
                "aid": "int",
            },
            pks=["pid"],
            fks={"aid": FKPointer("addr", "aid")},
        )
    )
    g.add(TableSchema("addr", {"aid": "int", "city": "varchar"}, pks=["aid"]))
    return g


def _batch() -> pa.Table:
    return pa.table(
        {
            "pid": pa.array([1, 2, 3], pa.int64()),
            "name": pa.array(["ann", "-", None], pa.string()),
            "bal": pa.array([1.5, None, 2.125], pa.float64()),
            "born": pa.array([1000000, None, 2000000], pa.timestamp("us")),
            "active": pa.array([True, False, None], pa.bool_()),
            "aid": pa.array([10, None, 30], pa.int64()),
        }
    )


def _triples(attrs=False):
    g = _mini_schema()
    rt = compile_rules(g, attrs_to_classes=attrs)
    kern = TripleKernel(rt.plans["person"], g["person"].columns)
    t = kern(_batch())
    return {(r["subj"], r["pred"], r["obj"]) for r in t.to_pylist()}


def test_type_and_link_triples():
    trip = _triples()
    assert ("kg:person/1", "rdf:type", "kg:Person") in trip
    assert ("kg:person/1", "kg:p_person_addr", "kg:addr/10") in trip
    # null FK dropped
    assert not any(s == "kg:person/2" and p == "kg:p_person_addr" for s, p, _ in trip)


def test_null_sentinels_dropped():
    # "-" and None name values produce no has_name triple (M7)
    trip = _triples()
    names = [t for t in trip if t[1] == "kg:has_name"]
    assert names == [("kg:person/1", "kg:has_name", "ann")]


def test_literal_formats():
    trip = _triples()
    assert ("kg:person/1", "kg:has_bal", "1.50") in trip
    assert ("kg:person/3", "kg:has_bal", "2.12") in trip  # %.2f half-even on binary value
    assert ("kg:person/1", "kg:has_born", "1970-01-01 00:00:01") in trip
    assert ("kg:person/1", "kg:has_active", "true") in trip
    assert ("kg:person/2", "kg:has_active", "false") in trip


def test_attr_class_mode_paths():
    trip = _triples(attrs=True)
    # row -> attr individual -> literal (DataPropExtractor.java:34-46 shape)
    assert ("kg:person/1", "kg:has_name", "kg:person/1/name") in trip
    assert ("kg:person/1/name", "rdf:type", "kg:Person_name") in trip
    assert ("kg:person/1/name", "kg:has_name_VALUE", "ann") in trip


def test_deterministic_and_idempotent():
    # retry-idempotence: same batch twice -> same triple set (no counters)
    assert _triples() == _triples()


def test_format_literal_double_nulls():
    out = format_literal(pa.array([1.0, None], pa.float64()), "double")
    assert out.to_pylist() == ["1.00", None]


def test_inverse_link_emission():
    g = _mini_schema()
    rt = compile_rules(g, include_inverse=True)
    kern = TripleKernel(rt.plans["person"], g["person"].columns)
    trip = {(r["subj"], r["pred"], r["obj"]) for r in kern(_batch()).to_pylist()}
    assert ("kg:person/1", "kg:p_person_addr", "kg:addr/10") in trip
    assert ("kg:addr/10", "kg:p_addr_person", "kg:person/1") in trip
    # null FK emits neither direction
    assert not any(s == "kg:addr/None" or o == "kg:person/2" and p.endswith("_inv")
                   for s, p, o in trip)


def test_empty_batch():
    g = _mini_schema()
    rt = compile_rules(g)
    kern = TripleKernel(rt.plans["person"], g["person"].columns)
    t = kern(_batch().slice(0, 0))
    assert t.num_rows == 0 and t.schema.names == ["subj", "pred", "obj"]
