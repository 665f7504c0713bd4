"""Ontology export -> N-Triples sink -> ontology reader round-trip (S7/S8/R13)."""

import ray.data

from knowledgegraphs_ray.rules.compiler import compile_rules
from knowledgegraphs_ray.rules.ontology_export import ontology_triples
from knowledgegraphs_ray.schema.model import tpch_schema
from knowledgegraphs_ray.sinks.ntriples import write_ntriples
from knowledgegraphs_ray.sources.ontology import load_ontology, parse_ntriples


def test_nt_roundtrip(tmp_path):
    rules = compile_rules(tpch_schema(["nation", "region"]))
    df = ontology_triples(rules, subclass_edges=[("kg:Nation", "kg:Region")])
    out = str(tmp_path / "onto_nt")
    write_ntriples(ray.data.from_pandas(df), out)

    rows = parse_ntriples(out + "/*.nt")
    assert len(rows) == len(df)

    index, hierarchy = load_ontology(out + "/*.nt")
    # labels recovered through the sink round-trip
    assert "nation" in index.labels["kg:Nation"]
    assert index.exact_match("nation") == ["kg:Nation"]
    # subclass edge recovered
    assert hierarchy.is_ancestor("kg:Region", "kg:Nation")


def test_parse_literal_escapes(tmp_path):
    p = tmp_path / "x.nt"
    p.write_text(
        '<http://kg.local/A> <http://www.w3.org/2000/01/rdf-schema#label> "a \\"b\\"\\nc" .\n'
    )
    rows = parse_ntriples(str(p))
    assert rows == [("kg:A", "rdfs:label", 'a "b"\nc', True)]
