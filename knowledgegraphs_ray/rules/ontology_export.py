"""Putative-ontology export (R13 analogue).

Reference: POntologyExtractor.java:67-255 — emit the ontology itself as OWL
axioms (class declarations, subclass links, property domain/range, labels).
Here the ontology is the compiled RuleTable; the export is a small triple
table (driver-built — the ontology is schema-sized) that writes through the
same Parquet / N-Triples sinks as the data triples.
"""

from __future__ import annotations

import pandas as pd

from knowledgegraphs_ray.linking.index import ontology_labels_from_rules
from knowledgegraphs_ray.rules.compiler import RuleTable

OWL_CLASS = "owl:Class"
OWL_OBJ_PROP = "owl:ObjectProperty"
OWL_DATA_PROP = "owl:DatatypeProperty"

XSD_BY_DTYPE = {
    "int": "xsd:integer",
    "bigint": "xsd:integer",
    "double": "xsd:double",
    "bool": "xsd:boolean",
    "timestamp": "xsd:dateTime",
    "varchar": "xsd:string",
    "string": "xsd:string",
}


def ontology_triples(
    rules: RuleTable,
    *,
    subclass_edges: list[tuple[str, str]] | None = None,
    restrictions: list[tuple[str, str, str]] | None = None,
) -> pd.DataFrame:
    """-> (subj, pred, obj) rows describing the ontology.

    ``restrictions``: (class, onProperty, someValuesFrom-range) triples —
    emitted as owl:Restriction blank nodes (E4 bridge output; round-trips
    through sinks.ntriples / sources.ontology)."""
    rows: list[tuple[str, str, str]] = []
    for i, (cls, prop, rng) in enumerate(sorted(restrictions or [])):
        b = f"_:r{i}"
        rows.append((cls, "rdfs:subClassOf", b))
        rows.append((b, "rdf:type", "owl:Restriction"))
        rows.append((b, "owl:onProperty", prop))
        rows.append((b, "owl:someValuesFrom", rng))
    for ciri in sorted(rules.classes):
        rows.append((ciri, "rdf:type", OWL_CLASS))
    for piri, (dom, ran) in sorted(rules.object_props.items()):
        rows.append((piri, "rdf:type", OWL_OBJ_PROP))
        rows.append((piri, "rdfs:domain", dom))
        rows.append((piri, "rdfs:range", ran))
    for diri, (dom, dtype) in sorted(rules.data_props.items()):
        rows.append((diri, "rdf:type", OWL_DATA_PROP))
        rows.append((diri, "rdfs:domain", dom))
        rows.append((diri, "rdfs:range", XSD_BY_DTYPE.get(dtype, "xsd:string")))
    for child, parent in sorted(subclass_edges or []):
        rows.append((child, "rdfs:subClassOf", parent))
    # labels (Annotations.java:24-37 analogue: rdfs:label from resource name)
    for iri, labels in sorted(ontology_labels_from_rules(rules).items()):
        if labels:
            rows.append((iri, "rdfs:label", labels[-1]))
    return pd.DataFrame(rows, columns=["subj", "pred", "obj"])
