"""Hierarchy-aware selection (H4 wired into the select cascade)."""

import ray.data

from knowledgegraphs_ray.linking.select import select_links
from knowledgegraphs_ray.rules.hierarchy import Hierarchy

H = Hierarchy.build([("kg:Dog", "kg:Mammal")])


def _scored():
    return ray.data.from_items(
        [
            {"mention": "dog", "cand_iri": "kg:Dog", "bes": 0.9, "pj": 0.9},
            {"mention": "dog", "cand_iri": "kg:Mammal", "bes": 0.88, "pj": 0.9},
        ]
    )


def test_select_specializes_with_hierarchy():
    out = select_links(_scored(), hierarchy=H).to_pandas()
    assert out["cand_iri"].tolist() == ["kg:Dog"]  # child beats its ancestor


def test_select_without_hierarchy_keeps_best_score():
    out = select_links(_scored()).to_pandas()
    assert out["cand_iri"].tolist() == ["kg:Dog"]  # same winner, different path


def test_class_uses_data_props_rule_table():
    """H6 — MappingSelection.java:631-661: the four ways a data candidate is
    accepted or rejected for a class."""
    from knowledgegraphs_ray.rules.hierarchy import Hierarchy, class_uses_data_props

    h = Hierarchy.build(
        edges=[
            ("do:Account", "do:FinancialThing"),
            ("do:hasBalance", "do:hasAmount"),  # property hierarchy
        ],
        restrictions=[("do:FinancialThing", "do:hasAmount")],
    )
    cands = ["do:hasBalance", "do:hasName", "do:hasWeight", "do:hasAge"]
    domains = {
        "do:hasName": "do:FinancialThing",  # ancestor domain -> compatible
        "do:hasWeight": "do:Animal",        # unrelated domain -> reject...
        "do:hasAge": None,                  # missing domain
        # do:hasBalance: no declared domain either
    }
    got = class_uses_data_props(
        "do:Account", cands, h, domains=domains, missing_domain_is_compatible=False
    )
    # hasName: domain is an ancestor of Account -> compatible (step 1)
    assert "do:hasName" in got
    # hasBalance: missing domain NOT auto-compatible, but Account inherits a
    # restriction on hasAmount (via FinancialThing) and hasBalance is a
    # sub-property of hasAmount -> rescued by the restriction check (step 2)
    assert "do:hasBalance" in got
    # hasWeight: incompatible domain, no restriction match -> rejected
    assert "do:hasWeight" not in got
    # hasAge: missing domain, no restriction relation -> rejected
    assert "do:hasAge" not in got

    # with missing_domain_is_compatible=True the missing-domain candidates pass
    got2 = class_uses_data_props("do:Account", cands, h, domains=domains)
    assert "do:hasAge" in got2


def test_class_uses_data_props_union_domain():
    from knowledgegraphs_ray.rules.hierarchy import Hierarchy, class_uses_data_props

    h = Hierarchy.build([("do:Cat", "do:Animal")])
    got = class_uses_data_props(
        "do:Cat",
        ["do:hasTail"],
        h,
        domains={"do:hasTail": {"do:Plant", "do:Animal"}},  # union: ANY operand
        missing_domain_is_compatible=False,
    )
    assert got == {"do:hasTail"}


def test_e4_bridge_property_synthesis_and_roundtrip(tmp_path):
    """E4 — SetPOasDOextension.java:537-590: class-first mapping path mints
    p_<TableClass>_<FirstClass> + inverse + someValuesFrom restriction; the
    restriction survives the N-Triples round trip."""
    import pandas as pd
    import ray.data

    from knowledgegraphs_ray.rules.compiler import compile_rules
    from knowledgegraphs_ray.rules.merge import Matches, merge_po_into_do
    from knowledgegraphs_ray.rules.ontology_export import ontology_triples
    from knowledgegraphs_ray.schema.model import tpch_schema
    from knowledgegraphs_ray.sinks.ntriples import write_ntriples
    from knowledgegraphs_ray.sources.ontology import load_ontology

    rules = compile_rules(tpch_schema(["customer", "nation"]))
    m = Matches(
        data_props={"kg:has_c_acctbal": "do:hasBalance"},
        paths={"kg:has_c_acctbal": ["do:Account", "do:hasBalance"]},
        do_classes={"do:Account"},
    )
    res = merge_po_into_do(rules, m)
    assert ("kg:p_Customer_Account", "kg:p_Account_Customer") in res.bridges
    assert res.rules.object_props["kg:p_Customer_Account"] == (
        "kg:Customer",
        "do:Account",
    )
    assert ("kg:Customer", "kg:p_Customer_Account", "do:Account") in res.restrictions
    assert res.hierarchy().restriction_props("kg:Customer") == {
        "kg:p_Customer_Account"
    }

    # round trip: export with restriction bnodes -> NT -> load_ontology
    df = ontology_triples(res.rules, restrictions=res.restrictions)
    out = str(tmp_path / "onto_nt")
    write_ntriples(ray.data.from_pandas(df), out)
    _, h = load_ontology(out + "/*.nt")
    assert "kg:p_Customer_Account" in h.restriction_props("kg:Customer")
