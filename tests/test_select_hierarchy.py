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
