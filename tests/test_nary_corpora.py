"""N-ary patterns (H5), seed scores (X4), corpora builder (B3)."""

import pandas as pd

from knowledgegraphs_ray.linking.corpora import build_corpora, uniqify
from knowledgegraphs_ray.linking.index import AnnotationIndex
from knowledgegraphs_ray.linking.nary import find_nary_patterns, seed_scores
from knowledgegraphs_ray.rules.hierarchy import Hierarchy

H = Hierarchy.build([("kg:Dog", "kg:Mammal"), ("kg:Cat", "kg:Mammal")])


def test_nary_selects_min_sum_rank():
    obj = pd.DataFrame({"cand_iri": ["do:hasPet", "do:owns"], "pj_rank": [1, 2]})
    cls = pd.DataFrame({"cand_iri": ["kg:Dog", "kg:Cat"], "pj_rank": [2, 1]})
    ranges = {"do:hasPet": "kg:Mammal", "do:owns": "kg:Mammal"}
    out = find_nary_patterns(obj, cls, H, ranges)
    assert out is not None
    assert out.loc[0, "obj_prop"] == "do:hasPet" and out.loc[0, "cls"] == "kg:Cat"
    assert out.loc[0, "sum_pj_rank"] == 2


def test_nary_rejects_ambiguous_top():
    obj = pd.DataFrame({"cand_iri": ["do:a", "do:b"], "pj_rank": [1, 1]})
    cls = pd.DataFrame({"cand_iri": ["kg:Dog", "kg:Cat"], "pj_rank": [1, 1]})
    ranges = {"do:a": "kg:Mammal", "do:b": "kg:Mammal"}
    assert find_nary_patterns(obj, cls, H, ranges) is None


def test_nary_incompatible_range_filtered():
    h = Hierarchy.build([("kg:Dog", "kg:Mammal"), ("kg:Rock", "kg:Mineral")])
    obj = pd.DataFrame({"cand_iri": ["do:hasPet"], "pj_rank": [1]})
    cls = pd.DataFrame({"cand_iri": ["kg:Rock"], "pj_rank": [1]})
    out = find_nary_patterns(obj, cls, h, {"do:hasPet": "kg:Mammal"})
    # only the class-only row survives
    assert out is not None and pd.isna(out.loc[0, "obj_prop"])


def test_seed_scores_excludes_own_mention():
    selections = pd.DataFrame(
        {"mention": ["hr"], "cand_label": ["heart rate"], "bes": [0.95]}
    )
    candidates = pd.DataFrame(
        {"mention": ["hr", "bp"], "cand_label": ["heart rhythm", "heart pressure"]}
    )
    out = seed_scores(selections, candidates)
    # the 'hr' candidate can't use the 'hr' seed -> 0; 'bp' scores against it
    assert out.loc[0, "seed_score"] == 0.0
    assert out.loc[1, "seed_score"] > 0.0


def test_uniqify_order_preserving():
    assert uniqify([("a", "b"), ("c", "d"), ("a", "b")]) == [("a", "b"), ("c", "d")]


def test_build_corpora():
    idx = AnnotationIndex.build(
        {"kg:Dog": ["dog", "hound"], "kg:Cat": ["cat"], "kg:Fish": ["fish"]}
    )
    h = Hierarchy.build([("kg:Dog", "kg:Pet"), ("kg:Cat", "kg:Pet")])
    c = build_corpora(idx, h, seed=1)
    assert ("dog", "hound") in c["synonyms"]
    assert ("dog", "dog") in c["synonyms"]
    # hard negatives are sibling label pairs
    assert any({"cat"} & {a, b} and {"dog", "hound"} & {a, b} for a, b in c["hard_nonsynonyms"])
    # determinism
    assert c == build_corpora(idx, h, seed=1)
    # soft negatives never collide with synonyms
    assert not set(c["soft_nonsynonyms"]) & set(c["synonyms"])
