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


def test_text_semantics_corpora_structure():
    """Full BERTMap corpus (text_semantics.py:486-584): intra-src + intra-tgt
    + cross sub-corpora, labelled pairs, nonsyn − syn subtraction."""
    from knowledgegraphs_ray.linking.corpora import text_semantics_corpora
    from knowledgegraphs_ray.linking.index import AnnotationIndex
    from knowledgegraphs_ray.rules.hierarchy import Hierarchy

    src = AnnotationIndex.build(
        {"po:A": ["alpha", "alpha form"], "po:B": ["beta"], "po:C": ["gamma"]}
    )
    tgt = AnnotationIndex.build(
        {"do:X": ["alpha", "ex"], "do:Y": ["why"], "do:Z": ["zed"]}
    )
    h = Hierarchy.build([("do:Y", "do:X"), ("do:Z", "do:X")])
    out = text_semantics_corpora(
        src, tgt, tgt_hierarchy=h, class_mappings=[("po:A", "do:X"), ("po:B", "do:Y")]
    )
    syn = {(a, b) for a, b, _ in out["synonyms"]}
    non = {(a, b) for a, b, _ in out["nonsynonyms"]}
    # intra synonyms: within-class cartesian products
    assert ("alpha", "alpha form") in syn
    # cross synonyms: matched-class label products, both directions, no identity
    assert ("alpha form", "ex") in syn and ("ex", "alpha form") in syn
    assert ("alpha", "alpha") in syn  # identity from INTRA corpus
    # labels carry 1/0
    assert all(y == 1 for _, _, y in out["synonyms"])
    assert all(y == 0 for _, _, y in out["nonsynonyms"])
    # subtraction: no pair is both
    assert not syn & non
    # hard negatives exist (Y and Z are siblings under X)
    assert out["summary"]["intra_tgt"]["num_hard_nonsynonyms"] > 0


def test_thesaurus_corpus_pair_invariants():
    """WordNetCorpus analogue (thesaurus_corpus.py:14-97, B3 completion):
    synonym left side is always an ontology token, lemma != token, antonyms
    land in nonsynonyms, and the section merges into the full corpus with
    its summary recorded."""
    from knowledgegraphs_ray.linking.corpora import (
        BUILTIN_THESAURUS,
        text_semantics_corpora,
        thesaurus_corpus,
    )
    from knowledgegraphs_ray.linking.index import AnnotationIndex

    src = AnnotationIndex.build(
        {
            "po:Cust": ["customer name", "the customer"],
            "po:Ship": ["ship date"],
            "po:Open": ["open balance"],
        }
    )
    tc = thesaurus_corpus(src)
    toks = {"customer", "name", "ship", "date", "open", "balance"}
    assert {a for a, _ in tc["synonyms"]} <= toks
    assert all(a != b for a, b in tc["synonyms"])
    assert ("customer", "client") in tc["synonyms"]
    assert ("open", "closed") in tc["nonsynonyms"]
    assert ("ship", "receive") in tc["nonsynonyms"]
    # "the" is a stopword -> never tokenized
    assert tc["summary"]["num_ontology_tokens"] == len(toks)

    tgt = AnnotationIndex.build({"do:X": ["client record"]})
    full = text_semantics_corpora(src, tgt)
    syn = {(a, b) for a, b, _ in full["synonyms"]}
    non = {(a, b) for a, b, _ in full["nonsynonyms"]}
    assert ("customer", "client") in syn
    assert ("open", "closed") in non and not (syn & non)
    assert full["summary"]["thesaurus"]["num_synonyms"] == len(tc["synonyms"])
    # opt-out keeps the section empty
    off = text_semantics_corpora(src, tgt, thesaurus=False)
    assert off["summary"]["thesaurus"] is None
    assert ("customer", "client") not in {(a, b) for a, b, _ in off["synonyms"]}
    assert BUILTIN_THESAURUS["customer"]["synonyms"]  # bundled table non-trivial


def test_corpora_deterministic_and_ratios():
    from knowledgegraphs_ray.linking.corpora import intra_ontology_corpus
    from knowledgegraphs_ray.linking.index import AnnotationIndex

    idx = AnnotationIndex.build(
        {f"po:C{i}": [f"label {i}", f"form {i}"] for i in range(10)}
    )
    a = intra_ontology_corpus(idx, seed=5)
    b = intra_ontology_corpus(idx, seed=5)
    assert a == b  # seeded determinism
    s = a["summary"]
    # soft compensates hard up to (2+2) x synonyms (text_semantics.py:300-310)
    assert s["num_soft_nonsynonyms"] + s["num_hard_nonsynonyms"] <= 4 * s["num_synonyms"]


def test_trainer_seam_raises_without_torch():
    import pytest

    from knowledgegraphs_ray.linking.trainer import _TORCH, train_synonym_classifier

    if _TORCH:
        pytest.skip("torch present")
    with pytest.raises(RuntimeError, match="B2 seam"):
        train_synonym_classifier("/nonexistent.json", "/tmp/out")
