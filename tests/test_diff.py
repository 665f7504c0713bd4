"""Corpus snapshot diff (state/diff.py): status classification, all-four
coverage on the driver query's shape, and empty-side edges."""

import pandas as pd
import ray.data

from knowledgegraphs_ray.state.diff import corpus_diff


def _ds(rows):
    return ray.data.from_pandas(pd.DataFrame(rows))


def test_statuses():
    old = _ds({"doc_id": [1, 2, 3], "text": ["a", "b", "c"]})
    new = _ds({"doc_id": [2, 3, 4], "text": ["b", "CHANGED", "d"]})
    out = (
        corpus_diff(old, new)
        .to_pandas()
        .set_index("doc_id")["status"]
        .to_dict()
    )
    assert out == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_catalog_query_covers_all_statuses(sf_dir):
    from knowledgegraphs_ray.pipelines.catalog import q_corpus_diff

    out = q_corpus_diff(sf_dir).to_pandas()
    counts = out["status"].value_counts().to_dict()
    assert set(counts) == {"added", "removed", "changed", "unchanged"}
    # one row per id in either snapshot
    assert out["doc_id"].is_unique


def test_empty_sides():
    old = _ds({"doc_id": [1], "text": ["a"]})
    empty = _ds({"doc_id": pd.Series([], dtype="int64"),
                 "text": pd.Series([], dtype="string")})
    gone = corpus_diff(old, empty).to_pandas()
    assert gone["status"].tolist() == ["removed"]
    born = corpus_diff(empty, old).to_pandas()
    assert born["status"].tolist() == ["added"]
