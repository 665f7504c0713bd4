"""Operator-level tests for decontamination, Gopher quality rules, and the
deterministic seeded shuffle (the oracle-gate subset covers SQL equality;
these cover tier equivalence and edge cases the testdata can't hit)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from knowledgegraphs_ray.text.decontam import decontaminate, doc_ngrams
from knowledgegraphs_ray.text.gopher import gopher_filter, repetition_stats


def test_doc_ngrams_short_and_empty_docs():
    t = pa.table({"doc_id": [1, 2, 3], "text": ["a b c d", "a b", ""]})
    out = doc_ngrams(t, n=3).to_pandas().sort_values(["doc_id", "gram"])
    # doc 1: two 3-grams; docs 2-3: too short -> none
    assert out["doc_id"].tolist() == [1, 1]
    assert sorted(out["gram"]) == ["a b c", "b c d"]


def test_doc_ngrams_distinct_per_doc():
    t = pa.table({"doc_id": [7], "text": ["x y x y x y"]})
    out = doc_ngrams(t, n=2).to_pandas()
    # 5 positional 2-grams but only 2 distinct
    assert sorted(out["gram"]) == ["x y", "y x"]


def test_decontaminate_tiers_agree():
    corpus = ray.data.from_items(
        [
            {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog"},
            {"doc_id": 2, "text": "completely unrelated words appear here now"},
            {"doc_id": 3, "text": "quick brown fox jumps too"},
        ]
    ).repartition(2)
    bench = ray.data.from_items(
        [{"doc_id": 100, "text": "a quick brown fox jumps far"}]
    )
    outs = []
    # broadcast tier; join tier with bloom pre-filter; join tier without
    for lim, pf in ((10_000, "bloom"), (0, "bloom"), (0, "none")):
        out = (
            decontaminate(corpus, bench, n=3, broadcast_limit=lim, prefilter=pf)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        outs.append(out[["doc_id", "n_contaminated", "contaminated"]])
    assert outs[0].equals(outs[1])
    assert outs[0].equals(outs[2])
    by_id = outs[0].set_index("doc_id")
    # docs 1 and 3 share 'quick brown fox' / 'brown fox jumps'; doc 2 clean
    assert by_id.loc[1, "n_contaminated"] == 2
    assert by_id.loc[3, "n_contaminated"] == 2
    assert by_id.loc[2, "n_contaminated"] == 0 and not by_id.loc[2, "contaminated"]


def test_decontaminate_remove_filters_rows():
    corpus = ray.data.from_items(
        [
            {"doc_id": 1, "text": "alpha beta gamma delta"},
            {"doc_id": 2, "text": "zeta eta theta iota"},
        ]
    )
    bench = ray.data.from_items([{"doc_id": 9, "text": "alpha beta gamma"}])
    out = decontaminate(corpus, bench, n=3, remove=True).to_pandas()
    assert out["doc_id"].tolist() == [2]


def test_repetition_stats_dup_lines_and_symbols():
    t = pa.table(
        {
            "doc_id": [1, 2],
            "text": [
                "line one\nline one\nline two",
                "good text with # symbols ... and more …",
            ],
        }
    )
    out = repetition_stats(t).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_lines"] == 3
    assert out.loc[1, "dup_line_frac"] == pytest.approx(1 / 3)
    # '#', '...', '…' each count once; 6 tokens in doc 2
    assert out.loc[2, "symbol_ratio"] == pytest.approx(3 / 6)
    assert not out.loc[2, "gopher_pass"]  # symbol ratio over threshold


def test_repetition_stats_empty_text_row():
    out = repetition_stats(pa.table({"doc_id": [5], "text": [""]})).to_pandas()
    r = out.iloc[0]
    assert r["n_tokens"] == 0 and r["mean_word_len"] == 0.0
    assert not r["gopher_pass"]


def test_gopher_filter_keeps_schema():
    ds = ray.data.from_items(
        [
            {"doc_id": 1, "text": " ".join(f"word{i}" for i in range(30)), "x": 1},
            {"doc_id": 2, "text": "tiny", "x": 2},
        ]
    )
    out = gopher_filter(ds).to_pandas()
    assert out.columns.tolist() == ["doc_id", "text", "x"]
    assert out["doc_id"].tolist() == [1]


def test_seeded_shuffle_seed_changes_permutation():
    from knowledgegraphs_ray.pipelines.training_data import seeded_shuffle

    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": np.arange(64)}))
    a = seeded_shuffle(ds, seed=1).to_pandas().sort_values("doc_id")["pos"].tolist()
    b = seeded_shuffle(ds, seed=2).to_pandas().sort_values("doc_id")["pos"].tolist()
    assert a != b
    assert sorted(a) == list(range(64)) and sorted(b) == list(range(64))
