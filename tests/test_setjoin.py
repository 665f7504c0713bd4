"""Exact set-similarity join (dedup/setjoin.py): prefix-filter
completeness vs the brute-force DuckDB twin, hand-checked Jaccard values,
threshold edges, the hot-token guard, and parallelism invariance."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray

from knowledgegraphs_ray.dedup.setjoin import (
    set_similarity_join,
    set_similarity_oracle_sql,
)


def _run(df, t, nparts=5, **kw):
    return (
        set_similarity_join(
            ray.data.from_pandas(df).repartition(nparts),
            threshold_micro=t,
            **kw,
        )
        .to_pandas()
        .sort_values(["u", "v"])
        .reset_index(drop=True)
    )


def _want(df, t):
    con = duckdb.connect()
    con.register("documents", df)
    return (
        con.execute(set_similarity_oracle_sql(threshold_micro=t))
        .df()
        .sort_values(["u", "v"])
        .reset_index(drop=True)
    )


def test_setjoin_hand_checked():
    df = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype="int64"),
            "text": ["a b c d", "a b c d", "a b c x", "p q"],
        }
    )
    out = _run(df, 600_000)
    rows = {(r.u, r.v): (r.inter, r.jac_micro) for r in out.itertuples()}
    assert rows[(0, 1)] == (4, 1_000_000)  # identical sets
    assert rows[(0, 2)] == (3, 600_000)  # 3/5
    assert rows[(1, 2)] == (3, 600_000)
    assert len(rows) == 3  # 'p q' matches nothing


def test_setjoin_exact_duplicates_only_at_threshold_one():
    df = pd.DataFrame(
        {
            "doc_id": np.arange(3, dtype="int64"),
            "text": ["a b c", "c b a a", "a b c d"],
        }
    )
    out = _run(df, 1_000_000)
    # duplicate tokens collapse (distinct-set semantics): docs 0 and 1 equal
    assert [(r.u, r.v) for r in out.itertuples()] == [(0, 1)]


def test_setjoin_matches_bruteforce_twin():
    rng = np.random.default_rng(17)
    words = np.array([f"w{i}" for i in range(50)])
    base = [
        " ".join(rng.choice(words, rng.integers(4, 14), replace=False))
        for _ in range(120)
    ]
    texts = list(base)
    for i in range(0, 40, 2):  # planted near-dups
        toks = base[i].split()
        toks[-1] = "w777"
        texts.append(" ".join(toks))
    df = pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype="int64"), "text": texts}
    )
    for t in (500_000, 750_000):
        want = _want(df, t)
        got1 = _run(df, t, nparts=1)
        got8 = _run(df, t, nparts=8)
        pd.testing.assert_frame_equal(got1, want, check_dtype=False)
        pd.testing.assert_frame_equal(got8, want, check_dtype=False)
    assert len(_want(df, 750_000)) > 0


def test_setjoin_hot_token_guard():
    df = pd.DataFrame(
        {
            "doc_id": np.arange(30, dtype="int64"),
            "text": ["common"] * 30,  # every prefix = {common}
        }
    )
    with pytest.raises(RuntimeError, match="max_token_group"):
        _run(df, 500_000, max_token_group=5)


def test_setjoin_vocab_limit_fail_fast():
    df = pd.DataFrame(
        {"doc_id": np.arange(3, dtype="int64"), "text": ["a b", "c d", "e f"]}
    )
    with pytest.raises(RuntimeError, match="vocab_limit"):
        _run(df, 500_000, vocab_limit=2)


def test_setjoin_empty_and_no_pairs():
    df = pd.DataFrame({"doc_id": np.arange(2, dtype="int64"), "text": ["a", "b"]})
    ds = set_similarity_join(
        ray.data.from_pandas(df).repartition(5), threshold_micro=500_000
    )
    assert ds.count() == 0
    # the Dataset keeps its schema even at 0 rows (to_pandas drops columns
    # on empty datasets in this Ray version, so assert on the schema)
    assert ds.schema().names == [
        "u",
        "v",
        "inter",
        "size_u",
        "size_v",
        "jac_micro",
    ]


def test_setjoin_shingle_tier_matches_oracle():
    # 3-token shingle sets vs the shingle-CTE twin; tiny vocabulary makes
    # unigrams useless (every token hot) while shingles separate the docs
    rng = np.random.default_rng(3)
    words = np.array(list("abcdefgh"))
    texts = []
    base = " ".join(words[rng.integers(0, 8, 30)])
    for i in range(20):
        if i % 4 == 0:
            texts.append(base + f" z{i}")  # near-dups of the base
        else:
            texts.append(" ".join(words[rng.integers(0, 8, 30)]))
    df = pd.DataFrame({"doc_id": np.arange(20, dtype="int64"), "text": texts})
    got = _run(df, 700_000, shingle_k=3)
    con = duckdb.connect()
    con.register("documents", df)
    want = (
        con.execute(set_similarity_oracle_sql(threshold_micro=700_000, shingle_k=3))
        .df()
        .sort_values(["u", "v"])
        .reset_index(drop=True)
    )
    assert len(want) > 0
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_setjoin_shingle_short_docs_excluded():
    # docs with < k tokens have an empty shingle set on BOTH sides
    df = pd.DataFrame(
        {
            "doc_id": np.arange(3, dtype="int64"),
            "text": ["a b", "a b c d e", "a b c d e"],
        }
    )
    got = _run(df, 900_000, shingle_k=3)
    assert got[["u", "v"]].values.tolist() == [[1, 2]]


def test_auto_shingle_escalates_on_tiny_vocab():
    """Degeneracy steering (r5): a tiny-vocabulary corpus (every unigram
    corpus-hot) must escalate k BEFORE candidate generation, and the
    auto result must equal the explicitly-pinned k's result."""
    from knowledgegraphs_ray.dedup.setjoin import choose_shingle_k

    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(8)]  # 8 distinct unigrams only
    texts = [
        " ".join(rng.choice(vocab, size=20)) for _ in range(300)
    ]
    texts[50] = texts[10]  # planted duplicates: non-empty output at any k
    texts[51] = texts[11]
    df = pd.DataFrame({"doc_id": np.arange(300, dtype="int64"), "text": texts})
    ds = ray.data.from_pandas(df).repartition(4)
    k = choose_shingle_k(ds, auto_candidate_limit=5_000)
    assert k > 1, "unigram prefixes are degenerate here; k must escalate"
    auto = _run(df, 700_000, shingle_k="auto", auto_candidate_limit=5_000)
    pinned = _run(df, 700_000, shingle_k=k)
    assert len(auto) >= 2
    pd.testing.assert_frame_equal(auto, pinned)


def test_auto_shingle_keeps_unigrams_on_healthy_vocab():
    rng = np.random.default_rng(11)
    vocab = [f"tok{i:04d}" for i in range(3000)]
    texts = [" ".join(rng.choice(vocab, size=15)) for _ in range(200)]
    df = pd.DataFrame({"doc_id": np.arange(200, dtype="int64"), "text": texts})
    from knowledgegraphs_ray.dedup.setjoin import choose_shingle_k

    assert choose_shingle_k(ray.data.from_pandas(df).repartition(4)) == 1


def test_auto_shingle_raises_on_near_identical_corpus():
    # every doc identical: prefixes collide at EVERY k -> minhash remedy
    df = pd.DataFrame(
        {
            "doc_id": np.arange(80, dtype="int64"),
            "text": ["a b c d e f g h i j k l"] * 80,
        }
    )
    from knowledgegraphs_ray.dedup.setjoin import choose_shingle_k

    with pytest.raises(RuntimeError, match="minhash"):
        choose_shingle_k(
            ray.data.from_pandas(df).repartition(4), auto_candidate_limit=100
        )
