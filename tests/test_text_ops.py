"""Unit tests for the round-3 corpus-statistics / retrieval / paragraph
operators (dedup/paragraphs.py, text/heavyhitters.py, text/bm25.py,
text/quantiles.py). The sf0.001 oracle equivalence runs in
test_oracle_gate.py; these pin the edge cases and the sketch guarantees."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray

from knowledgegraphs_ray.dedup.paragraphs import (
    dedup_paragraphs,
    dedup_paragraphs_oracle_sql,
)
from knowledgegraphs_ray.text.bm25 import bm25_topk, bm25_oracle_sql
from knowledgegraphs_ray.text.heavyhitters import (
    frequent_tokens,
    frequent_tokens_oracle_sql,
    heavy_hitters_sketch,
)
from knowledgegraphs_ray.text.quantiles import histogram_quantiles


def test_paragraph_dedup_edges():
    """Removal, ordering, empty paragraphs, all-boilerplate docs, and
    empty-text docs — exact match against the raw-string SQL oracle."""
    rows = [
        {"doc_id": 1, "text": "unique alpha\n\nCOMMON FOOTER\n\nmore alpha"},
        {"doc_id": 2, "text": "unique beta\n\nCOMMON FOOTER"},
        {"doc_id": 3, "text": "COMMON FOOTER\n\nCOMMON FOOTER"},  # all removed
        {"doc_id": 4, "text": "totally unique gamma"},
        {"doc_id": 5, "text": ""},  # dropped (empty after rebuild)
        {"doc_id": 6, "text": "x\n\n\n\ny"},  # empty para repeated -> frequent
        {"doc_id": 7, "text": "x\n\n\n\nz"},
    ]
    mine = (
        dedup_paragraphs(ray.data.from_items(rows), min_count=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows))
    gold = (
        con.execute(dedup_paragraphs_oracle_sql(min_count=2))
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(mine, gold.astype(mine.dtypes.to_dict()))
    assert set(mine.doc_id) == {1, 2, 4, 6, 7}
    assert mine.loc[mine.doc_id == 6, "text"].item() == "y"  # x and '' removed


def test_paragraph_dedup_no_frequent_is_identity():
    """min_count above every paragraph count -> all docs unchanged (and the
    empty-frequent-set path doesn't crash on the column-less frame)."""
    rows = [{"doc_id": i, "text": f"only one {i}\n\nsecond {i}"} for i in range(5)]
    out = (
        dedup_paragraphs(ray.data.from_items(rows), min_count=2)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(out.text) == [r["text"] for r in rows]
    assert (out.n_removed == 0).all()


def test_heavy_hitters_sketch_matches_exact():
    """With k large enough that total_tokens/k < min_count the MG sketch
    tier must return EXACTLY the exact tier's rows (mergeable-summary
    guarantee + exact recount pass)."""
    words = ["alpha"] * 40 + ["beta"] * 25 + ["gamma"] * 10 + [f"w{i}" for i in range(60)]
    rng = np.random.default_rng(7)
    rng.shuffle(words)
    docs = [
        {"doc_id": i, "text": " ".join(words[i * 15 : (i + 1) * 15])}
        for i in range((len(words) + 14) // 15)
    ]
    ds = ray.data.from_items(docs)
    exact = frequent_tokens(ds, min_count=10).to_pandas()
    sk = heavy_hitters_sketch(ds, k=50, min_count=10).to_pandas()
    assert set(zip(exact.token, exact.n)) == set(zip(sk.token, sk.n))
    assert {"alpha", "beta", "gamma"} <= set(exact.token)


def test_heavy_hitters_sketch_small_k_no_false_negatives():
    """Even at tiny k the guarantee holds: every token with true count >
    total/k survives with its EXACT count (recount pass)."""
    words = ["hot"] * 120 + [f"cold{i}" for i in range(80)]
    docs = [{"doc_id": i, "text": " ".join(words[i * 10 : (i + 1) * 10])} for i in range(20)]
    ds = ray.data.from_items(docs)
    sk = heavy_hitters_sketch(ds, k=4).to_pandas()  # threshold = 200//4 + 1 = 51
    assert ("hot", 120) in set(zip(sk.token, sk.n))


def test_bm25_bit_exact_vs_duckdb():
    rows = [
        {"doc_id": 1, "text": "spark shuffle join hash join"},
        {"doc_id": 2, "text": "hash table scan"},
        {"doc_id": 3, "text": "sort merge join join join"},
        {"doc_id": 4, "text": "unrelated words entirely"},
        {"doc_id": 5, "text": ""},
    ]
    mine = bm25_topk(ray.data.from_items(rows), "hash join", k=3)
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows))
    gold = con.execute(bm25_oracle_sql("hash join", k=3)).fetchdf()
    m = mine.sort_values("rank").reset_index(drop=True)
    g = gold.sort_values("rank").reset_index(drop=True)
    assert list(m.doc_id) == list(g.doc_id)
    # bit-exact, not allclose: the whole point of the fixed expression tree
    assert all(a == b for a, b in zip(m.score, g.score))
    assert m.doc_id.iloc[0] == 1  # two query-term hits outranks


def test_histogram_quantiles_matches_quantile_disc():
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 500, size=2000)
    ds = ray.data.from_pandas(pd.DataFrame({"v": vals}))
    qs = [0.25, 0.5, 0.75, 0.9, 0.99]
    mine = histogram_quantiles(ds, "v", qs)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"v": vals}))
    for q, v in zip(mine.q, mine.value):
        gold = con.execute(f"SELECT quantile_disc(v, {q}) FROM t").fetchone()[0]
        assert v == gold, (q, v, gold)


def test_corpus_ngram_overlap_tiers():
    """Exact tier: planted overlap is measured exactly and is
    parallelism-invariant; HLL tier estimates within sketch error."""
    import numpy as np
    import pandas as pd
    import ray.data

    from knowledgegraphs_ray.text.overlap import corpus_ngram_overlap

    # side A: docs 0..49; side B: 30 docs copied from A (overlap) + 20 new
    rng = np.random.default_rng(5)
    vocab = [f"tok{i}" for i in range(300)]
    def doc(r):
        return " ".join(rng.choice(vocab, size=30))
    a_texts = [doc(rng) for _ in range(50)]
    b_texts = a_texts[:30] + [doc(rng) for _ in range(20)]
    a = ray.data.from_pandas(
        pd.DataFrame({"doc_id": range(50), "text": a_texts})
    ).repartition(4)
    b = ray.data.from_pandas(
        pd.DataFrame({"doc_id": range(100, 150), "text": b_texts})
    ).repartition(3)

    res = corpus_ngram_overlap(a, b).to_pandas().iloc[0]
    assert res["n_union"] == res["n_a"] + res["n_b"] - res["n_intersect"]
    # the 30 copied docs guarantee a large planted intersection
    assert res["n_intersect"] > 0.4 * res["n_a"]
    assert res["jaccard_micro"] == res["n_intersect"] * 1_000_000 // res["n_union"]

    # parallelism invariance
    res2 = corpus_ngram_overlap(a.repartition(9), b.repartition(1)).to_pandas().iloc[0]
    assert tuple(res) == tuple(res2)

    # HLL tier within ~3x the p=14 sketch error (1.04/sqrt(2^14) ~ 0.8%)
    est = corpus_ngram_overlap(a, b, exact=False, hll_p=14).to_pandas().iloc[0]
    for col in ("n_a", "n_b", "n_union"):
        assert abs(est[col] - res[col]) / res[col] < 0.03
