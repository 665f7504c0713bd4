"""Tests for the near-duplicate family: MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine — recall vs exact oracles on synthetic corpora."""

import numpy as np
import pandas as pd
import ray.data

from knowledgegraphs_ray.dedup.embed import embedding_near_dup_pairs
from knowledgegraphs_ray.dedup.minhash import (
    components_by_propagation,
    components_from_pairs,
    minhash_candidate_pairs,
)
from knowledgegraphs_ray.dedup.ngram import ngram_jaccard_pairs
from knowledgegraphs_ray.dedup.simhash import hamming, simhash_batch, simhash_near_dup_pairs


def _corpus():
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": base},  # exact dup
        {"doc_id": 2, "text": base.replace("today", "tomorrow")},  # near dup
        {"doc_id": 3, "text": "completely different content about databases and queries"},
        {"doc_id": 4, "text": base.replace("quick", "slow").replace("lazy", "busy")},
    ]
    return ray.data.from_items(rows)


def test_minhash_finds_near_dups():
    pairs = minhash_candidate_pairs(_corpus(), threshold=0.5).to_pandas()
    got = {tuple(sorted((a, b))) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    assert (0, 1) in got  # exact dup always caught
    assert (0, 2) in got  # near dup
    assert all(3 not in p for p in got)  # distinct doc never pairs


def test_minhash_deterministic_across_parallelism():
    a = minhash_candidate_pairs(_corpus().repartition(1), threshold=0.5).to_pandas()
    b = minhash_candidate_pairs(_corpus().repartition(4), threshold=0.5).to_pandas()
    key = lambda df: set(zip(df["doc_a"], df["doc_b"]))
    assert key(a) == key(b)


def test_components_union_find_and_propagation_agree():
    pairs = minhash_candidate_pairs(_corpus(), threshold=0.5)
    uf = components_from_pairs(pairs)
    lp = components_by_propagation(pairs).to_pandas()
    uf_map = dict(zip(uf["doc_id"], uf["component"]))
    lp_map = dict(zip(lp["node"], lp["label"]))
    assert uf_map == lp_map
    assert uf_map[0] == uf_map[1] == uf_map[2] == 0


def test_simhash_identical_and_distance():
    import pyarrow as pa

    b = pa.table(
        {
            "doc_id": [0, 1, 2],
            "text": ["alpha beta gamma", "alpha beta gamma", "zz yy xx ww vv"],
        }
    )
    fp = simhash_batch(b)["simhash"].to_numpy().astype(np.uint64)
    assert fp[0] == fp[1]
    assert hamming(np.array([fp[0]]), fp[2])[0] > 10


def test_simhash_pairs_pipeline():
    out = simhash_near_dup_pairs(_corpus(), max_distance=6).to_pandas()
    got = {tuple(sorted((a, b))) for a, b in zip(out["doc_a"], out["doc_b"])}
    assert (0, 1) in got
    assert all(out["distance"] >= 0)


def test_ngram_jaccard_integer_exact():
    out = ngram_jaccard_pairs(_corpus(), threshold_pct=60).to_pandas()
    got = {tuple(sorted((a, b))): (i, u) for a, b, i, u in
           zip(out["doc_a"], out["doc_b"], out["n_inter"], out["n_union"])}
    assert (0, 1) in got
    i, u = got[(0, 1)]
    assert i == u  # identical token sets


def test_embedding_near_dups():
    rng = np.random.default_rng(1)
    base = rng.standard_normal(16)
    rows = []
    for i in range(3):  # three copies of the same direction
        rows.append({"vec_id": i, "embedding": (base * (1 + 0.001 * i)).tolist()})
    for i in range(3, 10):  # random others
        rows.append({"vec_id": i, "embedding": rng.standard_normal(16).tolist()})
    ds = ray.data.from_items(rows)
    out = embedding_near_dup_pairs(ds, dim=16, threshold=0.99).to_pandas()
    got = {tuple(sorted((a, b))) for a, b in zip(out["doc_a"], out["doc_b"])}
    assert {(0, 1), (0, 2), (1, 2)} <= got


def test_minhash_pair_splits_invariant():
    """The bounded shuffle-key count is a pure parallelism knob: pairs must
    be identical at any power-of-two ``pair_splits`` (buckets share
    band_hash, so they never straddle splits)."""
    auto = minhash_candidate_pairs(_corpus(), threshold=0.5).to_pandas()
    one = minhash_candidate_pairs(
        _corpus(), threshold=0.5, pair_splits=1
    ).to_pandas()
    wide = minhash_candidate_pairs(
        _corpus(), threshold=0.5, pair_splits=4096
    ).to_pandas()
    key = lambda df: set(zip(df["doc_a"], df["doc_b"]))
    assert key(auto) == key(one) == key(wide)
    assert key(auto)  # non-trivial


def test_minhash_join_verify_matches_broadcast():
    """verify_strategy='join' (distributed hash-join signature delivery, the
    100 TB tier) must produce exactly the broadcast tier's verified pairs,
    including est_jaccard values."""
    bc = minhash_candidate_pairs(
        _corpus(), threshold=0.5, verify_strategy="broadcast"
    ).to_pandas()
    jn = minhash_candidate_pairs(
        _corpus(), threshold=0.5, verify_strategy="join"
    ).to_pandas()
    key = lambda df: {
        (a, b): round(e, 12)
        for a, b, e in zip(df["doc_a"], df["doc_b"], df["est_jaccard"])
    }
    assert key(bc) == key(jn)
    assert key(bc)  # non-trivial

    # auto tier flips to join at the limit
    auto = minhash_candidate_pairs(
        _corpus(), threshold=0.5, verify_driver_limit=0
    ).to_pandas()
    assert key(auto) == key(bc)


def test_minhash_bucket_cap_and_size_classes():
    """Pin the vectorized pair emission (256-way bucket split + size-class
    reshape) against the per-bucket semantics it replaced: clusters of
    identical docs at several sizes -> triu pairs per cluster, truncated to
    the first ``max_bucket`` members by doc_id. Exercises multiple size
    classes (2, 3, capped-4) inside one pairs_block call."""
    import itertools

    clusters = {
        "alpha beta gamma delta epsilon zeta eta theta one": [0, 1],
        "iota kappa lambda mu nu xi omicron pi two": [10, 11, 12],
        "rho sigma tau upsilon phi chi psi omega three": [20, 21, 22, 23, 24, 25],
    }
    rows = [{"doc_id": d, "text": t} for t, ids in clusters.items() for d in ids]
    rows.append(
        {"doc_id": 99, "text": "completely different filler text about engines"}
    )
    pairs = minhash_candidate_pairs(
        ray.data.from_items(rows), threshold=0.5, max_bucket=4
    ).to_pandas()
    got = set(zip(pairs["doc_a"], pairs["doc_b"]))
    want = set()
    for ids in clusters.values():
        want |= set(itertools.combinations(sorted(ids)[:4], 2))
    assert got == want
    assert (pairs["est_jaccard"] == 1.0).all()


def test_propagation_raises_on_non_convergence():
    """A pair-graph chain longer than max_iter rounds must RAISE, not return
    silently under-merged labels (ADVICE r2)."""
    import pytest

    chain = ray.data.from_items(
        [{"doc_a": i, "doc_b": i + 1} for i in range(12)]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        components_by_propagation(chain, max_iter=2)
    ok = components_by_propagation(chain, max_iter=16).to_pandas()
    assert set(ok["label"]) == {0}  # one chain, representative 0


def test_propagation_matches_union_find_on_random_graph():
    """Distributed label propagation (hash-join rounds, no driver collect)
    agrees with exact union-find on a multi-component random graph spread
    over many blocks."""
    from knowledgegraphs_ray.canon.unionfind import UnionFind

    rng = np.random.default_rng(3)
    # three disjoint random components of 20 nodes each — random graphs have
    # O(log n) diameter, so propagation converges in a few rounds
    parts = []
    for base in (0, 20, 40):
        a = rng.integers(base, base + 20, 40)
        b = rng.integers(base, base + 20, 40)
        keep = a != b
        parts.append(pd.DataFrame({"doc_a": a[keep], "doc_b": b[keep]}))
    df = pd.concat(parts, ignore_index=True).astype("int64")
    a, b = df["doc_a"].to_numpy(), df["doc_b"].to_numpy()
    pairs = ray.data.from_pandas(df).repartition(5)

    lp = components_by_propagation(pairs).to_pandas()
    uf = UnionFind()
    for x, y in zip(a.tolist(), b.tolist()):
        uf.union(x, y)
    # same partition: min-label representative per component
    comp_of = {x: uf.find(x) for x in set(a.tolist()) | set(b.tolist())}
    rep_min: dict = {}
    for x, c in comp_of.items():
        rep_min[c] = min(rep_min.get(c, x), x)
    expect = {x: rep_min[c] for x, c in comp_of.items()}
    got = dict(zip(lp["node"], lp["label"]))
    assert got == expect


def test_exact_cosine_pairs_vs_numpy_and_lsh_recall():
    """Tiled all-pairs == numpy brute force; the LSH near-dup pass recalls
    planted near-identical pairs that the exact pass confirms."""
    import numpy as np

    from knowledgegraphs_ray.sim.allpairs import exact_cosine_pairs

    rng = np.random.default_rng(9)
    base = rng.standard_normal((40, 16))
    # plant 5 near-identical pairs: vec 100+i ~ vec i
    planted = base[:5] + rng.standard_normal((5, 16)) * 0.01
    mat = np.vstack([base, planted])
    ids = np.concatenate([np.arange(40), np.arange(100, 105)])
    ds = ray.data.from_items(
        [
            {"vec_id": int(i), "embedding": v.tolist()}
            for i, v in zip(ids, mat)
        ]
    ).repartition(4)

    got = exact_cosine_pairs(ds, threshold=0.95).to_pandas()
    got_pairs = set(zip(got["doc_a"], got["doc_b"]))

    m = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = m @ m.T
    iu, ju = np.triu_indices(len(ids), k=1)
    keep = sims[iu, ju] >= 0.95
    expect = {
        (min(a, b), max(a, b)) for a, b in zip(ids[iu[keep]], ids[ju[keep]])
    }
    assert got_pairs == expect
    assert {(i, 100 + i) for i in range(5)} <= got_pairs

    lsh = embedding_near_dup_pairs(ds, dim=16, threshold=0.95).to_pandas()
    lsh_pairs = set(zip(lsh["doc_a"], lsh["doc_b"]))
    # LSH is approximate but must recall most planted near-identical pairs...
    assert len(lsh_pairs & expect) >= 4
    # ...and never emit a pair the exact pass rejects (verification is exact)
    assert lsh_pairs <= expect


def test_resolve_duplicates_policies_and_tiers():
    """resolve_duplicates: both keep policies, broadcast vs anti-join tier
    agree, survivors are exactly corpus minus non-canonical members."""
    import pandas as pd
    import ray

    from knowledgegraphs_ray.dedup.resolve import resolve_duplicates

    corpus = ray.data.from_items(
        [
            {"doc_id": 1, "text": "aa"},
            {"doc_id": 2, "text": "aaaa"},   # longest of {1,2,5}
            {"doc_id": 5, "text": "aaa"},
            {"doc_id": 7, "text": "bb"},
            {"doc_id": 8, "text": "bb"},     # tie with 7 -> smaller id wins
            {"doc_id": 9, "text": "solo"},
        ]
    ).repartition(3)
    comp = pd.DataFrame(
        {"doc_id": [1, 2, 5, 7, 8], "component": [1, 1, 1, 7, 7]}
    )

    min_id = resolve_duplicates(corpus, comp, keep="min_id").to_pandas()
    assert sorted(min_id["doc_id"]) == [1, 7, 9]

    longest = resolve_duplicates(corpus, comp, keep="longest").to_pandas()
    assert sorted(longest["doc_id"]) == [2, 7, 9]

    # anti-join tier (forced with broadcast_limit=0) must agree exactly
    joined = resolve_duplicates(
        corpus, comp, keep="longest", broadcast_limit=0
    ).to_pandas()
    assert sorted(joined["doc_id"]) == [2, 7, 9]
    assert set(joined.columns) == {"doc_id", "text"}

    # empty components -> corpus unchanged
    same = resolve_duplicates(
        corpus, pd.DataFrame({"doc_id": [], "component": []})
    ).to_pandas()
    assert sorted(same["doc_id"]) == [1, 2, 5, 7, 8, 9]


def test_resolve_best_score_policy():
    """keep='best_score': survivor is the highest-score member, ties ->
    smaller id; agrees with keep='longest' when score == text length."""
    import pandas as pd
    import ray

    from knowledgegraphs_ray.dedup.resolve import resolve_duplicates

    corpus = ray.data.from_items(
        [
            {"doc_id": 1, "text": "aa", "score": 10},
            {"doc_id": 2, "text": "aaaa", "score": 3},   # longest but low score
            {"doc_id": 5, "text": "aaa", "score": 10},   # ties 1 -> 1 wins
            {"doc_id": 7, "text": "bb", "score": 1},
            {"doc_id": 8, "text": "bb", "score": 2},     # best of {7,8}
            {"doc_id": 9, "text": "solo", "score": 0},
        ]
    ).repartition(3)
    comp = pd.DataFrame(
        {"doc_id": [1, 2, 5, 7, 8], "component": [1, 1, 1, 7, 7]}
    )

    best = resolve_duplicates(
        corpus, comp, keep="best_score", score_col="score"
    ).to_pandas()
    assert sorted(best["doc_id"]) == [1, 8, 9]

    # score = utf8 length reproduces keep='longest'
    with_len = corpus.map_batches(
        lambda df: df.assign(score=df["text"].str.len()), batch_format="pandas"
    )
    as_longest = resolve_duplicates(
        with_len, comp, keep="best_score", score_col="score"
    ).to_pandas()
    assert sorted(as_longest["doc_id"]) == [2, 7, 9]
