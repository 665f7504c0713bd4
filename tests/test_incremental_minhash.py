"""dedup/incremental_minhash.py — MinHash-LSH probe against a persisted
band index.

Checks: (1) the probe finds exactly the cross-side pairs that a full
minhash run over history ∪ shard finds (restricted to cross pairs, same
threshold — the probe IS that restriction computed without re-sketching
history), (2) save/load roundtrip of the index yields identical pairs,
(3) block-boundary invariance (same pairs at different partitionings),
(4) shard-internal near-dups are NOT emitted (composition contract), (5)
empty probe result and empty shard behave."""

import numpy as np
import pandas as pd
import ray.data

from knowledgegraphs_ray.dedup.incremental_minhash import (
    build_minhash_index,
    load_minhash_index,
    probe_minhash_index,
    save_minhash_index,
)
from knowledgegraphs_ray.dedup.minhash import minhash_candidate_pairs


def _corpus() -> pd.DataFrame:
    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(200)]
    rows = []
    # 30 base docs (even ids = history), each with an odd-id near-copy that
    # differs by one appended token, plus odd-id fresh docs with no match.
    for i in range(30):
        toks = list(rng.choice(words, size=40))
        rows.append({"doc_id": 2 * i, "text": " ".join(toks)})
        rows.append({"doc_id": 2 * i + 1, "text": " ".join(toks + ["extra"])})
    for i in range(20):
        toks = list(rng.choice(words, size=40))
        rows.append({"doc_id": 201 + 2 * i, "text": " ".join(toks) + " unique tail"})
    # two odd-id docs that are near-dups of EACH OTHER but of nothing even:
    # must never appear in the probe output.
    toks = list(rng.choice(words, size=40))
    rows.append({"doc_id": 301, "text": " ".join(toks)})
    rows.append({"doc_id": 303, "text": " ".join(toks + ["tail"])})
    return pd.DataFrame(rows)


def _split(df: pd.DataFrame, parts: int = 3):
    hist = ray.data.from_pandas(df[df.doc_id % 2 == 0]).repartition(parts)
    new = ray.data.from_pandas(df[df.doc_id % 2 == 1]).repartition(parts)
    return hist, new


def _pairs(df: pd.DataFrame) -> set[tuple[int, int]]:
    return set(zip(df["new_doc"].astype(int), df["hist_doc"].astype(int)))


def _probe(hist, new, **kw) -> pd.DataFrame:
    idx = build_minhash_index(hist, n_perm=64, n_bands=16)
    return probe_minhash_index(idx, new, threshold=0.5, **kw).to_pandas()


def test_probe_equals_full_run_cross_pairs():
    df = _corpus()
    hist, new = _split(df)
    got = _probe(hist, new)
    assert len(got) > 0

    full = minhash_candidate_pairs(
        ray.data.from_pandas(df).repartition(3),
        threshold=0.5,
        n_perm=64,
        n_bands=16,
    ).to_pandas()
    cross = set()
    for a, b, est in zip(full.doc_a.astype(int), full.doc_b.astype(int), full.est_jaccard):
        if a % 2 != b % 2:
            new_d, hist_d = (a, b) if a % 2 == 1 else (b, a)
            cross.add((new_d, hist_d))
    assert _pairs(got) == cross
    # every planted (2i, 2i+1) near-copy is found
    found_new = {n for n, _ in _pairs(got)}
    assert {2 * i + 1 for i in range(30)} <= found_new


def test_no_shard_internal_pairs():
    df = _corpus()
    hist, new = _split(df)
    got = _probe(hist, new)
    assert got["new_doc"].mod(2).eq(1).all()
    assert got["hist_doc"].mod(2).eq(0).all()
    assert 301 not in set(got["new_doc"]) and 303 not in set(got["new_doc"])


def test_save_load_roundtrip(tmp_path):
    df = _corpus()
    hist, new = _split(df)
    idx = build_minhash_index(hist, n_perm=64, n_bands=16)
    direct = probe_minhash_index(idx, new, threshold=0.5).to_pandas()

    root = str(tmp_path / "mh_index")
    save_minhash_index(idx, root)
    loaded = load_minhash_index(root)
    assert loaded.n_perm == 64 and loaded.n_bands == 16
    reloaded = probe_minhash_index(loaded, new, threshold=0.5).to_pandas()
    assert _pairs(direct) == _pairs(reloaded)
    a = direct.sort_values(["new_doc", "hist_doc"]).est_jaccard.to_numpy()
    b = reloaded.sort_values(["new_doc", "hist_doc"]).est_jaccard.to_numpy()
    assert np.array_equal(a, b)


def test_partitioning_invariance():
    df = _corpus()
    p1 = _probe(*_split(df, parts=1))
    p7 = _probe(*_split(df, parts=7), num_partitions=3)
    assert _pairs(p1) == _pairs(p7)


def test_empty_cases():
    df = _corpus()
    hist, new = _split(df)
    # shard with nothing near history -> zero rows, stable schema
    fresh = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [9001, 9003], "text": ["zz qq aa", "bb cc dd"]})
    )
    idx = build_minhash_index(hist, n_perm=64, n_bands=16)
    out = probe_minhash_index(idx, fresh, threshold=0.99)
    # Ray's to_pandas drops columns on an all-empty dataset; the schema is
    # the stable contract.
    assert out.schema().names == ["new_doc", "hist_doc", "est_jaccard"]
    assert out.count() == 0


def test_broadcast_and_join_tiers_identical():
    """The broadcast semi-filter tier (default) and the full-join fallback
    (limits forced to 0) emit the identical pair set."""
    import ray.data

    from knowledgegraphs_ray.dedup.incremental_minhash import (
        build_minhash_index,
        probe_minhash_index,
    )

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    hist = docs.map_batches(
        lambda df: df[df["doc_id"] % 2 == 0], batch_format="pandas"
    )
    new = docs.map_batches(
        lambda df: df[df["doc_id"] % 2 == 1], batch_format="pandas"
    )
    index = build_minhash_index(hist)
    # default = driver tier (pandas merge + gathered-signature verify)
    a = probe_minhash_index(index, new, threshold=0.6).to_pandas()
    # full-join fallback: no key-set broadcast, no id semi-filter
    b = probe_minhash_index(
        build_minhash_index(hist), new, threshold=0.6,
        band_broadcast_limit=0, id_broadcast_limit=0,
    ).to_pandas()
    # key-set broadcast + join-tier candidates/verify (driver merge off)
    c = probe_minhash_index(
        build_minhash_index(hist), new, threshold=0.6,
        hist_collision_limit=0,
    ).to_pandas()
    # driver merge for candidates, join-tier verify (pair broadcast off)
    d = probe_minhash_index(
        build_minhash_index(hist), new, threshold=0.6,
        verify_broadcast_limit=0,
    ).to_pandas()
    key = lambda df: sorted(
        map(tuple, df[["new_doc", "hist_doc", "est_jaccard"]].values)
    )
    assert key(a) == key(b) == key(c) == key(d)
    assert len(a) > 0  # the gate corpus has cross near-dups at 0.6


def test_ingest_job_semantics(tmp_path):
    """jobs/ingest_job.ingest_shard: accepted shards contain no exact
    cross-shard duplicates and no near-duplicates of earlier shards; the
    persisted index grows with each shard."""
    import sys

    import numpy as np
    import pandas as pd
    import ray.data

    sys.path.insert(0, "/root/repo")
    from jobs.ingest_job import ingest_shard

    from knowledgegraphs_ray.dedup.incremental_minhash import (
        build_minhash_index,
        probe_minhash_index,
    )

    rng = np.random.default_rng(4)
    vocab = [f"w{i}" for i in range(400)]
    base = [" ".join(rng.choice(vocab, size=40)) for _ in range(30)]
    # shard 0: 30 originals; shard 1: 10 exact copies + 5 near-copies
    # (one token changed) + 10 fresh
    near = [t.replace(t.split()[0], "zzz", 1) for t in base[10:15]]
    fresh = [" ".join(rng.choice(vocab, size=40)) for _ in range(10)]
    s0 = pd.DataFrame({"doc_id": range(30), "text": base})
    s1 = pd.DataFrame(
        {"doc_id": range(100, 125), "text": base[:10] + near + fresh}
    )
    root = str(tmp_path / "ingest")

    c0 = ingest_shard(
        ray.data.from_pandas(s0).repartition(3), root, 0,
        threshold=0.7, have_history=False,
    )
    assert c0["accepted"] == 30
    c1 = ingest_shard(
        ray.data.from_pandas(s1).repartition(2), root, 1,
        threshold=0.7, have_history=True,
    )
    # the 10 exact copies die in the exact gate, the 5 near-copies in the
    # fuzzy gate, the 10 fresh docs land
    assert c1["exact_dropped"] == 10
    assert c1["neardup_dropped"] == 5
    assert c1["accepted"] == 10

    # accepted corpus itself contains no cross near-dups at the threshold
    acc = ray.data.read_parquet(f"{root}/accepted")
    assert acc.count() == 40
    idx = build_minhash_index(
        ray.data.from_pandas(s0), n_perm=128, n_bands=16
    )
    hits = probe_minhash_index(
        idx,
        ray.data.read_parquet(f"{root}/accepted/shard=1"),
        threshold=0.7,
    )
    assert hits.count() == 0
