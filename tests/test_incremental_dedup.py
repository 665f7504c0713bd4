"""dedup/incremental.py — cross-corpus novelty filter.

Checks: (1) broadcast and bloom tiers return identical rows, (2) the bloom
tier never drops a novel row (no false negatives through the verify join),
(3) duplicate values in the history don't multiply shard rows, (4)
verify=False under-keeps only (subset of the exact answer, dupes never
leak), (5) shard-internal duplicates are retained, (6) empty history and
empty shard."""

import pandas as pd
import pyarrow as pa
import ray.data

from knowledgegraphs_ray.dedup.incremental import novel_rows


def _ds(rows):
    return ray.data.from_pandas(pd.DataFrame(rows)).repartition(3)


SEEN = _ds(
    [{"sid": i, "text": f"seen doc {i % 40}"} for i in range(120)]  # heavy dups
)
NEW = _ds(
    [{"doc_id": i, "text": f"seen doc {i}"} for i in range(0, 50)]  # 0..39 seen
    + [{"doc_id": 100 + i, "text": f"fresh doc {i}"} for i in range(30)]
    + [{"doc_id": 200, "text": "fresh doc 0"}]  # intra-shard dup, still novel
)
EXPECT_IDS = sorted(list(range(40, 50)) + list(range(100, 130)) + [200])


def _run(**kw):
    out = novel_rows(NEW, SEEN, column="text", **kw).to_pandas()
    return sorted(out["doc_id"].tolist())


def test_tiers_agree_and_exact():
    broadcast = _run(broadcast_limit=10_000)
    bloom = _run(broadcast_limit=0)
    assert broadcast == EXPECT_IDS
    assert bloom == EXPECT_IDS


def test_schema_preserved_through_bloom_tier():
    out = novel_rows(NEW, SEEN, column="text", broadcast_limit=0)
    sch = out.schema()
    assert sch.names == ["doc_id", "text"]
    assert sch.base_schema.field("doc_id").type == pa.int64()


def test_verify_false_subset_no_dupe_leaks():
    approx = _run(broadcast_limit=0, verify=False, fp_rate=1e-4)
    assert set(approx) <= set(EXPECT_IDS)  # only novel rows ever pass
    # at p=1e-4 over 41 novel rows, a drop is ~0.4% likely — treat >1 as fail
    assert len(approx) >= len(EXPECT_IDS) - 1


def test_different_key_names():
    seen = _ds([{"payload": "x"}, {"payload": "y"}])
    new = _ds([{"doc_id": 1, "text": "x"}, {"doc_id": 2, "text": "z"}])
    for lim in (10_000, 0):
        out = novel_rows(
            new, seen, column="text", seen_column="payload", broadcast_limit=lim
        ).to_pandas()
        assert out["doc_id"].tolist() == [2]


def test_empty_history_and_empty_shard():
    empty = _ds([{"sid": 0, "text": "a"}]).filter(lambda r: False)
    out = novel_rows(NEW, empty, column="text", broadcast_limit=10_000).to_pandas()
    assert len(out) == NEW.count()
    out2 = novel_rows(
        NEW.filter(lambda r: False), SEEN, column="text", broadcast_limit=0
    ).to_pandas()
    assert len(out2) == 0


def test_verify_prefilter_tiers_identical():
    """The hash-prefiltered verify join (default) and the full-join
    fallback (verify_broadcast_limit=0) keep the identical novel rows."""
    import ray.data

    from knowledgegraphs_ray.dedup.incremental import novel_rows

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    seen = docs.map_batches(
        lambda df: df[df["doc_id"] % 2 == 1], batch_format="pandas"
    )
    new = docs.map_batches(
        lambda df: df[df["doc_id"] % 2 == 0], batch_format="pandas"
    )
    a = novel_rows(new, seen, column="text", broadcast_limit=0).to_pandas()
    b = novel_rows(
        new, seen, column="text", broadcast_limit=0, verify_broadcast_limit=0
    ).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    assert len(a) > 0
