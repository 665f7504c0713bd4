"""Hot-bucket truncation recovery (r3 verdict item 3).

Forces a bucket over ``max_bucket`` whose truncation drops one member of a
true near-dup pair. The old first-collision rule (``dedup="local"``)
provably loses the pair; the exchange tier recovers it from a later
band/table where both members survive, and emits each pair exactly once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from knowledgegraphs_ray.dedup.embed import embedding_pairs_from_buckets
from knowledgegraphs_ray.dedup.simhash import simhash_pairs_from_fingerprints


def _simhash_fps():
    # n_bands=4 (max_distance=3), width=16. All four docs share band-0 bits
    # (0x0001) -> one hot band-0 bucket. With max_bucket=2 the sort-by-id
    # truncation keeps docs {1,2} and drops {3,4} there. Docs 3 and 4 differ
    # by ONE bit in band 3 (distance 1): their first colliding band is 0
    # (truncated), but they also collide in bands 1 and 2, alone together.
    fp3 = (0x0000_0007_0003_0001) | (0x1111 << 48)
    fp4 = fp3 ^ (1 << 48)  # one bit inside band 3
    fp1 = 0x0000_0000_0000_0001  # far from 3/4, differs from fp2 by >3 bits
    fp2 = 0xFFFF_FFFF_FFFF_0001  # shares only band 0 with everyone
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": np.array([1, 2, 3, 4], dtype=np.int64),
                "simhash": np.array([fp1, fp2, fp3, fp4], dtype=np.uint64),
            }
        )
    )


def test_simhash_local_drops_truncated_pair():
    out = simhash_pairs_from_fingerprints(
        _simhash_fps(), max_distance=3, max_bucket=2, dedup="local"
    ).to_pandas()
    assert len(out) == 0  # (3,4)'s first-collision bucket truncated them out


def test_simhash_exchange_recovers_truncated_pair():
    out = simhash_pairs_from_fingerprints(
        _simhash_fps(), max_distance=3, max_bucket=2, dedup="exchange"
    ).to_pandas()
    assert len(out) == 1  # recovered from band 1/2, distinct to ONE row
    row = out.iloc[0]
    assert (row.doc_a, row.doc_b, row.distance) == (3, 4, 1)


def test_simhash_exchange_matches_local_when_unTruncated():
    # No bucket over the cap -> both tiers produce the identical pair set.
    loc = simhash_pairs_from_fingerprints(
        _simhash_fps(), max_distance=3, max_bucket=10, dedup="local"
    ).to_pandas()
    exc = simhash_pairs_from_fingerprints(
        _simhash_fps(), max_distance=3, max_bucket=10, dedup="exchange"
    ).to_pandas()
    key = ["doc_a", "doc_b", "distance"]
    assert sorted(map(tuple, loc[key].to_numpy())) == sorted(
        map(tuple, exc[key].to_numpy())
    )
    assert len(exc) == len(exc.drop_duplicates(["doc_a", "doc_b"]))


def _embed_buckets():
    # 2 tables. Table 0: all four vectors share bucket 5 (hot). Table 1:
    # vectors 3,4 alone in bucket 7; 1 and 2 in singleton buckets.
    # v3 == v4 (cosine 1.0); v1, v2 orthogonal to them and to each other.
    e = np.eye(4)
    v = {1: e[0], 2: e[1], 3: e[2], 4: e[3].copy()}
    v[4] = v[3]  # exact duplicate pair (3,4)
    sigs = {1: [5, 8], 2: [5, 9], 3: [5, 7], 4: [5, 7]}
    rows = []
    for t in range(2):
        for i in (1, 2, 3, 4):
            rows.append(
                {
                    "table_id": t,
                    "bucket": sigs[i][t],
                    "vec_id": i,
                    "vec": v[i],
                    "sigs": np.array(sigs[i], dtype=np.int64),
                }
            )
    return ray.data.from_pandas(pd.DataFrame(rows))


def test_embed_local_drops_truncated_pair():
    out = embedding_pairs_from_buckets(
        _embed_buckets(), threshold=0.9, max_bucket=2, dedup="local"
    ).to_pandas()
    assert len(out) == 0


def test_embed_exchange_recovers_truncated_pair():
    out = embedding_pairs_from_buckets(
        _embed_buckets(), threshold=0.9, max_bucket=2, dedup="exchange"
    ).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row.doc_a, row.doc_b) == (3, 4)
    assert row.cosine >= 0.999
