"""IVF ANN: centroid training, assignment, probe recall vs brute force."""

import numpy as np
import ray.data

from knowledgegraphs_ray.sim.ann import brute_force_topk
from knowledgegraphs_ray.sim.ivf import assign_lists, ivf_topk, train_centroids


def _clustered(n_per=40, n_clusters=4, dim=16, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)) * 4
    rows = []
    i = 0
    for c in range(n_clusters):
        for _ in range(n_per):
            rows.append(
                {"vec_id": i, "embedding": (centers[c] + rng.standard_normal(dim) * 0.2).tolist()}
            )
            i += 1
    return ray.data.from_items(rows)


def test_train_and_assign_groups_clusters():
    ds = _clustered()
    cent = train_centroids(ds, n_list=4, sample_size=160)
    assert cent.shape == (4, 16)
    assigned = assign_lists(ds, cent).to_pandas()
    # vectors from the same generated cluster land in the same list
    for c in range(4):
        lists = assigned[(assigned["vec_id"] >= c * 40) & (assigned["vec_id"] < (c + 1) * 40)][
            "ivf_list"
        ]
        assert lists.nunique() == 1


def test_ivf_topk_matches_brute_force_in_cluster():
    ds = _clustered()
    exact = brute_force_topk(ds, query_ids=[0], k=5).to_pandas()
    approx = ivf_topk(ds, query_ids=[0], k=5, n_list=4, n_probe=1).to_pandas()
    # with well-separated clusters and the query's own list probed,
    # IVF recalls the exact neighbours
    assert set(approx["neighbor_id"]) == set(exact["neighbor_id"])


def test_ivf_deterministic():
    ds = _clustered()
    a = ivf_topk(ds, query_ids=[0, 50], k=3, n_list=4).to_pandas()
    b = ivf_topk(ds, query_ids=[0, 50], k=3, n_list=4).to_pandas()
    key = ["query_id", "rank"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )


def test_ivf_topk_tiers_on_corpus_size_and_centroids_agree():
    """ivf_topk routes centroid training through the distributed Lloyd path
    above the threshold; on the same data both trainers reach matching
    centroids (same seeded init, full-coverage sample) and full-probe
    results stay exact vs brute force on the distributed tier."""
    from knowledgegraphs_ray.sim.ivf import train_centroids_distributed

    ds = _clustered()
    # tier equality: sample covers the whole corpus; one driver round of
    # init + n Lloyd rounds in each tier -> same fixed point
    sample = train_centroids(ds, n_list=4, sample_size=4096, n_iter=6)
    dist = train_centroids_distributed(ds, n_list=4, n_iter=6)
    assert np.allclose(sample, dist, atol=1e-9)

    # threshold=0 forces the distributed trainer inside ivf_topk; full probe
    # must still be exact vs brute force
    got = (
        ivf_topk(
            ds, [0, 45, 130], k=5, n_list=4, n_probe=4,
            distributed_train_threshold=0,
        )
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    want = (
        brute_force_topk(ds, query_ids=[0, 45, 130], k=5)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert got.equals(want)


def test_distributed_kmeans_improves_or_matches_inertia():
    """Full-data Lloyd rounds produce centroids at least as good (mean max
    cosine to nearest centroid) as the sample trainer, and full-probe IVF
    over them stays exact vs brute force."""
    import numpy as np
    import ray.data

    from knowledgegraphs_ray.sim.ann import brute_force_topk
    from knowledgegraphs_ray.sim.ivf import (
        assign_lists,
        train_centroids,
        train_centroids_distributed,
    )

    rng = np.random.default_rng(8)
    centers = rng.standard_normal((4, 16)) * 3
    vecs = np.vstack([c + rng.standard_normal((50, 16)) for c in centers])
    rows = [
        {"vec_id": int(i), "embedding": v.tolist()} for i, v in enumerate(vecs)
    ]
    ds = ray.data.from_items(rows).repartition(4)

    def inertia(cent):
        m = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        return float((m @ cent.T).max(axis=1).mean())

    sample = train_centroids(ds, n_list=4, sample_size=64, n_iter=3)
    full = train_centroids_distributed(ds, n_list=4, n_iter=5)
    assert inertia(full) >= inertia(sample) - 1e-6

    # determinism
    full2 = train_centroids_distributed(ds.repartition(2), n_list=4, n_iter=5)
    # same vectors, same seed init -> same fixed point regardless of blocks
    assert np.allclose(full, full2, atol=1e-9)
