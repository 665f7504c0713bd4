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
