"""Frozen-centroid cluster assignment (sim/clusters.py): provenance of the
frozen micro centroids (distributed Lloyd retrain reproduces them at any
parallelism after quantization) and assignment properties."""

import numpy as np
import ray.data

from knowledgegraphs_ray.sim import clusters as C


def test_frozen_centroids_reproduce(sf_dir):
    got = C.train_frozen_centroids(sf_dir)
    assert got == C.CENTROIDS_MICRO
    # and at a different partitioning
    from knowledgegraphs_ray.sim.ivf import train_centroids_distributed

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).repartition(5)
    c = train_centroids_distributed(ds, n_list=8, n_iter=5)
    micro = tuple(
        tuple(int(v) for v in row)
        for row in np.round(c * 1_000_000.0).astype(np.int64)
    )
    assert micro == C.CENTROIDS_MICRO


def test_assignment_is_nearest_centroid(sf_dir):
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    out = (
        C.assign_clusters(ds).to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    raw = ds.to_pandas().sort_values("vec_id").reset_index(drop=True)
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in raw["embedding"]])
    ref = (mat @ C.centroids().T).argmax(axis=1)
    assert np.array_equal(out["cluster_id"].to_numpy(), ref)
    assert out["cluster_id"].nunique() > 1  # non-degenerate clustering


def test_cluster_balanced_sample_invariance_and_quota():
    import ray.data

    from knowledgegraphs_ray.sim.clusters import cluster_balanced_sample

    emb = ray.data.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet",
        columns=["vec_id", "embedding"],
    )
    a = cluster_balanced_sample(emb.repartition(3), k_per_cluster=5).to_pandas()
    b = cluster_balanced_sample(emb.repartition(9), k_per_cluster=5).to_pandas()
    key = lambda df: sorted(map(tuple, df[["vec_id", "cluster_id", "rank"]].values))
    assert key(a) == key(b)  # parallelism-invariant
    # quota honored per cluster, ranks dense from 0
    per = a.groupby("cluster_id")
    assert (per.size() <= 5).all()
    for _, g in per:
        assert sorted(g["rank"]) == list(range(len(g)))
    # selection is the energy-descending prefix within each cluster
    for _, g in per:
        s = g.sort_values("rank")
        assert (s["energy"].diff().dropna() <= 0).all()
