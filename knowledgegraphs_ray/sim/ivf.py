"""IVF (inverted-file) approximate nearest neighbour — the clustered scale
path next to the brute-force baseline and hyperplane LSH (sim.ann).

Standard IVF shape, Ray-Data-first:

* ``train_centroids`` — k-means on a driver-side SAMPLE (seeded, few
  Lloyd iterations; the sample is tiny relative to the corpus);
* ``assign``: one matmul per batch tags every vector with its nearest
  centroid (map-only); the assignment column is the partition key for any
  downstream bucket work;
* ``ivf_topk``: a query scans only its ``n_probe`` nearest centroid lists —
  candidate generation cost drops from O(N) to O(N * n_probe / n_list)
  while the per-bucket scoring stays the exact numpy kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from knowledgegraphs_ray.sim.ann import _batch_matrix, _normalize


def train_centroids(
    ds: ray.data.Dataset,
    *,
    n_list: int = 16,
    column: str = "embedding",
    sample_size: int = 4096,
    n_iter: int = 8,
    seed: int = 42,
) -> np.ndarray:
    """Seeded mini k-means over a sample -> (n_list, dim) normalized centroids."""
    sample = ds.random_sample(1.0, seed=seed) if sample_size is None else ds
    rows = sample.limit(sample_size).to_pandas()
    mat = _normalize(np.stack([np.asarray(v, dtype=np.float64) for v in rows[column]]))
    rng = np.random.default_rng(seed)
    cent = mat[rng.choice(len(mat), size=min(n_list, len(mat)), replace=False)]
    for _ in range(n_iter):
        sims = mat @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(len(cent)):
            members = mat[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def train_centroids_distributed(
    ds: ray.data.Dataset,
    *,
    n_list: int = 16,
    column: str = "embedding",
    n_iter: int = 5,
    seed: int = 42,
    driver_limit: int = 2_000_000,
) -> np.ndarray:
    """Full-data Lloyd iterations, Ray-Data-first: each round broadcasts the
    centroids, every block computes its partial (per-centroid vector sum,
    count) — one (n_list, dim) matrix per block — and the driver merges the
    bounded partials (blocks × n_list rows; above ``driver_limit`` raise the
    block size upstream). Seeded sample init keeps determinism; use
    ``train_centroids`` (sample k-means) when a sample suffices."""
    cent = train_centroids(
        ds, n_list=n_list, column=column, sample_size=4096, n_iter=1, seed=seed
    )

    for _ in range(n_iter):
        cref = ray.put(cent)

        def partial(batch: pa.Table, _cref=cref) -> pd.DataFrame:
            c = ray.get(_cref)
            mat = _normalize(_batch_matrix(batch, column))
            if not len(mat):
                return pd.DataFrame(
                    {
                        "list_id": pd.Series([], dtype="int64"),
                        "count": pd.Series([], dtype="int64"),
                        "vecsum": pd.Series([], dtype="object"),
                    }
                )
            assign = (mat @ c.T).argmax(axis=1)
            rows = []
            for li in np.unique(assign):
                m = mat[assign == li]
                rows.append(
                    {"list_id": int(li), "count": len(m), "vecsum": m.sum(axis=0)}
                )
            return pd.DataFrame(rows)

        parts = ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()
        if len(parts) > driver_limit:
            raise ValueError("centroid partials exceed driver limit; raise block size")
        new = cent.copy()
        for li, g in parts.groupby("list_id"):
            total = int(g["count"].sum())
            if total:
                new[int(li)] = np.sum(np.stack(g["vecsum"].to_numpy()), axis=0) / total
        cent = _normalize(new)
    return cent


def assign_lists(
    ds: ray.data.Dataset,
    centroids: np.ndarray,
    *,
    id_column: str = "vec_id",
    column: str = "embedding",
) -> ray.data.Dataset:
    """Tag every vector with its nearest centroid id (map-only matmul)."""
    cref = ray.put(centroids)

    class Assign:
        def __init__(self, ref):
            self.ref = ref
            self._c = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self._c is None:
                self._c = ray.get(self.ref)
            mat = _normalize(_batch_matrix(batch, column))
            lists = (
                (mat @ self._c.T).argmax(axis=1).astype(np.int64)
                if len(mat)
                else np.empty(0, np.int64)
            )
            return batch.append_column("ivf_list", pa.array(lists, pa.int64()))

    return ds.map_batches(Assign(cref), batch_format="pyarrow", zero_copy_batch=True)


def ivf_topk(
    ds: ray.data.Dataset,
    query_ids: list[int],
    *,
    k: int = 10,
    n_list: int = 16,
    n_probe: int = 4,
    id_column: str = "vec_id",
    column: str = "embedding",
    distributed_train_threshold: int = 100_000,
) -> ray.data.Dataset:
    """Approximate top-k: each query scores only vectors in its n_probe
    nearest centroid lists. Output (query_id, neighbor_id, rank).

    Centroid training tiers on corpus size: up to
    ``distributed_train_threshold`` vectors the seeded driver-sample k-means
    suffices; above it the full-data distributed Lloyd path
    (``train_centroids_distributed`` — per-block partial sums, bounded
    driver merge) trains on everything without a corpus-sized collect."""
    if ds.count() > distributed_train_threshold:
        centroids = train_centroids_distributed(ds, n_list=n_list, column=column)
    else:
        centroids = train_centroids(ds, n_list=n_list, column=column)
    assigned = assign_lists(ds, centroids, id_column=id_column, column=column)

    qdf = (
        ds.map_batches(
            lambda b: b.filter(pa.compute.is_in(b[id_column], value_set=pa.array(query_ids))),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values(id_column)
    )
    q_ids = qdf[id_column].to_numpy()
    q_mat = _normalize(np.stack([np.asarray(v, dtype=np.float64) for v in qdf[column]]))
    probe = np.argsort(-(q_mat @ centroids.T), axis=1)[:, :n_probe]  # (nq, n_probe)
    probes_ref = ray.put({"ids": q_ids, "mat": q_mat, "probe": probe})

    class Score:
        def __init__(self, ref, k):
            self.ref = ref
            self.k = k
            self._q = None

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            if self._q is None:
                self._q = ray.get(self.ref)
            q = self._q
            mat = _normalize(_batch_matrix(batch, column))
            ids = batch[id_column].to_numpy(zero_copy_only=False)
            lists = batch["ivf_list"].to_numpy(zero_copy_only=False)
            rows = {"query_id": [], "neighbor_id": [], "score": []}
            for qi in range(len(q["ids"])):
                mask = np.isin(lists, q["probe"][qi])
                if not mask.any():
                    continue
                scores = mat[mask] @ q["mat"][qi]
                kk = min(self.k, len(scores))
                top = np.argpartition(-scores, kk - 1)[:kk]
                rows["query_id"].append(np.repeat(q["ids"][qi], kk))
                rows["neighbor_id"].append(ids[mask][top])
                rows["score"].append(scores[top])
            if not rows["query_id"]:
                return pd.DataFrame(
                    {
                        "query_id": pd.Series([], dtype="int64"),
                        "neighbor_id": pd.Series([], dtype="int64"),
                        "score": pd.Series([], dtype="float64"),
                    }
                )
            return pd.DataFrame({c: np.concatenate(v) for c, v in rows.items()})

    local = assigned.map_batches(Score(probes_ref, k), batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "neighbor_id"], ascending=[False, True], kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank"]]

    return local.groupby("query_id").map_groups(merge, batch_format="pandas")
