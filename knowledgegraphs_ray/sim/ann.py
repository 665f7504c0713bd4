"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — queries broadcast ONCE via ``ray.put``
(never re-shipped per batch), scored with one numpy matmul per Arrow batch,
per-batch local top-k, then a small per-query merge. The scale path
(``lsh_topk``) buckets vectors by random-hyperplane signs so each query only
scans its probe buckets.

This is the FAISS/ANN candidate-generation stand-in the north_star names for
entity linking (reference analogue: the IDF inverted-index candidate selector,
DeepOnto utils/text_utils.py:155-182 — same role, vector-space version).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _batch_matrix(batch: pa.Table, column: str) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix, zero-copy when possible."""
    arr = batch[column].combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteForceScorer:
    """Stateless scoring stage over a broadcast query matrix: emits per-batch
    local top-k (query_id, id, score) rows. The queries live in the object
    store (``ray.put`` once on the driver); ``ray.get`` of a local ref is a
    zero-copy plasma read per batch, so a plain task pool suffices — an actor
    pool here would pin CPUs and can starve the read stage on small clusters."""

    def __init__(self, queries_ref, k: int, id_column: str, column: str):
        self.queries_ref = queries_ref
        self._q = None
        self.k = k
        self.id_column = id_column
        self.column = column

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        if self._q is None:
            self._q = ray.get(self.queries_ref)
        q_ids, q_mat = self._q["ids"], self._q["mat"]
        mat = _normalize(_batch_matrix(batch, self.column))
        ids = batch[self.id_column].to_numpy(zero_copy_only=False)
        scores = q_mat @ mat.T  # (n_queries, n_batch)
        k = min(self.k, scores.shape[1])
        if k == 0:
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype="int64"),
                    "neighbor_id": pd.Series([], dtype="int64"),
                    "score": pd.Series([], dtype="float64"),
                }
            )
        top = np.argpartition(-scores, k - 1, axis=1)[:, :k]
        rows = {"query_id": [], "neighbor_id": [], "score": []}
        for qi in range(scores.shape[0]):
            rows["query_id"].append(np.repeat(q_ids[qi], k))
            rows["neighbor_id"].append(ids[top[qi]])
            rows["score"].append(scores[qi, top[qi]])
        return pd.DataFrame({c: np.concatenate(v) for c, v in rows.items()})


def brute_force_topk(
    ds: ray.data.Dataset,
    query_ids: list[int],
    *,
    k: int = 10,
    id_column: str = "vec_id",
    column: str = "embedding",
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """Exact cosine top-k of each query over the whole dataset.

    Output: (query_id, neighbor_id, rank) with rank 1..k ordered by
    (score desc, neighbor_id asc) — rank-only so results are comparable
    across engines' float summation orders.
    """
    qdf = (
        ds.map_batches(
            lambda b: b.filter(
                pa.compute.is_in(b[id_column], value_set=pa.array(query_ids))
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values(id_column)
    )
    q_ids = qdf[id_column].to_numpy()
    q_mat = np.stack([np.asarray(v, dtype=np.float64) for v in qdf[column]])
    assert set(q_ids.tolist()) == set(query_ids), "missing query vectors"
    queries_ref = ray.put({"ids": q_ids, "mat": _normalize(q_mat)})

    scorer = BruteForceScorer(
        queries_ref=queries_ref, k=k, id_column=id_column, column=column
    )
    local = ds.map_batches(scorer, batch_format="pyarrow", concurrency=concurrency)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "neighbor_id"], ascending=[False, True], kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank"]]

    return local.groupby("query_id").map_groups(merge, batch_format="pandas")


class LshBucketer:
    """Scale path: random-hyperplane signature per vector; a query is only
    compared against vectors sharing its signature bucket (or within Hamming
    distance via multi-probe). Emits (bucket, id) rows; downstream groupby
    co-locates bucket contents."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 42, column: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes))
        self.column = column

    def signature(self, mat: np.ndarray) -> np.ndarray:
        bits = (mat @ self.planes) > 0
        return (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _batch_matrix(batch, self.column)
        sig = self.signature(mat) if len(mat) else np.empty(0, np.int64)
        return batch.append_column("lsh_bucket", pa.array(sig, type=pa.int64()))
