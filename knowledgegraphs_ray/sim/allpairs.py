"""Exact all-pairs cosine similarity — the guaranteed-recall tier next to
the hyperplane-LSH near-dup pass (``dedup.embed``).

Tiled block-pair design: vectors are normalized once per block and kept in
the object store; one task per block pair (i <= j) runs a single matmul and
emits the pairs over threshold. O(B²) tasks / O(N²) FLOPs — use for
moderate corpora or as the per-bucket verifier behind a blocking stage; the
LSH pass is the sub-quadratic approximate path at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from knowledgegraphs_ray.sim.ann import _batch_matrix, _normalize


@ray.remote
def _norm_block(block: pa.Table, id_col: str, column: str) -> tuple:
    ids = block[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    mat = _normalize(_batch_matrix(block, column))
    return ids, mat


@ray.remote
def _pair_block(a, b, same: bool, threshold: float) -> pa.Table:
    ids_a, mat_a = a
    ids_b, mat_b = b
    if not len(ids_a) or not len(ids_b):
        return pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
    sims = mat_a @ mat_b.T
    if same:
        iu, ju = np.triu_indices(len(ids_a), k=1)
        keep = sims[iu, ju] >= threshold
        da, db = ids_a[iu[keep]], ids_b[ju[keep]]
        cs = sims[iu[keep], ju[keep]]
    else:
        ii, jj = np.nonzero(sims >= threshold)
        da, db = ids_a[ii], ids_b[jj]
        cs = sims[ii, jj]
    # canonical orientation doc_a < doc_b
    lo = np.minimum(da, db)
    hi = np.maximum(da, db)
    return pa.table(
        {
            "doc_a": pa.array(lo, pa.int64()),
            "doc_b": pa.array(hi, pa.int64()),
            "cosine": pa.array(cs.astype(np.float64), pa.float64()),
        }
    )


def exact_cosine_pairs(
    ds: ray.data.Dataset,
    *,
    id_col: str = "vec_id",
    column: str = "embedding",
    threshold: float = 0.9,
    rows_per_block: int = 8192,
) -> ray.data.Dataset:
    """-> every (doc_a < doc_b, cosine) pair with cosine >= threshold.
    Exact (no blocking/LSH loss).

    Task count is quadratic in block count, so tiny read blocks turn one
    matmul into thousands of scheduler round-trips: coalesce to
    ``rows_per_block`` tiles first (an 8192² fp32 tile is a ~256 MB sims
    matrix per task — big enough to amortize, small enough for a worker
    heap)."""
    import math

    n = ds.count()
    target = max(1, math.ceil(n / rows_per_block))
    ds = ds.repartition(target)
    refs = ds.to_arrow_refs()
    norm = [_norm_block.remote(r, id_col, column) for r in refs]
    out = []
    for i in range(len(norm)):
        for j in range(i, len(norm)):
            out.append(_pair_block.remote(norm[i], norm[j], i == j, threshold))
    if not out:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        )
    return ray.data.from_arrow_refs(out)
