"""Embedding-cosine near-duplicate pairs (LSH-bucketed).

Vectors are bucketed by random-hyperplane signature (sim.ann.LshBucketer);
within each bucket all pairs with cosine >= threshold are emitted via one
numpy matmul. Multi-probe: ``n_tables`` independent hyperplane sets catch
pairs a single signature would split (cosine-LSH collision probability
(1 - θ/π)^n_planes per table).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from knowledgegraphs_ray.sim.ann import _batch_matrix, _normalize


def embedding_near_dup_pairs(
    ds: ray.data.Dataset,
    *,
    id_col: str = "vec_id",
    column: str = "embedding",
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 10,
    n_tables: int = 8,
    max_bucket: int = 2000,
    seed: int = 42,
) -> ray.data.Dataset:
    """-> (doc_a, doc_b, cosine) pairs with cosine >= threshold."""
    rng = np.random.default_rng(seed)
    planes = [rng.standard_normal((dim, n_planes)) for _ in range(n_tables)]

    def bucketize(batch: pa.Table) -> pd.DataFrame:
        mat = _normalize(_batch_matrix(batch, column))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        # one signature matrix per row, computed ONCE and carried through the
        # shuffle (n_tables int64s/row): recomputing signatures downstream on
        # the bucket-subset matrix can flip the sign of a ~0 dot product in
        # the last ulp (BLAS reductions differ by shape/stride), making the
        # first-collision dedup nondeterministic (ADVICE r2)
        all_sigs = np.stack(
            [
                (((mat @ P) > 0) * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)
                for P in planes
            ],
            axis=1,
        )  # (n, n_tables)
        out = []
        for t in range(n_tables):
            out.append(
                pd.DataFrame(
                    {
                        "table_id": t,
                        "bucket": all_sigs[:, t],
                        id_col: ids,
                        "vec": list(mat),
                        "sigs": list(all_sigs),
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)

    empty = pd.DataFrame(
        {
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
            "cosine": pd.Series([], dtype="float64"),
        }
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        """Emit a pair ONLY from the bucket of its FIRST colliding table —
        global dedup without a pair shuffle, decided from the CARRIED
        signature vectors (bit-identical to bucketing — no recompute).
        Caveat: a pair whose first-collision bucket was truncated by
        max_bucket is dropped rather than recovered from a later table, so
        the no-false-negatives property of multi-table LSH holds only while
        every colliding bucket stays under the cap."""
        g = g.drop_duplicates(id_col).sort_values(id_col).head(max_bucket)
        ids = g[id_col].to_numpy()
        if len(ids) < 2:
            return empty
        table_id = int(g["table_id"].iloc[0])
        m = np.stack(g["vec"].to_numpy())
        sims = m @ m.T
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = sims[iu, ju] >= threshold
        iu, ju = iu[keep], ju[keep]
        if not len(iu):
            return empty
        sigs = np.stack(g["sigs"].to_numpy())  # (n_members, n_tables), carried
        first = (sigs[iu] == sigs[ju]).argmax(axis=1)  # this bucket guarantees a hit
        keep2 = first == table_id
        return pd.DataFrame(
            {
                "doc_a": ids[iu[keep2]].astype("int64"),
                "doc_b": ids[ju[keep2]].astype("int64"),
                "cosine": sims[iu[keep2], ju[keep2]].astype("float64"),
            }
        )

    return bucketed.groupby(["table_id", "bucket"]).map_groups(
        pairs, batch_format="pandas"
    )
