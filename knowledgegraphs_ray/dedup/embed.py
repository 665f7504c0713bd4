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
    dedup: str = "exchange",
) -> ray.data.Dataset:
    """-> (doc_a, doc_b, cosine) pairs with cosine >= threshold.

    ``dedup`` tiers as in ``simhash_pairs_from_fingerprints``: "exchange"
    (default) emits from EVERY table whose bucket retains both members and
    distincts the slim pair rows, so multi-table recall survives hot-bucket
    truncation; "local" is the shuffle-free first-collision rule, exact only
    while every colliding bucket stays under ``max_bucket``."""
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
    return embedding_pairs_from_buckets(
        bucketed,
        id_col=id_col,
        threshold=threshold,
        max_bucket=max_bucket,
        dedup=dedup,
    )


def embedding_pairs_from_buckets(
    bucketed: ray.data.Dataset,
    *,
    id_col: str = "vec_id",
    threshold: float = 0.95,
    max_bucket: int = 2000,
    dedup: str = "exchange",
) -> ray.data.Dataset:
    """(table_id, bucket, id, vec, sigs) rows -> (doc_a, doc_b, cosine).

    "local": emit a pair ONLY from its FIRST colliding table — shuffle-free
    global dedup decided from the CARRIED signature vectors (bit-identical
    to bucketing — no recompute; ADVICE r2), but a pair whose
    first-collision bucket was truncated by ``max_bucket`` is dropped.
    "exchange" (default): emit from every table whose bucket retains both
    members, then one distinct over the slim pair rows — recall survives
    truncation whenever ANY colliding bucket keeps both (r3 verdict wart)."""
    empty = pd.DataFrame(
        {
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
            "cosine": pd.Series([], dtype="float64"),
        }
    )
    local_dedup = dedup == "local"

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(id_col).sort_values(id_col).head(max_bucket)
        ids = g[id_col].to_numpy()
        if len(ids) < 2:
            return empty
        m = np.stack(g["vec"].to_numpy())
        sims = m @ m.T
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = sims[iu, ju] >= threshold
        iu, ju = iu[keep], ju[keep]
        if not len(iu):
            return empty
        if local_dedup:
            table_id = int(g["table_id"].iloc[0])
            sigs = np.stack(g["sigs"].to_numpy())  # (n_members, n_tables), carried
            first = (sigs[iu] == sigs[ju]).argmax(axis=1)  # >= 1 hit guaranteed here
            keep2 = first == table_id
            iu, ju = iu[keep2], ju[keep2]
        return pd.DataFrame(
            {
                "doc_a": ids[iu].astype("int64"),
                "doc_b": ids[ju].astype("int64"),
                "cosine": sims[iu, ju].astype("float64"),
            }
        )

    emitted = bucketed.groupby(["table_id", "bucket"]).map_groups(
        pairs, batch_format="pandas"
    )
    if local_dedup:
        return emitted
    from knowledgegraphs_ray.dedup._pairs import distinct_pairs

    schema = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("cosine", pa.float64())]
    )
    # Min over cosine: duplicate emissions of a pair compute the dot product
    # on different bucket sub-matrices, which can differ in the last ulp
    # (BLAS reduction order varies by shape) — Min picks a
    # partitioning-independent representative.
    return distinct_pairs(emitted, carry=("cosine",), schema=schema)
