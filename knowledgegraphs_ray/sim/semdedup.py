"""Semantic deduplication over an embedding column (SemDeDup, Abbas et
al. 2023: cluster the corpus in embedding space, prune all-but-one of
every group of semantically near-identical documents).

Two tiers sharing one resolve path:

* **Exact tier** (``n_list=None``) — tiled all-pairs cosine
  (:func:`knowledgegraphs_ray.sim.allpairs.exact_cosine_pairs`), guaranteed
  recall, quadratic in corpus size. This is the oracle-checkable tier and
  the verifier for the clustered tier below.
* **Clustered tier** (``n_list=k``) — the paper's actual scale shape:
  k-means centroids (driver sample below ``distributed_kmeans_rows``,
  per-block-partial distributed k-means above it), a map-only
  nearest-centroid assignment, then pairwise cosine WITHIN each cluster
  only (``groupby("ivf_list").map_groups``). Work drops from O(n^2) to
  O(sum cluster_i^2); recall is bounded by cluster purity — pairs split
  across a centroid boundary are missed, which is the documented,
  intended trade (SemDeDup section 3). Cluster size is the scale knob:
  n_list ~ n/1000 keeps every within-cluster matmul cache-resident.

Pairs then flow through the shared duplicate-resolution machinery:
union-find components -> keep the min-id member of each component ->
broadcast drop-filter over the corpus (``dedup/resolve.py``). Embedding
vectors never shuffle in the clustered tier until the within-cluster
stage, and there only as (id, vec) rows bucketed by cluster id.

Reference analogue: the reference dedups candidate annotation sets by
exact key (D1/D5, e.g. AnnotationsDict); semantic near-dedup is the
embedding-space generalization a pre-training corpus needs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _within_cluster_pairs(
    group: pa.Table, *, id_col: str, column: str, threshold: float
) -> pa.Table:
    """All (a < b, cosine >= threshold) pairs inside one cluster."""
    from knowledgegraphs_ray.sim.ann import _batch_matrix, _normalize

    ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(ids)
    if n < 2:
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
        )
    mat = _normalize(_batch_matrix(group, column))
    sims = mat @ mat.T
    iu, ju = np.triu_indices(n, k=1)
    hit = sims[iu, ju] >= threshold
    a, b = ids[iu[hit]], ids[ju[hit]]
    swap = a > b
    a2 = np.where(swap, b, a)
    b2 = np.where(swap, a, b)
    return pa.table({"doc_a": pa.array(a2, pa.int64()), "doc_b": pa.array(b2, pa.int64())})


def semantic_pairs(
    ds: ray.data.Dataset,
    *,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    column: str = "embedding",
    n_list: int | None = None,
    distributed_kmeans_rows: int = 2_000_000,
    seed: int = 42,
) -> ray.data.Dataset:
    """-> (doc_a < doc_b) near-duplicate candidate pairs.

    ``n_list=None`` is the exact tier; ``n_list=k`` restricts the pair
    search to k-means clusters (see module docstring for the recall trade).
    """
    if n_list is None:
        from knowledgegraphs_ray.sim.allpairs import exact_cosine_pairs

        return exact_cosine_pairs(
            ds, id_col=id_col, column=column, threshold=threshold
        ).select_columns(["doc_a", "doc_b"])

    from knowledgegraphs_ray.sim.ivf import (
        assign_lists,
        train_centroids,
        train_centroids_distributed,
    )

    if ds.count() > distributed_kmeans_rows:
        centroids = train_centroids_distributed(
            ds, n_list=n_list, column=column, seed=seed
        )
    else:
        centroids = train_centroids(ds, n_list=n_list, column=column, seed=seed)
    tagged = assign_lists(ds, centroids, id_column=id_col, column=column)
    return tagged.groupby("ivf_list").map_groups(
        lambda g: _within_cluster_pairs(
            g, id_col=id_col, column=column, threshold=threshold
        ),
        batch_format="pyarrow",
    )


def semantic_dedup(
    ds: ray.data.Dataset,
    *,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    column: str = "embedding",
    n_list: int | None = None,
    max_driver_edges: int = 1_000_000,
) -> ray.data.Dataset:
    """Corpus minus semantic near-duplicates; the min-id member of every
    near-dup component survives. Output schema == input schema.

    Edges (near-dup pairs) are tiny relative to the corpus at real
    thresholds; above ``max_driver_edges`` components fall back to the
    distributed label-propagation tier.
    """
    from knowledgegraphs_ray.dedup.minhash import (
        components_by_propagation,
        components_from_pairs,
    )
    from knowledgegraphs_ray.dedup.resolve import resolve_duplicates

    pairs = semantic_pairs(
        ds, threshold=threshold, id_col=id_col, column=column, n_list=n_list
    ).materialize()
    if pairs.count() <= max_driver_edges:
        # components are keyed "doc_id" regardless of the input id column;
        # the corpus id is aliased through the resolve below to match
        comp = components_from_pairs(pairs, max_driver_edges=max_driver_edges)
    else:
        comp = components_by_propagation(pairs)
    out = resolve_duplicates(
        ds.map_batches(  # resolve keys on "doc_id"; alias the id through
            lambda t: t.rename_columns(
                ["doc_id" if c == id_col else c for c in t.schema.names]
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        comp,
        id_col="doc_id",
        keep="min_id",
    )
    return out.map_batches(
        lambda t: t.rename_columns(
            [id_col if c == "doc_id" else c for c in t.schema.names]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def semantic_dedup_oracle_sql(
    *,
    threshold: float = 0.95,
    table: str = "embeddings",
    id_col: str = "vec_id",
    column: str = "embedding",
    out_cols: str = "vec_id",
) -> str:
    """DuckDB twin of the EXACT tier: cosine pairs -> undirected
    reachability (recursive CTE) -> keep the min-id representative."""
    return f"""
WITH RECURSIVE pairs AS (
  SELECT a.{id_col} AS doc_a, b.{id_col} AS doc_b
  FROM {table} a JOIN {table} b ON a.{id_col} < b.{id_col}
  WHERE list_cosine_similarity(a.{column}, b.{column}) >= {threshold}
), nodes AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_a AS doc_id FROM pairs UNION ALL SELECT doc_b FROM pairs
  )
), edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION ALL SELECT doc_b AS u, doc_a AS v FROM pairs
), walk(node, label) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT e.u, w.label FROM edges e JOIN walk w ON w.node = e.v
), comp AS (
  SELECT node, min(label) AS rep FROM walk GROUP BY node
)
SELECT {out_cols} FROM {table} t
WHERE NOT EXISTS (
  SELECT 1 FROM comp c WHERE c.node = t.{id_col} AND c.rep != t.{id_col}
)
""".strip()
