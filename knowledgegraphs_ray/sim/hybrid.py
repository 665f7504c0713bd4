"""Hybrid retrieval — reciprocal-rank fusion (RRF, Cormack et al. 2009)
of a lexical BM25 ranking and a dense cosine-similarity ranking over the
same document corpus.

The two legs are the engine's existing distributed scans
(:func:`~knowledgegraphs_ray.text.bm25.bm25_topk` and
:func:`~knowledgegraphs_ray.sim.ann.brute_force_topk`): each is a
map-only per-block top-k with an O(k x blocks) driver merge, so the
corpus text / embeddings never shuffle. Fusion itself runs on the two
k-row rank lists — driver-bounded by construction (2k rows regardless
of corpus size).

Determinism: RRF weights are INTEGER micro-units
``1_000_000_000 // (rrf_k + rank)`` — int64 floor division on both the
numpy side and the DuckDB twin, so the fused ordering is bit-exact and
float-free (the legs export rank-only, the proven cross-engine-stable
representation).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from knowledgegraphs_ray.sim.ann import brute_force_topk
from knowledgegraphs_ray.text.bm25 import bm25_oracle_sql, bm25_topk

_RRF_SCALE = 1_000_000_000


def hybrid_rrf_topk(
    docs: ray.data.Dataset,
    embeddings: ray.data.Dataset,
    *,
    query_text: str,
    query_vec_id: int,
    k: int = 15,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
) -> pd.DataFrame:
    """-> (id_col, rrf_micro, rank) over the union of the two legs' top-k
    lists (up to 2k rows), ordered by fused score desc then id asc.
    A document present in only one leg contributes that leg's weight
    alone (the standard RRF treatment of missing ranks)."""
    bm = bm25_topk(docs, query_text, k=k, id_col=id_col)[[id_col, "rank"]]
    ann = (
        brute_force_topk(
            embeddings, query_ids=[query_vec_id], k=k, id_column=vec_id_col
        )
        .to_pandas()
        .rename(columns={"neighbor_id": id_col})[[id_col, "rank"]]
    )
    fused = bm.merge(ann, on=id_col, how="outer", suffixes=("_bm", "_ann"))

    def leg(r: pd.Series) -> np.ndarray:
        v = r.to_numpy(dtype="float64", na_value=np.nan)
        w = np.zeros(len(v), dtype=np.int64)
        m = ~np.isnan(v)
        w[m] = _RRF_SCALE // (rrf_k + v[m].astype(np.int64))
        return w

    fused["rrf_micro"] = leg(fused["rank_bm"]) + leg(fused["rank_ann"])
    fused = (
        fused.sort_values(["rrf_micro", id_col], ascending=[False, True], kind="mergesort")
        .reset_index(drop=True)
    )
    fused["rank"] = np.arange(1, len(fused) + 1, dtype=np.int64)
    return fused[[id_col, "rrf_micro", "rank"]]


def hybrid_rrf_oracle_sql(
    *,
    query_text: str,
    query_vec_id: int,
    k: int = 15,
    rrf_k: int = 60,
    doc_table: str = "documents",
    emb_table: str = "embeddings",
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
) -> str:
    """DuckDB twin: the bm25 twin's rank list FULL OUTER JOIN the cosine
    rank list, fused with the identical integer floor-division weights."""
    bm_sql = bm25_oracle_sql(query_text, k=k, table=doc_table, id_col=id_col)
    ann_sql = f"""
WITH q AS (SELECT embedding AS qe FROM {emb_table} WHERE {vec_id_col} = {query_vec_id}),
scored AS (
  SELECT e.{vec_id_col} AS nb, list_cosine_similarity(q.qe, e.embedding) AS score
  FROM q CROSS JOIN {emb_table} e
)
SELECT nb, CAST(row_number() OVER (ORDER BY score DESC, nb) AS BIGINT) AS rank
FROM scored QUALIFY rank <= {k}
""".strip()
    return f"""
WITH bm AS (SELECT {id_col}, rank FROM ({bm_sql})),
ann AS ({ann_sql}),
fused AS (
  SELECT COALESCE(bm.{id_col}, ann.nb) AS {id_col},
         COALESCE({_RRF_SCALE} // ({rrf_k} + bm.rank), 0)
         + COALESCE({_RRF_SCALE} // ({rrf_k} + ann.rank), 0) AS rrf_micro
  FROM bm FULL OUTER JOIN ann ON bm.{id_col} = ann.nb
)
SELECT {id_col}, rrf_micro,
       CAST(row_number() OVER (ORDER BY rrf_micro DESC, {id_col}) AS BIGINT) AS rank
FROM fused
""".strip()
