"""Two-corpus n-gram overlap — corpus-level contamination / similarity
measurement: the Jaccard of the two sides' shingle SETS plus the raw
distinct counts.

``text/decontam.py`` answers the per-document question ("which docs contain
a benchmark gram?"); this answers the corpus-level one a curation run asks
before mixing two sources or shipping an eval set: HOW MUCH of corpus B's
n-gram inventory already exists in corpus A? Gram identity is the exact
shingle hash shared with the minhash family (``dedup.minhash.
shingle_stream`` — token Horner fold + 3-shingle combine, short-doc raw-
token fallback), so the DuckDB oracle reuses the proven ``tok_sh_cte``
twin verbatim.

Two tiers:

* ``exact=True`` (gate/report tier): each block emits its PER-BLOCK-UNIQUE
  (gram, side) rows — 16 B each, the only thing that ever moves — which
  ``fastagg.merge_partials`` distincts on (g, m). The final fold (three
  counts + intersection) is one polars pass over the distinct pairs.
  Bounded by the corpus's DISTINCT gram count; above ``driver_limit``
  grams this tier raises — the signal to use the sketch tier, exactly the
  A1 distinct-count split (``schema/keys.py`` exact vs HLL).
* ``exact=False`` (100-TB tier): three HyperLogLog sketches (side A, side
  B, and their register-wise max = the union) folded from per-block
  register partials — map-only over both corpora, O(2^p) driver state,
  order-invariant (register max commutes). Estimates carry HLL's ~1.04/
  sqrt(2^p) relative error; intersection by inclusion-exclusion.

Output (single row, integers in the exact tier): (n_a, n_b, n_intersect,
n_union, jaccard_micro) with jaccard_micro = (n_intersect * 1e6) //
n_union — integer arithmetic end to end, so the oracle match is
structural.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from knowledgegraphs_ray.dedup.minhash import shingle_stream, tok_sh_cte


def _gram_rows(side: int, *, id_col: str, text_col: str, k: int):
    def f(batch: pa.Table) -> pd.DataFrame:
        _, flat, _ = shingle_stream(batch, id_col=id_col, text_col=text_col, k=k)
        g = np.unique(flat)  # per-block unique — all any consumer needs
        return pd.DataFrame(
            {
                "g": g.view(np.int64),
                "m": np.full(len(g), side, dtype=np.int64),
                "c": np.ones(len(g), dtype=np.int64),
            }
        )

    return f


def corpus_ngram_overlap(
    a: ray.data.Dataset,
    b: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    exact: bool = True,
    driver_limit: int = 50_000_000,
    hll_p: int = 14,
) -> ray.data.Dataset:
    """-> one row: (n_a, n_b, n_intersect, n_union, jaccard_micro)."""
    rows_a = a.map_batches(
        _gram_rows(1, id_col=id_col, text_col=text_col, k=shingle_k),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    rows_b = b.map_batches(
        _gram_rows(2, id_col=id_col, text_col=text_col, k=shingle_k),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    if not exact:
        from knowledgegraphs_ray.util.hll import (
            hll_add_hashes,
            hll_estimate,
            hll_merge,
            hll_new,
        )

        from knowledgegraphs_ray.pipelines.transcripts import _splitmix64

        def regs(side):
            def f(batch: pa.Table) -> pd.DataFrame:
                _, flat, _ = shingle_stream(
                    batch, id_col=id_col, text_col=text_col, k=shingle_k
                )
                # the Horner-fold shingle hash has poor bit avalanche for
                # HLL's leading-zero statistic (measured: 33% undercount);
                # a splitmix64 finalizer restores the ~1% sketch error
                r = hll_add_hashes(hll_new(hll_p), _splitmix64(flat))
                return pd.DataFrame({"side": [side], "regs": [r.tobytes()]})

            return f

        parts = (
            a.map_batches(regs(1), batch_format="pyarrow", zero_copy_batch=True)
            .union(
                b.map_batches(regs(2), batch_format="pyarrow", zero_copy_batch=True)
            )
            .to_pandas()
        )
        ra, rb = hll_new(hll_p), hll_new(hll_p)
        for _, row in parts.iterrows():  # num_blocks rows of 2^p bytes
            r = np.frombuffer(row["regs"], dtype=np.uint8)
            if row["side"] == 1:
                ra = hll_merge(ra, r)
            else:
                rb = hll_merge(rb, r)
        n_a, n_b = hll_estimate(ra), hll_estimate(rb)
        n_u = hll_estimate(hll_merge(ra, rb))
        n_i = max(n_a + n_b - n_u, 0.0)
        out = pd.DataFrame(
            {
                "n_a": [int(round(n_a))],
                "n_b": [int(round(n_b))],
                "n_intersect": [int(round(n_i))],
                "n_union": [int(round(n_u))],
                "jaccard_micro": [
                    int(round(n_i * 1_000_000 / n_u)) if n_u > 0 else 0
                ],
            }
        )
        return ray.data.from_pandas(out)

    from knowledgegraphs_ray.util.fastagg import merge_partials

    rows = rows_a.union(rows_b).materialize()
    n_partial = rows.count()
    if n_partial > driver_limit:
        # the distributed-aggregate fallback inside merge_partials pays
        # sort-shuffle constants per distinct key — at tens of millions of
        # grams that is the wrong tool; fail fast toward the sketch tier
        raise ValueError(
            f"{n_partial} (gram, side) partial rows exceed driver_limit="
            f"{driver_limit} — use the HLL sketch tier (exact=False), or "
            "raise driver_limit if a multi-GB driver merge is acceptable"
        )
    distinct = merge_partials(
        rows, keys=["g", "m"], agg={"c": "max"}, driver_limit=n_partial + 1
    ).materialize()
    import polars as pl

    pdf = pl.from_pandas(distinct.to_pandas())
    n_a = int(pdf.filter(pl.col("m") == 1).height)
    n_b = int(pdf.filter(pl.col("m") == 2).height)
    n_g = int(pdf.select(pl.col("g").n_unique()).item())
    n_i = n_a + n_b - n_g
    jac = (n_i * 1_000_000) // n_g if n_g > 0 else 0
    out = pd.DataFrame(
        {
            "n_a": [n_a],
            "n_b": [n_b],
            "n_intersect": [n_i],
            "n_union": [n_g],
            "jaccard_micro": [jac],
        }
    )
    return ray.data.from_pandas(out)


def corpus_ngram_overlap_oracle_sql(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    side_a_pred: str = "doc_id % 3 = 0",
) -> str:
    """DuckDB twin of the exact tier over ONE table split by a predicate
    (side A = rows matching ``side_a_pred``, side B = the rest). Reuses the
    minhash tok/sh CTE so gram identity is bit-equal to the engine's."""
    cte = tok_sh_cte(table=table, id_col=id_col, text_col=text_col)
    return f"""
WITH {cte}, g AS (
  SELECT DISTINCT CASE WHEN {side_a_pred.replace(id_col, 'sh.doc_id')}
                       THEN 1 ELSE 2 END AS m, u.g
  FROM sh, unnest(sh.s) AS u(g)
), c AS (
  SELECT count(*) FILTER (m = 1) AS n_a,
         count(*) FILTER (m = 2) AS n_b,
         count(DISTINCT g) AS n_g
  FROM g
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(n_a + n_b - n_g AS BIGINT) AS n_intersect,
       CAST(n_g AS BIGINT) AS n_union,
       CAST(CASE WHEN n_g > 0
            THEN ((n_a + n_b - n_g) * 1000000) // n_g ELSE 0 END AS BIGINT)
         AS jaccard_micro
FROM c
"""
