"""End-to-end oracle gate for the mapping-selection cascade (r3 verdict #2).

Builds a DETERMINISTIC synthetic candidate table from ``documents.doc_id``
(map-only generation — no external data) and drives the REAL selection
kernels end-to-end: T2 BES/PJ dense ranks (``rank_candidates``), H4
hierarchy-aware pruning (``consider_hierarchies`` — ISA specialize /
generalize, sibling-best, unrelated and beyond-depth pass-through), the T4
``selectTableOptimal`` threshold cascade (MappingSelection.java:134-153) and
the T3 low-score salvage (mapping_prediction.py:405-450). The DuckDB twin
(``mapping_selection_sql``) reproduces every branch with window functions
from the SAME value table, so the driver's rows+schema+hash compare checks
the cascade's semantics, not just its plumbing.

Scenario layout — ``gid = doc_id % 100`` picks the mention group,
``slot = (doc_id // 100) % 5`` the candidate, ``scen = gid % 5`` the branch:

* scen 0 — hi clause (bes >= 0.85) with PJ dense-rank ties, the token-length
  tiebreak, a rank-1 candidate that FAILS the threshold (rank before filter),
  and the final (bes desc, iri) pick among rank ties;
* scen 1 — lo clause (bes >= 0.60 AND pj >= 0.5): best-bes fails on pj,
  best-pj fails on bes, tie resolved by bes;
* scen 2 — salvage, three subs: row0 kept via overlap rank / via bes >= 0.5
  with no rank / row0 NOT kept; later rows kept via the perc-diff clause
  (ranked and unranked > 0.5), via the running-best-rank clause, dropped by
  both; a bes == -1 candidate dropped by the -1 filter; unranked survivors
  get salvage_rank = num_raw_candidates + 1 = 201.  The running ``best_rank``
  is provably the running MIN of overlap ranks in bes-desc order (any row
  that would lower the min satisfies the r <= best_rank clause and is kept),
  which is what the SQL twin's windowed min computes;
* scen 3 — ISA pairs: sub 0 specialize (child outranks ancestor -> ancestor
  dropped), sub 1 generalize (ancestor outranks -> child dropped; child
  listed FIRST to exercise the is_ancestor(b, a) branch);
* scen 4 — sub 0 sibling pair within DEPTH_THRS (single best survives by
  (pj_rank, -bes)), sub 1 related pair BEYOND the depth threshold (both
  survive and compete in T4). Unrelated low-score fillers ride along in
  scens 3/4 to exercise pass-through.

Scale shape: generation is map-only; selection is ONE groupby(mention)
shuffle of candidate groups capped at <= 200 rows/mention — the exact
production path of ``select_links``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from knowledgegraphs_ray.linking.select import select_links
from knowledgegraphs_ray.rules.hierarchy import Hierarchy

# ONE value table drives the engine generator AND the SQL twin:
# (scen, sub, slot, local_pattern ('#' -> gid), bes_micro, pj_micro)
VALUE_TABLE: list[tuple[int, int, int, str, int, int]] = [
    # scen 0 — hi clause, dense-rank ties + token-length tiebreak
    (0, 0, 0, "w0_a", 900000, 700000),
    (0, 0, 1, "w1", 880000, 700000),
    (0, 0, 2, "w2", 860000, 800000),
    (0, 0, 3, "w3x", 870000, 800000),
    (0, 0, 4, "w4", 500000, 900000),  # rank 1 but fails thresholds
    # scen 1 — lo clause
    (1, 0, 0, "v0", 700000, 600000),
    (1, 0, 1, "v1", 820000, 400000),  # best bes, fails pj_hi
    (1, 0, 2, "v2", 650000, 600000),  # rank tie with v0, loses on bes
    (1, 0, 3, "v3", 590000, 900000),  # best pj, fails bes_lo
    (1, 0, 4, "v4", 100000, 100000),
    # scen 2 / sub 0 — row0 kept via rank
    (2, 0, 0, "alpha_beta", 550000, 100000),
    (2, 0, 1, "zz_qq", 540000, 100000),  # unranked, kept via perc-diff + s>0.5
    (2, 0, 2, "alpha_beta_gamma", 200000, 100000),  # kept via r <= best_rank
    (2, 0, 3, "beta", 150000, 100000),  # dropped by both clauses
    (2, 0, 4, "gamma", -1000000, 100000),  # bes == -1 filter
    # scen 2 / sub 1 — row0 unranked, kept via bes >= 0.5
    (2, 1, 0, "qq_zz", 550000, 100000),
    (2, 1, 1, "zz_qq", 540000, 100000),
    (2, 1, 2, "alpha_beta_gamma", 200000, 100000),
    (2, 1, 3, "beta", 150000, 100000),
    (2, 1, 4, "gamma", -1000000, 100000),
    # scen 2 / sub 2 — row0 NOT kept (unranked, bes < 0.5)
    (2, 2, 0, "qq_zz", 450000, 100000),
    (2, 2, 1, "zz_qq", 440000, 100000),  # perc-diff ok but unranked and <= 0.5
    (2, 2, 2, "alpha_beta_gamma", 200000, 100000),  # kept, rank 1
    (2, 2, 3, "alpha_beta", 150000, 100000),  # rank 2 > best_rank -> dropped
    (2, 2, 4, "gamma", -1000000, 100000),
    # scen 3 / sub 0 — specialize: child (slot 1) outranks parent (slot 0)
    (3, 0, 0, "h#_base", 880000, 600000),
    (3, 0, 1, "h#_base_sub", 860000, 700000),
    (3, 0, 2, "u#_a", 300000, 200000),
    (3, 0, 3, "u#_b", 300000, 200000),
    (3, 0, 4, "u#_c", 300000, 200000),
    # scen 3 / sub 1 — generalize: child FIRST, ancestor (slot 1) outranks
    (3, 1, 0, "h#_base_sub", 900000, 600000),
    (3, 1, 1, "h#_base", 870000, 800000),
    (3, 1, 2, "u#_a", 300000, 200000),
    (3, 1, 3, "u#_b", 300000, 200000),
    (3, 1, 4, "u#_c", 300000, 200000),
    # scen 4 / sub 0 — siblings (depth 2 <= DEPTH_THRS): best by (rank, -bes)
    (4, 0, 0, "g#_p_sa", 870000, 700000),
    (4, 0, 1, "g#_p_sb", 880000, 700000),
    (4, 0, 2, "u#_a", 300000, 200000),
    (4, 0, 3, "u#_b", 300000, 200000),
    (4, 0, 4, "u#_c", 300000, 200000),
    # scen 4 / sub 1 — common ancestor at combined depth 4 > DEPTH_THRS
    (4, 1, 0, "d#_a", 880000, 700000),
    (4, 1, 1, "d#_b", 860000, 650000),
    (4, 1, 2, "u#_a", 300000, 200000),
    (4, 1, 3, "u#_b", 300000, 200000),
    (4, 1, 4, "u#_c", 300000, 200000),
]

_N = 5 * 3 * 5  # scen * sub * slot index space
_PRE = np.empty(_N, dtype=object)
_SUF = np.empty(_N, dtype=object)
_HAS = np.zeros(_N, dtype=bool)
_BES = np.zeros(_N, dtype=np.int64)
_PJ = np.zeros(_N, dtype=np.int64)
for _scen, _sub, _slot, _pat, _bes, _pj in VALUE_TABLE:
    _t = _scen * 15 + _sub * 5 + _slot
    _p, _sep, _s = _pat.partition("#")
    _PRE[_t], _SUF[_t], _HAS[_t] = _p, _s, bool(_sep)
    _BES[_t], _PJ[_t] = _bes, _pj

SALVAGE_SUFFIX = " alpha beta gamma"


def _subs(gid: np.ndarray) -> np.ndarray:
    scen = gid % 5
    return np.where(
        scen == 2, (gid // 5) % 3, np.where(scen >= 3, (gid // 5) % 2, 0)
    )


def build_candidates(batch: pa.Table) -> pd.DataFrame:
    """doc_id -> one synthetic candidate row (vectorized, map-only)."""
    i = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    gid = i % 100
    slot = (i // 100) % 5
    rep = i // 500
    scen = gid % 5
    sub = _subs(gid)
    key = gid + 100 * rep
    tidx = scen * 15 + sub * 5 + slot
    gs = pd.Series(gid).astype(str)
    local = (
        pd.Series(_PRE[tidx]).astype(str)
        + gs.where(pd.Series(_HAS[tidx]), "")
        + pd.Series(_SUF[tidx]).astype(str)
    )
    mention = (
        "m"
        + pd.Series(key).astype(str).str.zfill(5)
        + pd.Series(np.where(scen == 2, SALVAGE_SUFFIX, "")).astype(str)
    )
    bes_micro = _BES[tidx]
    pj_micro = _PJ[tidx]
    return pd.DataFrame(
        {
            "mention": mention,
            "cand_iri": "kg:" + local,
            "bes": bes_micro / 1e6,
            "pj": pj_micro / 1e6,
            "bes_micro": bes_micro,
            "pj_micro": pj_micro,
            "scen": scen.astype(np.int64),
        }
    )


def gate_hierarchy() -> Hierarchy:
    """The synthetic ontology behind scens 3/4 (node names are per-gid, so
    repetition groups at larger sf share the same relations by design)."""
    edges: list[tuple[str, str]] = []
    for gid in range(100):
        scen = gid % 5
        if scen == 3:
            edges.append((f"kg:h{gid}_base_sub", f"kg:h{gid}_base"))
        elif scen == 4:
            if (gid // 5) % 2 == 0:
                edges += [
                    (f"kg:g{gid}_p_sa", f"kg:g{gid}_p"),
                    (f"kg:g{gid}_p_sb", f"kg:g{gid}_p"),
                ]
            else:
                edges += [
                    (f"kg:d{gid}_a", f"kg:d{gid}_pa"),
                    (f"kg:d{gid}_pa", f"kg:d{gid}_top"),
                    (f"kg:d{gid}_b", f"kg:d{gid}_pb"),
                    (f"kg:d{gid}_pb", f"kg:d{gid}_top"),
                ]
    return Hierarchy.build(edges)


def mapping_selection(sf_dir: str) -> ray.data.Dataset:
    """-> (mention, stage, cand_iri, bes_micro, pj_micro, sel_rank)."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    cands = docs.map_batches(
        build_candidates, batch_format="pyarrow", zero_copy_batch=True
    )
    h = gate_hierarchy()

    opt = select_links(cands, mode="optimal", hierarchy=h)
    opt_rows = opt.map_batches(
        lambda df: pd.DataFrame(
            {
                "mention": df["mention"],
                "stage": "optimal",
                "cand_iri": df["cand_iri"],
                "bes_micro": df["bes_micro"].astype("int64"),
                "pj_micro": df["pj_micro"].astype("int64"),
                "sel_rank": df["pj_rank"].astype("int64"),
            }
        ),
        batch_format="pandas",
    )

    sal = select_links(cands.filter(expr="scen == 2"), mode="salvage")
    sal_rows = sal.map_batches(
        lambda df: pd.DataFrame(
            {
                "mention": df["mention"],
                "stage": "salvage",
                "cand_iri": df["cand_iri"],
                "bes_micro": df["bes_micro"].astype("int64"),
                "pj_micro": df["pj_micro"].astype("int64"),
                "sel_rank": df["salvage_rank"].astype("int64"),
            }
        ),
        batch_format="pandas",
    )
    return opt_rows.union(sal_rows)


def mapping_selection_sql() -> str:
    """DuckDB window-function twin of ``mapping_selection``."""
    vals = ",\n    ".join(
        f"({scen}, {sub}, {slot}, '{pat}', {bes}, {pj})"
        for scen, sub, slot, pat, bes, pj in VALUE_TABLE
    )
    return f"""
WITH params(scen, sub, slot, pat, bes_micro, pj_micro) AS (VALUES
    {vals}
),
b2 AS (
  SELECT doc_id % 100 AS gid,
         (doc_id // 100) % 5 AS slot,
         (doc_id % 100) % 5 AS scen,
         CASE WHEN (doc_id % 100) % 5 = 2 THEN ((doc_id % 100) // 5) % 3
              WHEN (doc_id % 100) % 5 >= 3 THEN ((doc_id % 100) // 5) % 2
              ELSE 0 END AS sub,
         (doc_id % 100) + 100 * (doc_id // 500) AS key
  FROM documents
),
cand AS (
  SELECT 'm' || lpad(CAST(b2.key AS VARCHAR), 5, '0') ||
           CASE WHEN b2.scen = 2 THEN '{SALVAGE_SUFFIX}' ELSE '' END AS mention,
         replace(p.pat, '#', CAST(b2.gid AS VARCHAR)) AS local,
         'kg:' || replace(p.pat, '#', CAST(b2.gid AS VARCHAR)) AS cand_iri,
         p.bes_micro, p.pj_micro,
         b2.scen, b2.sub, b2.slot
  FROM b2 JOIN params p ON p.scen = b2.scen AND p.sub = b2.sub AND p.slot = b2.slot
),
ranked AS (  -- T2 pre-prune dense ranks (token-length tiebreak)
  SELECT c.*, len(string_split(local, '_')) AS tok_len,
         dense_rank() OVER (
           PARTITION BY mention
           ORDER BY pj_micro DESC, len(string_split(local, '_')) DESC
         ) AS pj_rank0
  FROM cand c
),
pair AS (  -- the (slot0, slot1) hierarchy pair per scen-3/4 mention
  SELECT mention,
         max(CASE WHEN slot = 0 THEN pj_rank0 END) AS r0,
         max(CASE WHEN slot = 1 THEN pj_rank0 END) AS r1,
         max(CASE WHEN slot = 0 THEN bes_micro END) AS bes0,
         max(CASE WHEN slot = 1 THEN bes_micro END) AS bes1
  FROM ranked WHERE scen IN (3, 4) AND slot IN (0, 1)
  GROUP BY mention
),
pruned AS (  -- H4: specialize / generalize / sibling-best; others pass
  SELECT r.* FROM ranked r LEFT JOIN pair p USING (mention)
  WHERE NOT COALESCE(
    CASE
      WHEN r.scen = 3 AND r.sub = 0 THEN  -- parent slot0, child slot1
        (r.slot = 0 AND p.r1 <= p.r0) OR (r.slot = 1 AND p.r1 > p.r0)
      WHEN r.scen = 3 AND r.sub = 1 THEN  -- child slot0, parent slot1
        (r.slot = 1 AND p.r0 <= p.r1) OR (r.slot = 0 AND p.r0 > p.r1)
      WHEN r.scen = 4 AND r.sub = 0 THEN  -- siblings: keep min (rank, -bes)
        (r.slot = 0 AND (p.r0 > p.r1 OR (p.r0 = p.r1 AND p.bes0 < p.bes1))) OR
        (r.slot = 1 AND (p.r1 > p.r0 OR (p.r0 = p.r1 AND p.bes1 < p.bes0)))
      ELSE FALSE
    END, FALSE)
),
reranked AS (  -- T2 again on survivors (select_optimal re-ranks post-prune)
  SELECT *,
         dense_rank() OVER (PARTITION BY mention
                            ORDER BY pj_micro DESC, tok_len DESC) AS pj_rank,
         rank() OVER (PARTITION BY mention ORDER BY pj_micro ASC) AS mr,
         count(*) OVER (PARTITION BY mention) AS n
  FROM pruned
),
passing AS (  -- T4 threshold clauses
  SELECT *, CAST(mr - 1 AS DOUBLE) / greatest(n - 1, 1) AS pj_perc
  FROM reranked
  WHERE bes_micro >= 850000 OR (bes_micro >= 600000 AND pj_micro >= 500000)
),
sel AS (  -- T4 pick: min pj_rank, max pj_perc, then (bes desc, iri)
  SELECT mention, 'optimal' AS stage, cand_iri, bes_micro, pj_micro,
         pj_rank AS sel_rank
  FROM passing
  QUALIFY row_number() OVER (
    PARTITION BY mention
    ORDER BY pj_rank ASC, pj_perc DESC, bes_micro DESC, cand_iri ASC) = 1
),
s0 AS (  -- T3 salvage: top-keep by bes, then the -1 filter
  SELECT *, row_number() OVER (
           PARTITION BY mention ORDER BY bes_micro DESC, cand_iri ASC) AS rn
  FROM cand WHERE scen = 2
),
s1 AS (SELECT * FROM s0 WHERE rn <= 10 AND bes_micro <> -1000000),
sc AS (  -- overlap scoring from the iri local name (annots default)
  SELECT *,
    list_sum(list_transform(
      list_filter(string_split(local, '_'), t -> t <> 'has'),
      t -> CASE WHEN length(t) > 1 AND position(t IN mention) > 0
                THEN 1 ELSE 0 END)) AS score_num,
    len(list_filter(string_split(local, '_'), t -> t <> 'has')) AS ntoks
  FROM s1
),
rk AS (  -- dense rank by (score desc, ntoks desc); score 0 gets NO rank
  SELECT mention, cand_iri,
         dense_rank() OVER (
           PARTITION BY mention
           ORDER BY CAST(score_num AS DOUBLE) / ntoks DESC, ntoks DESC) AS r
  FROM sc WHERE score_num > 0 AND ntoks > 0
),
run AS (
  SELECT sc.*, rk.r,
         first_value(sc.bes_micro) OVER w AS best_bes_micro,
         min(COALESCE(rk.r, 1000000)) OVER (
           PARTITION BY sc.mention ORDER BY sc.bes_micro DESC, sc.cand_iri ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_min_r,
         row_number() OVER w AS seq
  FROM sc LEFT JOIN rk USING (mention, cand_iri)
  WINDOW w AS (PARTITION BY sc.mention
               ORDER BY sc.bes_micro DESC, sc.cand_iri ASC)
),
salvage_sel AS (
  SELECT mention, 'salvage' AS stage, cand_iri, bes_micro, pj_micro,
         COALESCE(r, 201) AS sel_rank
  FROM run
  WHERE CASE WHEN seq = 1 THEN (r IS NOT NULL OR bes_micro >= 500000)
        ELSE
          (abs((bes_micro / 1000000.0 - best_bes_micro / 1000000.0)
               / (best_bes_micro / 1000000.0)) < 0.5
           AND (r IS NOT NULL OR bes_micro / 1000000.0 > 0.5))
          OR (r IS NOT NULL AND r <= prev_min_r)
        END
)
SELECT mention, stage, cand_iri,
       CAST(bes_micro AS BIGINT) AS bes_micro,
       CAST(pj_micro AS BIGINT) AS pj_micro,
       CAST(sel_rank AS BIGINT) AS sel_rank
FROM (SELECT * FROM sel UNION ALL SELECT * FROM salvage_sel)
"""
