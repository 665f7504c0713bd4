"""Candidate ranking + mapping-selection rule cascade (pure functions).

Re-implements the selection math of the reference as unit-testable pandas
kernels applied per mention group (``groupby(mention).map_groups``):

* T1 — cross-batch top-k per source (mapping_prediction.py:236-273)
* T2 — BES/PJ ranking: PJRank = dense rank by (PJ desc, token-length desc),
  ties share a rank (extractBertMapMappings.py:84-97)
* T3 — low-score salvage: if no candidate >= hi threshold keep top-10 and
  re-rank by token containment (mapping_prediction.py:405-450, simplified)
* T4 — selectTableOptimal: keep BES>=hi OR (BES>=lo AND PJ>=hi), then min
  PJRank, then max PJPerc, first row wins (MappingSelection.java:134-153)
* T5 — selectOptimal: min PJRank, tie-break max BES
  (MappingSelection.java:219-227)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

# defaults mirror MappingSelection.java thresholds
BES_HI = 0.85
BES_LO = 0.60
PJ_HI = 0.5


def dense_rank_desc(values: pd.Series, tiebreak: pd.Series | None = None) -> pd.Series:
    """Dense rank, 1 = best (highest); ties share a rank (T2)."""
    if tiebreak is not None:
        key = list(zip(-values, -tiebreak))
        order = pd.Series(key, index=values.index)
        return order.rank(method="dense").astype(int)
    return (-values).rank(method="dense").astype(int)


def rank_candidates(g: pd.DataFrame) -> pd.DataFrame:
    """Add BESRank / PJRank / PJPerc columns to one mention's candidates."""
    g = g.copy()
    tok_len = g["cand_iri"].map(lambda s: len(s.split(":")[-1].split("_")))
    g["pj_rank"] = dense_rank_desc(g["pj"], tok_len.astype(float))
    g["bes_rank"] = dense_rank_desc(g["bes"])
    # PJPerc — share of candidates this PJ beats (percentile, T4 tiebreak)
    n = len(g)
    g["pj_perc"] = (g["pj"].rank(method="min") - 1) / max(n - 1, 1)
    return g


def salvage(g: pd.DataFrame, *, hi: float = BES_HI, keep: int = 10) -> pd.DataFrame:
    """T3: no candidate clears ``hi`` -> keep top-``keep`` by bes and re-rank
    by token containment (mention tokens fully inside the label tokens)."""
    if (g["bes"] >= hi).any():
        return g
    g = g.nlargest(keep, "bes").copy()
    def contains(row) -> float:
        m = set(str(row["mention"]).split())
        c = set(row["cand_iri"].split(":")[-1].replace("_", " ").split())
        return 1.0 if m and m <= c else 0.0
    g["containment"] = g.apply(contains, axis=1)
    return g.sort_values(["containment", "bes"], ascending=False, kind="mergesort")


def select_optimal(
    g: pd.DataFrame,
    *,
    bes_hi: float = BES_HI,
    bes_lo: float = BES_LO,
    pj_hi: float = PJ_HI,
) -> pd.DataFrame:
    """T4 cascade for one mention group -> 0 or 1 row."""
    g = rank_candidates(g)
    f = g[(g["bes"] >= bes_hi) | ((g["bes"] >= bes_lo) & (g["pj"] >= pj_hi))]
    if f.empty:
        return f
    f = f[f["pj_rank"] == f["pj_rank"].min()]
    f = f[f["pj_perc"] == f["pj_perc"].max()]
    # deterministic "first row wins": stable order by (bes desc, cand_iri)
    f = f.sort_values(["bes", "cand_iri"], ascending=[False, True], kind="mergesort")
    return f.head(1)


def topk(g: pd.DataFrame, k: int = 20, score_col: str = "bes") -> pd.DataFrame:
    """T1: per-mention top-k merge across batches (num_best_predictions)."""
    g = g.sort_values([score_col, "cand_iri"], ascending=[False, True], kind="mergesort")
    out = g.head(k).copy()
    out["rank"] = np.arange(1, len(out) + 1)
    return out


def select_links(
    scored: ray.data.Dataset,
    *,
    mention_col: str = "mention",
    mode: str = "optimal",
    k: int = 20,
    hierarchy=None,
    **thresholds,
) -> ray.data.Dataset:
    """groupby(mention) -> per-group selection kernel. The shuffle key is the
    mention string; candidate lists were already capped (<=200/mention), so
    group payloads stay small (SURVEY.md §7.5 cross-batch top-k note).

    ``hierarchy``: optional broadcast Hierarchy — candidates related through
    the ontology are pruned first (H4 considerHierarchies: specialize /
    generalize / sibling-best) before the threshold cascade."""

    def with_hierarchy(g: pd.DataFrame) -> pd.DataFrame:
        if hierarchy is not None and len(g) > 1:
            from knowledgegraphs_ray.rules.hierarchy import consider_hierarchies

            g = rank_candidates(g)
            g = consider_hierarchies(g, hierarchy)
        return select_optimal(g, **thresholds)

    fn = with_hierarchy if mode == "optimal" else (lambda g: topk(g, k))
    return scored.groupby(mention_col).map_groups(fn, batch_format="pandas")
