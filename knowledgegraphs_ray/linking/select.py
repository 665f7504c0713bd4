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

import re

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


_TGT_TOKEN_RE = re.compile(r"\b(?!has\b)\w+")


def overlap_ranking(
    mention: str,
    cand_iris: list[str],
    labels: dict[str, list[str]] | None = None,
) -> dict[str, int]:
    """T3 candidate ranking (mapping_prediction.py:368-402, steps 8.1-8.3):

    score(candidate) = max over its annotations of
    (# tgt tokens, len > 1, excluding 'has', found inside the mention text)
    / (# tgt tokens) — dense rank by (score desc, token-length desc), ties
    share a rank, score 0 gets NO rank (→ inf). Token presence uses plain
    substring containment (the reference's fuzz.partial_ratio == 100)."""
    scored: list[tuple[str, float, int]] = []
    for iri in cand_iris:
        annots = labels.get(iri) if labels else None
        if not annots:
            annots = [iri.split(":")[-1].replace("_", " ")]
        best = (0.0, 0)
        for tgt in annots:
            toks = _TGT_TOKEN_RE.findall(tgt)
            if not toks:
                continue
            score = sum(1 for t in toks if len(t) > 1 and t in mention) / len(toks)
            if (score, len(toks)) > best:
                best = (score, len(toks))
        scored.append((iri, best[0], best[1]))
    scored.sort(key=lambda x: (x[1], x[2]), reverse=True)
    ranking: dict[str, int] = {}
    cur, prev = 0, None
    for iri, s, length in scored:
        if s == 0:
            continue
        if (s, length) != prev:
            cur += 1
        ranking[iri] = cur
        prev = (s, length)
    return ranking


def salvage(
    g: pd.DataFrame,
    *,
    hi: float = BES_HI,
    keep: int = 10,
    perc_thrs: float = 0.5,
    num_raw_candidates: int = 200,
    labels: dict[str, list[str]] | None = None,
) -> pd.DataFrame:
    """T3 low-score salvage (mapping_prediction.py:405-450,
    get_low_score_candidates): when no candidate clears ``hi``,

    1. keep the top-``keep`` by bes;
    2. compute the token-overlap ranking (``overlap_ranking``);
    3. the best-bes candidate survives iff it has a rank or bes >= perc_thrs;
    4. every later candidate survives iff its bes is within ``perc_thrs``
       relative difference of the best AND (it has a rank or bes > perc_thrs),
       OR its rank improves on the best rank seen so far (which it then
       updates);
    5. unranked survivors get salvage_rank = num_raw_candidates + 1.
    """
    import math

    if (g["bes"] >= hi).any():
        return g
    g = g.sort_values(
        ["bes", "cand_iri"], ascending=[False, True], kind="mergesort"
    ).head(keep)
    g = g[g["bes"] != -1].reset_index(drop=True)
    if g.empty:
        g["salvage_rank"] = pd.Series([], dtype="int64")
        return g
    mention = str(g["mention"].iloc[0]) if "mention" in g.columns else ""
    ranking = overlap_ranking(mention, list(g["cand_iri"]), labels)

    best_bes = float(g["bes"].iloc[0])
    best_rank = ranking.get(g["cand_iri"].iloc[0], math.inf)
    kept: list[tuple[int, float]] = []  # (row index, rank)
    if best_rank < math.inf or best_bes >= perc_thrs:
        kept.append((0, best_rank))
    for i in range(1, len(g)):
        s = float(g["bes"].iloc[i])
        perc_diff = abs((s - best_bes) / best_bes) if best_bes else math.inf
        r = ranking.get(g["cand_iri"].iloc[i], math.inf)
        suitable = (perc_diff < perc_thrs and (r < math.inf or s > perc_thrs)) or (
            r < math.inf and r <= best_rank
        )
        if suitable:
            kept.append((i, r))
            best_rank = min(best_rank, r)
    out = g.loc[[i for i, _ in kept]].copy()
    out["salvage_rank"] = [
        num_raw_candidates + 1 if math.isinf(r) else int(r) for _, r in kept
    ]
    return out


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

    if mode == "salvage":
        fn = lambda g: salvage(g, **thresholds)
    else:
        fn = with_hierarchy if mode == "optimal" else (lambda g: topk(g, k))
    return scored.groupby(mention_col).map_groups(fn, batch_format="pandas")
