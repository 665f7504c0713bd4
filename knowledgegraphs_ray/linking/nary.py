"""N-ary mapping patterns + seed scoring (H5, X4).

H5 — findNaryPatterns (MappingSelection.java:351-436): when a source element
has both object-property candidates and class candidates, consider the
compatible (objProp, class) pairs (objProp range compatible with the class)
plus class-only rows; rank paths by summed PJRank; reject when the top is
ambiguous (two different minimal paths).

X4 — seed scores (InterpretHeaders.py:356-426): high-confidence
single-candidate selections become seeds; every remaining candidate gains a
mean-similarity-to-seeds score (excluding seeds of its own source), used as
an extra ranking signal.
"""

from __future__ import annotations

import pandas as pd

from knowledgegraphs_ray.linking.mentions import normalize_label
from knowledgegraphs_ray.linking.scorer import char_ngrams, jaccard
from knowledgegraphs_ray.rules.hierarchy import Hierarchy


def find_nary_patterns(
    obj_cands: pd.DataFrame,
    class_cands: pd.DataFrame,
    h: Hierarchy,
    ranges: dict[str, str],
) -> pd.DataFrame | None:
    """One source element's candidates -> the selected (obj_prop, cls) path.

    obj_cands: columns (cand_iri, pj_rank); class_cands: same.
    ranges: obj-prop iri -> declared range class.
    Returns a 1-row frame {obj_prop, cls, sum_pj_rank} or None when ambiguous
    / empty (MappingSelection rejects ambiguous tops)."""
    rows = []
    for _, oc in obj_cands.iterrows():
        ran = ranges.get(oc["cand_iri"])
        for _, cc in class_cands.iterrows():
            if ran is None or h.are_compatible(ran, cc["cand_iri"]):
                rows.append(
                    {
                        "obj_prop": oc["cand_iri"],
                        "cls": cc["cand_iri"],
                        "sum_pj_rank": int(oc["pj_rank"]) + int(cc["pj_rank"]),
                    }
                )
    # class-only rows: penalized by the worst object rank + 1 so a complete
    # (objProp, class) path always beats its class-only fallback
    penalty = (int(obj_cands["pj_rank"].max()) + 1) if len(obj_cands) else 1
    for _, cc in class_cands.iterrows():
        rows.append(
            {"obj_prop": None, "cls": cc["cand_iri"], "sum_pj_rank": int(cc["pj_rank"]) + penalty}
        )
    if not rows:
        return None
    df = pd.DataFrame(rows).sort_values(
        ["sum_pj_rank", "cls", "obj_prop"], kind="mergesort", na_position="last"
    )
    best = df.iloc[0]
    ties = df[df["sum_pj_rank"] == best["sum_pj_rank"]]
    distinct_paths = ties[["obj_prop", "cls"]].drop_duplicates()
    if len(distinct_paths) > 1:
        return None  # ambiguous top — reject (MappingSelection.java:420-436)
    return distinct_paths.head(1).assign(sum_pj_rank=best["sum_pj_rank"]).reset_index(drop=True)


def seed_scores(
    selections: pd.DataFrame,
    candidates: pd.DataFrame,
    *,
    seed_threshold: float = 0.9,
    mention_col: str = "mention",
    label_col: str = "cand_label",
) -> pd.DataFrame:
    """X4: selections with score >= threshold become seeds; every candidate
    row gains ``seed_score`` = mean char-ngram similarity of its label to the
    seed labels, excluding seeds that share its mention."""
    seeds = selections[selections["bes"] >= seed_threshold]
    seed_profiles = [
        (r[mention_col], char_ngrams(normalize_label(r[label_col])))
        for _, r in seeds.iterrows()
    ]
    out = candidates.copy()
    scores = []
    for _, r in out.iterrows():
        grams = char_ngrams(normalize_label(r[label_col]))
        others = [g for m, g in seed_profiles if m != r[mention_col]]
        scores.append(
            sum(jaccard(grams, g) for g in others) / len(others) if others else 0.0
        )
    out["seed_score"] = scores
    return out
