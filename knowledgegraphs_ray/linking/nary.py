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


def _t5_optimal(g: pd.DataFrame) -> str | None:
    """selectOptimal (T5): min pj_rank, tie-break max bes, then iri order."""
    if g is None or g.empty:
        return None
    g = g.sort_values(
        ["pj_rank", "bes", "cand_iri"], ascending=[True, False, True], kind="mergesort"
    )
    return g.iloc[0]["cand_iri"]


def select_from_incompatible_paths(
    obj_cands: pd.DataFrame | None,
    cls_cands: pd.DataFrame | None,
    data_cands: pd.DataFrame | None,
    h: Hierarchy,
    *,
    ranges: dict[str, str] | None = None,
    domains: dict[str, str] | None = None,
    table_optimal: str | None = None,
    missing_domain_is_compatible: bool = True,
) -> tuple[str | None, str | None, str | None]:
    """MappingSelection.selectFromIncompatiblePaths (java :233-295): when a
    source element has BOTH object-property and class candidates whose
    optimal pair is NOT compatible, each of the BES and PJ criteria votes for
    its higher scorer; an unequal vote drops the loser. The data-property
    optimal is then constrained to candidates whose domain is compatible
    with whatever survived (class > obj-range > table)."""
    ranges = ranges or {}
    domains = domains or {}
    has_obj = obj_cands is not None and not obj_cands.empty
    has_cls = cls_cands is not None and not cls_cands.empty

    obj_opt = _t5_optimal(obj_cands) if has_obj else None
    cls_opt = _t5_optimal(cls_cands) if has_cls else None

    if has_obj and has_cls:
        obj_votes = cls_votes = 0
        for crit in ("bes", "pj"):
            o = float(obj_cands.loc[obj_cands["cand_iri"] == obj_opt, crit].iloc[0])
            c = float(cls_cands.loc[cls_cands["cand_iri"] == cls_opt, crit].iloc[0])
            mx = max(o, c)
            obj_votes += 1 if o == mx else 0
            cls_votes += 1 if c == mx else 0
        obj_range = ranges.get(obj_opt)
        compatible = obj_range is not None and h.are_compatible(obj_range, cls_opt)
        if obj_votes != cls_votes and not compatible:
            if obj_votes > cls_votes:
                cls_opt = None
            else:
                obj_opt = None

    data_opt = None
    if data_cands is not None and not data_cands.empty:
        compatible_domain = (
            cls_opt
            or (ranges.get(obj_opt) if obj_opt else None)
            or table_optimal
        )
        d = data_cands
        if compatible_domain is not None:
            # H6 classUsesDataProps (MappingSelection.java:631-661): domain
            # compatibility PLUS the owl:Restriction onProperty rescue for
            # candidates whose domain is missing/incompatible
            from knowledgegraphs_ray.rules.hierarchy import class_uses_data_props

            usable = class_uses_data_props(
                compatible_domain,
                list(d["cand_iri"]),
                h,
                domains=domains,
                missing_domain_is_compatible=missing_domain_is_compatible,
            )
            if usable:
                d = d[d["cand_iri"].isin(usable)]
        data_opt = _t5_optimal(d)

    return obj_opt, cls_opt, data_opt


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
