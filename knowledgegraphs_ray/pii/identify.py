"""PII identification (F-stage analogue).

Reference: PIIidentification.java — for every dataset element, look up its
matched DO classes' ancestors in a static do2dpv map (J6,
PIIidentification.java:158-191), group matches per (table, column), attach
DPV ancestor chains and set is_personal_data / is_identifying /
is_special_category flags from fixed DPV IRIs (P2,
PIIidentification.java:198-256).

Two layers here:

* ``identify_schema_pii`` — the faithful schema-level pass over the compiled
  mapping manifest (tiny, driver-side pure function + broadcast dicts);
* ``scan_value_pii`` (pii/scan.py) — the scale-relevant data-level scan for
  PII-shaped values inside text columns (vectorized RE2, oracle-checkable).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd

from knowledgegraphs_ray.rules.compiler import RuleTable
from knowledgegraphs_ray.rules.hierarchy import Hierarchy

# fixed DPV flag IRIs (PIIidentification semantics)
DPV_PERSONAL = "dpv:PersonalData"
DPV_IDENTIFYING = "dpv:Identifying"
DPV_SPECIAL = "dpv:SpecialCategoryPersonalData"

# default do2dpv cross-mapping: ontology label substrings -> DPV classes.
# (the reference ships a static DO->DPV table; ours keys on normalized
# property labels since the testdata DO is schema-derived)
DEFAULT_DO2DPV: dict[str, list[str]] = {
    "name": ["dpv:Name", DPV_IDENTIFYING, DPV_PERSONAL],
    "birth": ["dpv:DateOfBirth", DPV_IDENTIFYING, DPV_PERSONAL, DPV_SPECIAL],
    "address": ["dpv:Address", DPV_PERSONAL],
    "balance": ["dpv:FinancialAccount", DPV_PERSONAL],
    "acctbal": ["dpv:FinancialAccount", DPV_PERSONAL],
    "phone": ["dpv:TelephoneNumber", DPV_IDENTIFYING, DPV_PERSONAL],
    "email": ["dpv:EmailAddress", DPV_IDENTIFYING, DPV_PERSONAL],
}


@dataclass
class PIIResult:
    element: str  # table.column
    dpv_matches: list[str] = field(default_factory=list)
    is_personal_data: bool = False
    is_identifying: bool = False
    is_special_category: bool = False


def identify_schema_pii(
    rules: RuleTable,
    *,
    do2dpv: dict[str, list[str]] | None = None,
    hierarchy: Hierarchy | None = None,
    preflagged: dict[str, bool] | None = None,
) -> pd.DataFrame:
    """-> one row per flagged dataset element (P1/P2).

    ``preflagged``: columns marked isPii upstream but without a DPV match get
    personal-data-only entries (P3, PIIidentification.java:289-308)."""
    mapping = do2dpv or DEFAULT_DO2DPV
    results: dict[str, PIIResult] = {}

    for diri, (dom, _dtype) in sorted(rules.data_props.items()):
        label = diri.split(":", 1)[1].removeprefix("has_").removesuffix("_VALUE").lower()
        table = rules.classes.get(dom, dom)
        element = f"{table}.{label}"
        hits: list[str] = []
        for key, dpvs in mapping.items():
            if key in label:
                hits.extend(dpvs)
        if hierarchy is not None:
            # J6: ancestors of matched classes can also carry DPV mappings
            for anc in hierarchy.ancestors(dom):
                for key, dpvs in mapping.items():
                    if key in anc.lower():
                        hits.extend(dpvs)
        if not hits:
            continue
        seen: list[str] = []
        for hsh in hits:  # D3: drop duplicate matches, keep order
            if hsh not in seen:
                seen.append(hsh)
        r = results.setdefault(element, PIIResult(element))
        r.dpv_matches = seen
        r.is_personal_data = DPV_PERSONAL in seen
        r.is_identifying = DPV_IDENTIFYING in seen
        r.is_special_category = DPV_SPECIAL in seen

    for col, flag in (preflagged or {}).items():
        if flag and col not in results:
            results[col] = PIIResult(
                col, [DPV_PERSONAL], is_personal_data=True
            )

    rows = [
        {
            "element": r.element,
            "dpv_matches": ",".join(r.dpv_matches),
            "is_personal_data": r.is_personal_data,
            "is_identifying": r.is_identifying,
            "is_special_category": r.is_special_category,
        }
        for r in results.values()
    ]
    return (
        pd.DataFrame(rows)
        .sort_values("element")  # T7: sorted by dataset element
        .reset_index(drop=True)
    )
