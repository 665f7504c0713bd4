"""Ontology hierarchy operators — ancestor closure + compatibility +
hierarchy-aware candidate grouping (H1-H5).

Reference: getAncestors BFS with depth (util/Ontology.java:174-209),
areCompatible (MappingSelection.java:603-627), considerHierarchies grouping
(MappingSelection.java:475-597). The ontology is small ⇒ the closure is
precomputed ONCE on the driver and broadcast (``ray.put``); every kernel math
over it is a pure function usable inside ``map_groups``.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

import pandas as pd


@dataclass
class Hierarchy:
    """parents: child -> set(direct parents). Closure computed on build.
    ``restrictions``: class -> owl:Restriction onProperty IRIs declared
    directly on that class (H6; inherited ones come via the closure)."""

    parents: dict[str, set[str]] = field(default_factory=dict)
    # iri -> {ancestor: min_depth}
    closure: dict[str, dict[str, int]] = field(default_factory=dict)
    restrictions: dict[str, set[str]] = field(default_factory=dict)

    @classmethod
    def build(
        cls,
        edges: list[tuple[str, str]],
        restrictions: list[tuple[str, str]] | None = None,
    ) -> "Hierarchy":
        """edges: (child, parent) pairs; restrictions: (class, onProperty)."""
        h = cls()
        for c, p in edges:
            h.parents.setdefault(c, set()).add(p)
            h.parents.setdefault(p, set())
        for node in h.parents:
            h.closure[node] = h._bfs(node)
        for c, prop in restrictions or []:
            h.restrictions.setdefault(c, set()).add(prop)
        return h

    def restriction_props(self, cls_iri: str) -> set[str]:
        """onProperty IRIs restricted on the class OR any superclass —
        the SPARQL of MappingSelection.java:643-653 (direct ∪ subClassOf+)."""
        props = set(self.restrictions.get(cls_iri, ()))
        for anc in self.ancestors(cls_iri):
            props |= self.restrictions.get(anc, set())
        return props

    def _bfs(self, start: str) -> dict[str, int]:
        """All ancestors with min depth; cycle-safe (Ontology.java:174-209)."""
        out: dict[str, int] = {}
        q = deque([(start, 0)])
        while q:
            node, d = q.popleft()
            for p in self.parents.get(node, ()):
                if p not in out or out[p] > d + 1:
                    out[p] = d + 1
                    q.append((p, d + 1))
        return out

    def ancestors(self, iri: str) -> dict[str, int]:
        return self.closure.get(iri, {})

    def is_ancestor(self, anc: str, node: str) -> bool:
        return anc in self.closure.get(node, {})

    def are_compatible(self, r1: str, r2: str) -> bool:
        """r1==r2 or ancestor-of either way (MappingSelection.java:603-627)."""
        return r1 == r2 or self.is_ancestor(r1, r2) or self.is_ancestor(r2, r1)

    def common_ancestor_depth(self, a: str, b: str) -> int | None:
        """Min combined depth of a shared ancestor (including one being the
        other's ancestor at its own depth)."""
        ca = dict(self.ancestors(a))
        ca[a] = 0
        cb = dict(self.ancestors(b))
        cb[b] = 0
        shared = set(ca) & set(cb)
        if not shared:
            return None
        return min(ca[s] + cb[s] for s in shared)

    def siblings(self) -> list[list[str]]:
        """Direct-children groups (>1) per parent — hard-negative groups
        (onto/ontology.py:412-442)."""
        kids: dict[str, list[str]] = {}
        for c, ps in self.parents.items():
            for p in ps:
                kids.setdefault(p, []).append(c)
        return [sorted(v) for v in kids.values() if len(v) > 1]


def class_uses_data_props(
    class_iri: str,
    candidates: list[str],
    h: Hierarchy,
    *,
    domains: dict[str, object] | None = None,
    missing_domain_is_compatible: bool = True,
) -> set[str]:
    """H6 — MappingSelection.java:631-661 ``classUsesDataProps``: which
    data-property candidates are usable on ``class_iri``.

    1. A candidate whose (inferred) domain is compatible with the class —
       equal or ancestor either way; union domains pass if ANY operand is
       compatible; a missing domain passes iff
       ``missing_domain_is_compatible`` — is kept.
    2. Remaining candidates are checked against the properties restricted on
       the class or its superclasses (``owl:Restriction owl:onProperty``,
       direct or via subClassOf+): a candidate compatible with any
       restriction property (equal or sub/super property, self counts) is
       also kept.

    ``domains``: candidate -> domain IRI | set of IRIs (union) | None.
    """
    domains = domains or {}
    compatible: set[str] = set()
    for cand in candidates:
        dom = domains.get(cand)
        if dom is None:
            if missing_domain_is_compatible:
                compatible.add(cand)
            continue
        ops = dom if isinstance(dom, (set, frozenset, list, tuple)) else [dom]
        if any(h.are_compatible(str(o), class_iri) for o in ops):
            compatible.add(cand)
    others = [c for c in candidates if c not in compatible]
    if others:
        restr = h.restriction_props(class_iri)
        for cand in others:
            if any(h.are_compatible(cand, rp) for rp in restr):
                compatible.add(cand)
    return compatible


DEPTH_THRS = 3  # MappingSelection DEPTH_THRS default


def consider_hierarchies(
    g: pd.DataFrame,
    h: Hierarchy,
    *,
    depth_thrs: int = DEPTH_THRS,
) -> pd.DataFrame:
    """H4 — hierarchy-aware candidate pruning for one mention group.

    Candidates related through a common ancestor within ``depth_thrs``:
    * ISA pairs (one is the other's ancestor): keep the CHILD if it beats or
      ties the ancestor's pj_rank (specialize), else keep the ancestor;
    * sibling pairs: keep the single best (min pj_rank, then max bes).
    Unrelated candidates pass through.
    """
    if len(g) < 2:
        return g
    g = g.reset_index(drop=True)
    drop: set[int] = set()
    for i in range(len(g)):
        for j in range(i + 1, len(g)):
            if i in drop or j in drop:
                continue
            a, b = g.loc[i, "cand_iri"], g.loc[j, "cand_iri"]
            if h.is_ancestor(a, b) or h.is_ancestor(b, a):
                child_idx, anc_idx = (j, i) if h.is_ancestor(a, b) else (i, j)
                if g.loc[child_idx, "pj_rank"] <= g.loc[anc_idx, "pj_rank"]:
                    drop.add(anc_idx)  # specialize
                else:
                    drop.add(child_idx)  # generalize to ancestor
            else:
                d = h.common_ancestor_depth(a, b)
                if d is not None and d <= depth_thrs:
                    # siblings: single best survives
                    key = lambda idx: (g.loc[idx, "pj_rank"], -g.loc[idx, "bes"])
                    drop.add(max((i, j), key=key))
    return g.drop(index=sorted(drop)).reset_index(drop=True)


def hierarchy_from_rules(rules) -> Hierarchy:
    """Subclass edges implied by the compiled rule table: attribute classes
    are children of their table class (DataPropExtractor semantics).

    Uses ``rules.attr_props`` to identify attribute-class links — the
    symmetric ``has_<Class>`` properties of objPropRules 6/7 share the
    ``has_`` prefix but are NOT subclass edges."""
    attr = getattr(rules, "attr_props", None)
    edges: list[tuple[str, str]] = []
    for piri, (dom, ran) in rules.object_props.items():
        is_attr = piri in attr if attr is not None else piri.startswith("kg:has_")
        if is_attr:
            edges.append((ran, dom))
    return Hierarchy.build(edges)
