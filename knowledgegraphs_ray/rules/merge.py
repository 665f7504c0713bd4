"""Ontology merge / consistency stage (E1-E5 analogue).

Reference: E_CreateKG/SetPOasDOextension.java — after mapping selection, the
putative ontology (PO) is merged into the domain ontology (DO): matched PO
classes become subclasses of their DO matches (E2, :120-228), PO elements
whose only value came from a data-property match are pruned and their data
property re-wired onto the table class (E3, :154-275), and the compiled
per-column paths are re-extracted (E5, InsertDataBase.java:84-152).

Here the "ontology" is the compiled RuleTable, so the merge is a pure
rule-table rewrite on the driver producing (a) subclass edges for the
hierarchy closure and (b) updated extraction plans whose predicates point at
DO IRIs where a match was selected — the kernels pick the rewrite up on the
next run (checkpoint kernel_version should be bumped).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from knowledgegraphs_ray.rules.compiler import DataEmit, LinkEmit, RuleTable, TypeEmit
from knowledgegraphs_ray.rules.hierarchy import Hierarchy


@dataclass
class Matches:
    """Selected PO -> DO alignment (reference D_MappingGeneration/Matches.java):
    src_iri -> (target iri(s), score)."""

    classes: dict[str, str] = field(default_factory=dict)
    object_props: dict[str, str] = field(default_factory=dict)
    data_props: dict[str, str] = field(default_factory=dict)


@dataclass
class MergeResult:
    rules: RuleTable
    subclass_edges: list[tuple[str, str]]
    pruned: list[str]

    def hierarchy(self) -> Hierarchy:
        return Hierarchy.build(self.subclass_edges)


def merge_po_into_do(rules: RuleTable, matches: Matches, *, rewrite_preds: bool = True) -> MergeResult:
    """E2+E3+E5: subclass matched classes under DO, rewrite matched property
    predicates to the DO IRI, prune attr-classes whose only role was carrying
    a matched data property (their data prop re-wires to the table class)."""
    edges: list[tuple[str, str]] = []
    pruned: list[str] = []

    # E2 — matched PO class subClassOf DO class
    for po_cls, do_cls in sorted(matches.classes.items()):
        if po_cls in rules.classes:
            edges.append((po_cls, do_cls))

    # E3 — attr classes with a data-prop match but no class match: prune the
    # intermediate class; the data property attaches directly to the table
    # class (un-sets attr mode for that emit)
    for table, plan in rules.plans.items():
        new_emits = []
        for e in plan.emits:
            if (
                isinstance(e, DataEmit)
                and e.attr_cls is not None
                and e.pred in matches.data_props
                and e.attr_cls not in matches.classes
            ):
                pruned.append(e.attr_cls)
                rules.classes.pop(e.attr_cls, None)
                if e.attr_pred:
                    rules.object_props.pop(e.attr_pred, None)
                e = DataEmit(col=e.col, pred=e.pred, dtype=e.dtype)
            new_emits.append(e)
        plan.emits = new_emits

    # E5 rewrite — selected matches replace the PO predicate in the compiled
    # plans (the kernels then emit DO IRIs directly; deterministic, so the
    # rewrite is a kernel_version bump, not a data migration)
    if rewrite_preds:
        for plan in rules.plans.values():
            new_emits = []
            for e in plan.emits:
                if isinstance(e, LinkEmit) and e.pred in matches.object_props:
                    e = LinkEmit(
                        col=e.col,
                        pred=matches.object_props[e.pred],
                        ref_table=e.ref_table,
                        inverse_pred=e.inverse_pred,
                    )
                elif isinstance(e, DataEmit) and e.pred in matches.data_props:
                    e = DataEmit(
                        col=e.col,
                        pred=matches.data_props[e.pred],
                        dtype=e.dtype,
                        attr_cls=e.attr_cls,
                        attr_pred=e.attr_pred,
                    )
                elif isinstance(e, TypeEmit) and e.cls in matches.classes:
                    # instances typed with the more specific PO class keep it;
                    # the subclass edge carries the DO semantics (E2)
                    pass
                new_emits.append(e)
            plan.emits = new_emits

    return MergeResult(rules=rules, subclass_edges=edges, pruned=pruned)
