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
    src_iri -> (target iri(s), score).

    ``paths``: PO property -> its selected DO mapping path (the Mapping
    pathURIs of the reference's mappings file); ``do_classes``: the DO's
    class IRIs (so the merge can tell a class-first path from a
    property-first one, reference ontology.getOntClass)."""

    classes: dict[str, str] = field(default_factory=dict)
    object_props: dict[str, str] = field(default_factory=dict)
    data_props: dict[str, str] = field(default_factory=dict)
    paths: dict[str, list[str]] = field(default_factory=dict)
    do_classes: set[str] = field(default_factory=set)


@dataclass
class MergeResult:
    rules: RuleTable
    subclass_edges: list[tuple[str, str]]
    pruned: list[str]
    # E4 bridge synthesis output: (new_prop, inverse_prop) pairs and the
    # someValuesFrom restrictions (class, onProperty, range)
    bridges: list[tuple[str, str]] = field(default_factory=list)
    restrictions: list[tuple[str, str, str]] = field(default_factory=list)

    def hierarchy(self) -> Hierarchy:
        return Hierarchy.build(
            self.subclass_edges, [(c, p) for c, p, _ in self.restrictions]
        )


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

    # E4 — SetPOasDOextension.java:537-590 (handleClassAsFirstPathNode):
    # when a column's selected mapping path STARTS with a DO class, the
    # reference mints a bridge property p_<TableClass>_<FirstClass>
    # (domain table class, range first class), its inverse
    # p_<FirstClass>_<TableClass> (set as inverseOf), and a someValuesFrom
    # restriction  tableClass ⊑ (bridge some firstClass).
    bridges: list[tuple[str, str]] = []
    restrictions: list[tuple[str, str, str]] = []
    from knowledgegraphs_ray.rules.compiler import KG

    def _local(iri: str) -> str:
        return iri.split("#")[-1].split("/")[-1].split(":")[-1]

    for plan in rules.plans.values():
        tbl_local = _local(plan.cls)
        for e in plan.emits:
            pred = getattr(e, "pred", None)
            path = matches.paths.get(pred) if pred else None
            if not path:
                continue
            first = path[0]
            if first not in matches.do_classes:
                continue  # first node is a property (or PO element): no bridge
            new_name = KG + f"p_{tbl_local}_{_local(first)}"
            inv_name = KG + f"p_{_local(first)}_{tbl_local}"
            if new_name in rules.object_props:
                continue  # already created (reference: property exists check)
            rules.add_pure("e4", new_name, plan.cls, first)
            rules.add_pure("e4 inv", inv_name, first, plan.cls)
            bridges.append((new_name, inv_name))
            restrictions.append((plan.cls, new_name, first))


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

    return MergeResult(
        rules=rules,
        subclass_edges=edges,
        pruned=pruned,
        bridges=bridges,
        restrictions=restrictions,
    )
