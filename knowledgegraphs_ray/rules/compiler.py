"""Schema -> ontology rule compiler.

Re-expresses the reference's "Putative Ontology" extraction rules
(reference: C_POextractor/RDB2OWL/ClassExtractor.java:25-88,
ObjectPropExtractor.java:34-134, DataPropExtractor.java:34-62, naming per
util/Annotations.java:41-121) as a *compile step* that runs once on the driver
over the (tiny) schema and emits:

* a small ontology description (classes / object props / data props), and
* a per-table **extraction plan** — the compiled list of triple-emission
  specs that the vectorized kernel (`extract.kernel`) applies to every Arrow
  batch. This is the analogue of the reference's per-column "paths"
  (E_CreateKG/InsertDataBase.java:84-152) compiled ahead of the data walk.

The plan is pure data (dataclasses), cheap to pickle into Ray tasks, and the
kernels derived from it are pure functions — deterministic IRIs mean task
retries are idempotent (no global counters, unlike InsertDataJSON.java:33-52).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from knowledgegraphs_ray.schema.model import SchemaGraph, TableSchema

# Null sentinels — TabularFilesReader.java:34, applied again at insert time
# (InsertDataBase.java:190-192).
NULL_SENTINELS = ("none", "null", "", " ", "-")

KG = "kg:"  # compact IRI prefix for minted resources
RDF_TYPE = "rdf:type"

_SANITIZE_RE = re.compile(r"[/\\%# ]")


def sanitize(name: str) -> str:
    """IRI-safe resource name — Annotations.java:114-121."""
    return _SANITIZE_RE.sub("_", name)


def class_iri(table: str) -> str:
    return KG + sanitize(table.capitalize())


def obj_prop_iri(src_table: str, ref_table: str) -> str:
    # naming per the reference's p_<domain>_<range> convention
    # (Annotations.java pureObjPropName; fixture example p_person_account)
    return KG + f"p_{sanitize(src_table)}_{sanitize(ref_table)}"


def data_prop_iri(col: str, attrs_to_classes: bool) -> str:
    # DataPropExtractor.java:34-62 — has_<col> (direct) or has_<col>_VALUE
    # (when the column becomes an attribute class).
    base = KG + f"has_{sanitize(col)}"
    return base + "_VALUE" if attrs_to_classes else base


def attr_class_iri(table: str, col: str) -> str:
    return KG + sanitize(f"{table.capitalize()}_{col}")


@dataclass(frozen=True)
class TypeEmit:
    """row -> (row_iri, rdf:type, class_iri)."""

    cls: str


@dataclass(frozen=True)
class LinkEmit:
    """FK column -> (row_iri, pred, kg:<ref_table>/<fk_value>) link triples.

    Replaces the reference's row-at-a-time ref-table lookup join
    (InsertDataRDB.java:197-211): deterministic PK-derived IRIs let us mint the
    target IRI directly from the FK value — NO shuffle, no lookup. An optional
    validation semi-join (broadcast PK set) can drop dangling links.
    """

    col: str
    pred: str
    ref_table: str
    inverse_pred: str | None = None


@dataclass(frozen=True)
class DataEmit:
    """Data column -> literal triple(s).

    Direct mode: (row_iri, has_col, literal).
    Attribute-class mode (turnAttributesToClasses, DataPropExtractor.java:34-46):
    (row_iri, has_col, attr_iri), (attr_iri, rdf:type, AttrClass),
    (attr_iri, has_col_VALUE, literal) with attr_iri = row_iri + '/' + col.
    """

    col: str
    pred: str
    dtype: str  # logical type driving literal formatting
    attr_cls: str | None = None
    attr_pred: str | None = None  # has_col object property when attr_cls is set


@dataclass
class TablePlan:
    table: str
    cls: str
    pk_cols: list[str]
    emits: list[TypeEmit | LinkEmit | DataEmit] = field(default_factory=list)

    @property
    def needed_columns(self) -> list[str]:
        """Columns the kernel actually reads — drives read_parquet pruning."""
        cols: list[str] = list(self.pk_cols)
        for e in self.emits:
            if isinstance(e, (LinkEmit, DataEmit)) and e.col not in cols:
                cols.append(e.col)
        return cols


@dataclass
class RuleTable:
    """Compiled ontology + extraction plans for one dataset."""

    classes: dict[str, str] = field(default_factory=dict)  # class_iri -> source table
    object_props: dict[str, tuple[str, str]] = field(default_factory=dict)  # iri -> (dom, ran)
    data_props: dict[str, tuple[str, str]] = field(default_factory=dict)  # iri -> (dom, dtype)
    plans: dict[str, TablePlan] = field(default_factory=dict)


def _class_rule_applies(t: TableSchema) -> bool:
    """classRule2 — ClassExtractor.java:50-60: a table maps to a class if it
    has a single PK, or PK∩FK nonempty, or (a simple attribute and PK⊆FK)."""
    if len(t.pks) == 1 and not t.pk_inter_fk:
        return True
    if t.pk_inter_fk:
        return True
    has_simple_attr = any(t.is_simple_attribute(c) for c in t.columns)
    return has_simple_attr and t.pk_set <= t.fk_set


def longest_common_substring(names: list[str]) -> str:
    """classRule1 group naming — ClassExtractor.java:63-88: the class of a
    PKs==FKs table group is the longest common substring of member names,
    falling back to a ``_`` join."""
    if not names:
        return ""
    base = min(names, key=len)
    best = ""
    for i in range(len(base)):
        for j in range(i + len(best) + 1, len(base) + 1):
            sub = base[i:j]
            if all(sub in n for n in names):
                best = sub
            else:
                break
    best = best.strip("_")
    return best if best else "_".join(names)


def compile_rules(
    g: SchemaGraph,
    *,
    attrs_to_classes: bool = False,
    include_inverse: bool = False,
) -> RuleTable:
    """Apply the class/property rules to the schema and compile table plans.

    attrs_to_classes mirrors the reference's ``turnAttributesToClasses`` config
    (Config.java / DataPropExtractor.java:34-46); include_inverse mirrors
    ``includeInverseAxioms`` (ObjectPropExtractor inverse emission).
    """
    rt = RuleTable()

    # classRule1 — ClassExtractor.java:25-46: tables whose PKs == FKs chain
    # through their FK refs into one class group.
    pure_join_tables = {
        name: t for name, t in g.tables.items() if t.pk_set and t.pk_set == t.fk_set
    }
    grouped: dict[str, str] = {}  # table -> group class name
    if pure_join_tables:
        # union-find over FK reachability among the pure-join tables
        parent = {n: n for n in pure_join_tables}

        def find(x: str) -> str:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for name, t in pure_join_tables.items():
            for fk in t.fks.values():
                if fk.ref_table in pure_join_tables:
                    parent[find(name)] = find(fk.ref_table)
        comps: dict[str, list[str]] = {}
        for n in pure_join_tables:
            comps.setdefault(find(n), []).append(n)
        for members in comps.values():
            gname = longest_common_substring(sorted(members))
            for m in members:
                grouped[m] = gname

    for name, t in g.tables.items():
        if name in grouped:
            cname = grouped[name]
        elif _class_rule_applies(t):
            cname = name
        else:
            continue
        ciri = class_iri(cname)
        rt.classes[ciri] = name
        plan = TablePlan(table=name, cls=ciri, pk_cols=list(t.pks))
        plan.emits.append(TypeEmit(ciri))

        # object properties from FK columns.
        # objPropRule1 (ObjectPropExtractor.java:34-46): non-PK FK column ->
        # property thisClass -> refClass; objPropRule2-4 (48-85): PK∩FK bridge
        # columns also link to each referenced class. Both reduce to: every FK
        # column emits one link property to its referenced table's class.
        for col, fk in t.fks.items():
            piri = obj_prop_iri(cname, fk.ref_table)
            rt.object_props[piri] = (ciri, class_iri(fk.ref_table))
            inv = None
            if include_inverse:
                inv = obj_prop_iri(fk.ref_table, cname) + "_inv"
                rt.object_props[inv] = (class_iri(fk.ref_table), ciri)
            plan.emits.append(LinkEmit(col=col, pred=piri, ref_table=fk.ref_table, inverse_pred=inv))

        # data properties from simple-attribute columns
        # (DataPropExtractor.java:34-62). A column whose sanitized name clashes
        # with a class name gets the _ATTR suffix (Annotations.java:41-78).
        class_names = {sanitize(n) for n in g.tables}
        for col in t.columns:
            if not t.is_simple_attribute(col):
                continue
            col_label = col + "_ATTR" if sanitize(col) in class_names else col
            dtype = t.columns[col]
            dpred = data_prop_iri(col_label, attrs_to_classes)
            if attrs_to_classes:
                aciri = attr_class_iri(cname, col_label)
                apred = KG + f"has_{sanitize(col_label)}"
                rt.classes.setdefault(aciri, name)
                rt.object_props[apred] = (ciri, aciri)
                rt.data_props[dpred] = (aciri, dtype)
                plan.emits.append(
                    DataEmit(col=col, pred=dpred, dtype=dtype, attr_cls=aciri, attr_pred=apred)
                )
            else:
                rt.data_props[dpred] = (ciri, dtype)
                plan.emits.append(DataEmit(col=col, pred=dpred, dtype=dtype))

        rt.plans[name] = plan

    return rt
