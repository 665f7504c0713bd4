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


def symmetric_prop_iri(cname: str) -> str:
    # Annotations.java:56-58 symmetricObjPropName — has_<className>
    return KG + f"has_{sanitize(cname)}"


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
class PureProp:
    """DomRan record of a pure object property (Properties.java:10-48):
    repeated registrations under the same name union their domains/ranges."""

    rules: set[str] = field(default_factory=set)
    domains: set[str] = field(default_factory=set)
    ranges: set[str] = field(default_factory=set)


@dataclass
class RuleTable:
    """Compiled ontology + extraction plans for one dataset."""

    classes: dict[str, str] = field(default_factory=dict)  # class_iri -> source table
    object_props: dict[str, tuple[str, str]] = field(default_factory=dict)  # iri -> (dom, ran)
    data_props: dict[str, tuple[str, str]] = field(default_factory=dict)  # iri -> (dom, dtype)
    plans: dict[str, TablePlan] = field(default_factory=dict)
    # full DomRan union per property (rules 1-8); object_props keeps the
    # first-registered (dom, ran) pair for compatibility
    pure_props: dict[str, PureProp] = field(default_factory=dict)
    # object properties minted for attribute classes (has_<col>) — kept
    # apart so hierarchy derivation doesn't confuse them with the
    # symmetric has_<Class> props of rules 6/7
    attr_props: set[str] = field(default_factory=set)

    def add_pure(self, rule: str, name: str, dom: str, ran: str) -> None:
        p = self.pure_props.setdefault(name, PureProp())
        p.rules.add(rule)
        p.domains.add(dom)
        p.ranges.add(ran)
        self.object_props.setdefault(name, (dom, ran))


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

    # ----- pass 1: table -> class name (classRule1 groups + classRule2) -----
    table_class: dict[str, str] = {}
    for name, t in g.tables.items():
        if name in grouped:
            table_class[name] = grouped[name]
        elif _class_rule_applies(t):
            table_class[name] = name

    def cname_of(table: str) -> str | None:
        """Class name of a table; None if the table exists but maps to no
        class (reference isClass). A ref table OUTSIDE the schema subset is
        treated as a virtual class named after itself — subset schemas (a
        fact table without its dimensions) keep their FK links, minting
        the dimension IRIs that the full schema would (deterministic IRIs
        make the two runs consistent)."""
        if table in table_class:
            return table_class[table]
        if table not in g.tables:
            return table
        return None

    for name, cname in table_class.items():
        rt.classes[class_iri(cname)] = name

    # ----- pass 2: pure object properties, rules 1-8 ------------------------
    # (ObjectPropExtractor.java:34-134, one rule method per block; property
    # names use pureObjPropName p_<domainClass>_<rangeClass> and
    # symmetricObjPropName has_<class>; repeated names union DomRan.)
    def fk_pk_difference(t: TableSchema) -> set[str]:
        # RTable.java:108-117: "refTable.refColumn" strings of non-PK FK cols
        return {
            f"{fk.ref_table}.{fk.ref_column}"
            for col, fk in t.fks.items()
            if col not in t.pk_set
        }

    for name, t in g.tables.items():
        this = cname_of(name)

        # rule 1: non-PK FK column whose target is the ref table's PK ->
        # p_this_other AND the inverse p_other_this (ObjectPropExtractor:34-46)
        for col, fk in t.fks.items():
            other = cname_of(fk.ref_table)
            ref_pk_ok = (
                fk.ref_table not in g.tables  # virtual dimension: assume PK
                or fk.ref_column in g[fk.ref_table].pks
            )
            if (
                this is not None
                and other is not None
                and this != other
                and col not in t.pk_set
                and ref_pk_ok
            ):
                rt.add_pure(
                    "r1", obj_prop_iri(this, other), class_iri(this), class_iri(other)
                )
                rt.add_pure(
                    "r1 inv",
                    obj_prop_iri(other, this),
                    class_iri(other),
                    class_iri(this),
                )

        # rule 2: composite-PK table with PK∩FK keys and extra columns ->
        # p_this_other per bridged key (ObjectPropExtractor:48-60)
        if (
            this is not None
            and len(t.pks) > 1
            and t.pk_inter_fk
            and len(t.columns) > len(t.pks)
        ):
            for key in sorted(t.pk_inter_fk):
                other = cname_of(t.fks[key].ref_table)
                if other is not None and other != this:
                    rt.add_pure(
                        "r2",
                        obj_prop_iri(this, other),
                        class_iri(this),
                        class_iri(other),
                    )

        # rules 3/4: PKs ⊆ FKs (join table) -> pairwise props between the
        # referenced classes (both directions), and refClass -> thisClass
        # (ObjectPropExtractor:62-85)
        if t.pk_set and t.pk_set <= t.fk_set:
            fks = list(t.fks.values())
            for fkp1 in fks:
                c1 = cname_of(fkp1.ref_table)
                if c1 is None:
                    continue
                for fkp2 in fks:
                    c2 = cname_of(fkp2.ref_table)
                    if c2 is not None and c1 != c2:
                        rt.add_pure(
                            "r3", obj_prop_iri(c1, c2), class_iri(c1), class_iri(c2)
                        )
                    if this is not None:
                        if this != c1:
                            rt.add_pure(
                                "r4",
                                obj_prop_iri(c1, this),
                                class_iri(c1),
                                class_iri(this),
                            )
                        if c2 is not None and this != c2:
                            rt.add_pure(
                                "r4",
                                obj_prop_iri(c2, this),
                                class_iri(c2),
                                class_iri(this),
                            )

        # rule 6: even-sized PK all referencing ONE class -> symmetric
        # has_<class> (ObjectPropExtractor:87-103)
        if len(t.pks) % 2 == 0 and t.pk_set and t.pk_set <= t.fk_set:
            ref_classes = {cname_of(t.fks[k].ref_table) for k in t.pk_inter_fk}
            if len(ref_classes) == 1:
                (c,) = ref_classes
                if c is not None:
                    rt.add_pure(
                        "r6", symmetric_prop_iri(c), class_iri(c), class_iri(c)
                    )

        # rule 7: self-referencing FK onto the table's own PK -> symmetric
        # has_<thisClass> (ObjectPropExtractor:105-115)
        if this is not None:
            for col, fk in t.fks.items():
                if fk.ref_table == name and fk.ref_column in t.pks:
                    rt.add_pure(
                        "r7", symmetric_prop_iri(this), class_iri(this), class_iri(this)
                    )

        # rule 8: two tables sharing a non-PK FK target -> p_this_other
        # (both directions, via the outer loop over tables;
        # ObjectPropExtractor:117-134)
        if this is not None:
            diff = fk_pk_difference(t)
            if diff:
                for name2, t2 in g.tables.items():
                    other = cname_of(name2)
                    if other is None or other == this:
                        continue
                    if diff & fk_pk_difference(t2):
                        rt.add_pure(
                            "r8",
                            obj_prop_iri(this, other),
                            class_iri(this),
                            class_iri(other),
                        )

    # ----- pass 3: per-table extraction plans -------------------------------
    # Mirrors InsertDataRDB.addForeignKeysToPaths (InsertDataRDB.java:47-64):
    # an FK column emits link triples ONLY IF the corresponding property
    # exists in the compiled ontology — p_<thisClass>_<refClass>, or the
    # symmetric has_<thisClass> for a self-reference. Rules 3/4/6/8 enrich
    # the ontology surface but (as in the reference) are not instantiated
    # from join-table rows.
    class_names = {sanitize(n) for n in g.tables}
    for name, t in g.tables.items():
        this = cname_of(name)
        if this is None:
            continue
        ciri = class_iri(this)
        plan = TablePlan(table=name, cls=ciri, pk_cols=list(t.pks))
        plan.emits.append(TypeEmit(ciri))

        for col, fk in t.fks.items():
            if fk.ref_table == name:
                piri = symmetric_prop_iri(this)
            else:
                other = cname_of(fk.ref_table)
                piri = obj_prop_iri(this, other) if other is not None else None
            if piri is None or piri not in rt.pure_props:
                continue  # no compiled property for this FK column
            inv = None
            if include_inverse and fk.ref_table != name:
                inv_name = obj_prop_iri(cname_of(fk.ref_table), this)
                if inv_name in rt.pure_props:
                    inv = inv_name
            plan.emits.append(
                LinkEmit(col=col, pred=piri, ref_table=fk.ref_table, inverse_pred=inv)
            )

        # data properties from simple-attribute columns
        # (DataPropExtractor.java:34-62). A column whose sanitized name clashes
        # with a class name gets the _ATTR suffix (Annotations.java:41-78).
        for col in t.columns:
            if not t.is_simple_attribute(col):
                continue
            col_label = col + "_ATTR" if sanitize(col) in class_names else col
            dtype = t.columns[col]
            dpred = data_prop_iri(col_label, attrs_to_classes)
            if attrs_to_classes:
                aciri = attr_class_iri(this, col_label)
                apred = KG + f"has_{sanitize(col_label)}"
                rt.classes.setdefault(aciri, name)
                rt.object_props[apred] = (ciri, aciri)
                rt.attr_props.add(apred)
                rt.data_props[dpred] = (aciri, dtype)
                plan.emits.append(
                    DataEmit(col=col, pred=dpred, dtype=dtype, attr_cls=aciri, attr_pred=apred)
                )
            else:
                rt.data_props[dpred] = (ciri, dtype)
                plan.emits.append(DataEmit(col=col, pred=dpred, dtype=dtype))

        rt.plans[name] = plan

    return rt
