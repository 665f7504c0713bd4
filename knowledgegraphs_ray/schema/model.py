"""Relational schema model — the input to the rule compiler.

Re-expresses the reference's ``RelationalDB`` / ``RTable`` abstractions
(reference: B_InputDatasetProcessing/Tabular/RTable.java:5-43,100-127 and
RelationalDB.java:17-28) as plain dataclasses over Parquet tables. Unlike the
reference, no data lives here — only schema; data stays in ``ray.data.Dataset``
blocks and never touches the driver.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class FKPointer:
    """A foreign-key edge column -> (ref_table, ref_column).

    Reference: RTable.FKpointer (RTable.java:10-20).
    """

    ref_table: str
    ref_column: str


@dataclass
class TableSchema:
    """Schema of one logical table.

    Reference: RTable.java — ``columns: Map<name, sqlType>``, ``PKs``, ``FKs``
    plus the derived sets PK∩FK and FK−PK used by the class/property rules.
    """

    name: str
    columns: dict[str, str]  # column -> logical type (int/double/varchar/bool/timestamp/list)
    pks: list[str] = field(default_factory=list)
    fks: dict[str, FKPointer] = field(default_factory=dict)

    @property
    def pk_set(self) -> set[str]:
        return set(self.pks)

    @property
    def fk_set(self) -> set[str]:
        return set(self.fks)

    @property
    def pk_inter_fk(self) -> set[str]:
        # RTable.java:100-111 (getIntersection)
        return self.pk_set & self.fk_set

    @property
    def fk_minus_pk(self) -> set[str]:
        # RTable.java:113-127 (getDifference)
        return self.fk_set - self.pk_set

    def data_columns(self) -> list[str]:
        """Non-key columns — candidates for data properties (DataPropExtractor.java:34-62)."""
        keys = self.pk_set | self.fk_set
        return [c for c in self.columns if c not in keys]

    def is_simple_attribute(self, col: str) -> bool:
        return col not in self.pk_set and col not in self.fk_set


@dataclass
class SchemaGraph:
    """All table schemas of one dataset (reference: RelationalDB.java:17-28)."""

    tables: dict[str, TableSchema] = field(default_factory=dict)

    def add(self, t: TableSchema) -> None:
        self.tables[t.name] = t

    def __getitem__(self, name: str) -> TableSchema:
        return self.tables[name]

    def referencing(self, table: str) -> list[tuple[str, str]]:
        """(src_table, src_col) pairs whose FK points at ``table``."""
        out = []
        for t in self.tables.values():
            for col, fk in t.fks.items():
                if fk.ref_table == table:
                    out.append((t.name, col))
        return out


def tpch_schema(tables: list[str] | None = None) -> SchemaGraph:
    """Declared schema for the driver's TPC-H-ish testdata star schema.

    Mirrors what the reference obtains from JDBC metadata
    (RelationalDB.java:49-89) — here declared statically because Parquet has no
    FK metadata; ``schema.infer.discover_fks`` can re-derive the FK edges from
    data via containment joins (TabularSpecificRules.java:119-130).
    """
    g = SchemaGraph()
    defs: list[TableSchema] = [
        TableSchema(
            "region",
            {"r_regionkey": "int", "r_name": "varchar"},
            pks=["r_regionkey"],
        ),
        TableSchema(
            "nation",
            {"n_nationkey": "int", "n_name": "varchar", "n_regionkey": "int"},
            pks=["n_nationkey"],
            fks={"n_regionkey": FKPointer("region", "r_regionkey")},
        ),
        TableSchema(
            "customer",
            {
                "c_custkey": "int",
                "c_name": "varchar",
                "c_nationkey": "int",
                "c_acctbal": "double",
                "c_mktsegment": "varchar",
            },
            pks=["c_custkey"],
            fks={"c_nationkey": FKPointer("nation", "n_nationkey")},
        ),
        TableSchema(
            "supplier",
            {
                "s_suppkey": "int",
                "s_name": "varchar",
                "s_nationkey": "int",
                "s_acctbal": "double",
            },
            pks=["s_suppkey"],
            fks={"s_nationkey": FKPointer("nation", "n_nationkey")},
        ),
        TableSchema(
            "part",
            {
                "p_partkey": "int",
                "p_name": "varchar",
                "p_brand": "varchar",
                "p_type": "varchar",
                "p_size": "int",
                "p_retailprice": "double",
            },
            pks=["p_partkey"],
        ),
        TableSchema(
            "orders",
            {
                "o_orderkey": "int",
                "o_custkey": "int",
                "o_orderstatus": "varchar",
                "o_totalprice": "double",
                "o_orderdate": "timestamp",
                "o_orderpriority": "varchar",
            },
            pks=["o_orderkey"],
            fks={"o_custkey": FKPointer("customer", "c_custkey")},
        ),
        TableSchema(
            "lineitem",
            {
                "l_orderkey": "int",
                "l_partkey": "int",
                "l_suppkey": "int",
                "l_linenumber": "int",
                "l_quantity": "double",
                "l_extendedprice": "double",
                "l_discount": "double",
                "l_tax": "double",
                "l_returnflag": "varchar",
                "l_linestatus": "varchar",
                "l_shipdate": "timestamp",
            },
            pks=["l_orderkey", "l_linenumber"],
            fks={
                "l_orderkey": FKPointer("orders", "o_orderkey"),
                "l_partkey": FKPointer("part", "p_partkey"),
                "l_suppkey": FKPointer("supplier", "s_suppkey"),
            },
        ),
        TableSchema(
            "events",
            {
                "event_id": "int",
                "ts": "timestamp",
                "user_id": "int",
                "event_type": "varchar",
                "value": "double",
                "props": "varchar",
            },
            pks=["event_id"],
        ),
        TableSchema(
            "documents",
            {
                "doc_id": "int",
                "text": "varchar",
                "lang": "varchar",
                "source": "varchar",
                "n_chars": "int",
            },
            pks=["doc_id"],
        ),
    ]
    for t in defs:
        if tables is None or t.name in tables:
            g.add(t)
    return g


def bridge_schema() -> SchemaGraph:
    """Schema exercising objPropRules 3/4/6/7/8 (ObjectPropExtractor.java:62-134)
    over VIRTUAL tables derived from the driver's testdata:

    * ``orderpart`` — many-to-many join table (PK ⊆ FK): the (l_orderkey,
      l_partkey, l_quantity) projection of ``lineitem``. Rules 3/4 mint the
      pairwise p_orders_part / p_part_orders and p_orders_orderpart /
      p_part_orderpart ontology properties; rule 2 gives the table its own
      link properties (it has a non-key column).
    * ``nation_sibling`` — self-referencing table: nation plus a derived
      ``sibling_key = (n_nationkey + 1) % 25`` FK onto its own PK. Rule 7
      mints the symmetric ``has_nation_sibling``.
    """
    g = SchemaGraph()
    g.add(
        TableSchema(
            "orders",
            {"o_orderkey": "int", "o_orderstatus": "varchar"},
            pks=["o_orderkey"],
        )
    )
    g.add(
        TableSchema(
            "part",
            {"p_partkey": "int", "p_name": "varchar"},
            pks=["p_partkey"],
        )
    )
    g.add(
        TableSchema(
            "orderpart",
            {"l_orderkey": "int", "l_partkey": "int", "l_quantity": "double"},
            pks=["l_orderkey", "l_partkey"],
            fks={
                "l_orderkey": FKPointer("orders", "o_orderkey"),
                "l_partkey": FKPointer("part", "p_partkey"),
            },
        )
    )
    g.add(
        TableSchema(
            "nation_sibling",
            {"n_nationkey": "int", "n_name": "varchar", "sibling_key": "int"},
            pks=["n_nationkey"],
            fks={"sibling_key": FKPointer("nation_sibling", "n_nationkey")},
        )
    )
    return g


def transcript_schema() -> SchemaGraph:
    """Schema of the primary transcript input (BASELINE.json input_hint):
    (conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
    ts:timestamp). Modeled as a turn table whose conv_id is an FK into a
    virtual conversation table — the shape the rule compiler turns into
    Conversation/Turn classes + has_turn object property.
    """
    g = SchemaGraph()
    g.add(TableSchema("conversation", {"conv_id": "varchar"}, pks=["conv_id"]))
    g.add(
        TableSchema(
            "turn",
            {
                "conv_id": "varchar",
                "turn_idx": "int",
                "role": "varchar",
                "text": "varchar",
                "tool": "varchar",
                "ts": "timestamp",
            },
            pks=["conv_id", "turn_idx"],
            fks={"conv_id": FKPointer("conversation", "conv_id")},
        )
    )
    return g
