"""Unit tests for the schema -> ontology rule compiler (SURVEY.md §2.3)."""

from knowledgegraphs_ray.rules.compiler import (
    DataEmit,
    LinkEmit,
    TypeEmit,
    compile_rules,
    longest_common_substring,
    sanitize,
)
from knowledgegraphs_ray.schema.model import (
    FKPointer,
    SchemaGraph,
    TableSchema,
    tpch_schema,
    transcript_schema,
)


def test_sanitize_m8():
    # Annotations.java:114-121 — replace [/\%# ] with _
    assert sanitize("a/b\\c%d#e f") == "a_b_c_d_e_f"


def test_class_rule2_single_pk():
    rt = compile_rules(tpch_schema(["customer"]))
    assert "kg:Customer" in rt.classes
    plan = rt.plans["customer"]
    kinds = [type(e).__name__ for e in plan.emits]
    assert kinds[0] == "TypeEmit"
    # FK link + 3 data props (c_name, c_acctbal, c_mktsegment)
    assert sum(1 for e in plan.emits if isinstance(e, LinkEmit)) == 1
    assert sum(1 for e in plan.emits if isinstance(e, DataEmit)) == 3


def test_composite_pk_bridge_lineitem():
    rt = compile_rules(tpch_schema(["lineitem", "orders", "part", "supplier"]))
    plan = rt.plans["lineitem"]
    links = {e.pred for e in plan.emits if isinstance(e, LinkEmit)}
    assert links == {
        "kg:p_lineitem_orders",
        "kg:p_lineitem_part",
        "kg:p_lineitem_supplier",
    }
    assert plan.pk_cols == ["l_orderkey", "l_linenumber"]


def test_attr_classes_mode():
    rt = compile_rules(tpch_schema(["region"]), attrs_to_classes=True)
    plan = rt.plans["region"]
    d = [e for e in plan.emits if isinstance(e, DataEmit)][0]
    assert d.attr_cls == "kg:Region_r_name"
    assert d.pred == "kg:has_r_name_VALUE"
    assert d.attr_pred == "kg:has_r_name"


def test_inverse_props():
    rt = compile_rules(tpch_schema(["nation", "region"]), include_inverse=True)
    link = [e for e in rt.plans["nation"].emits if isinstance(e, LinkEmit)][0]
    assert link.inverse_pred == "kg:p_region_nation_inv"


def test_class_rule1_pure_join_tables():
    # ClassExtractor.java:25-46: tables whose PKs == FKs group into one class
    g = SchemaGraph()
    g.add(TableSchema("person", {"pid": "int", "name": "varchar"}, pks=["pid"]))
    g.add(
        TableSchema(
            "person_addr",
            {"pid": "int", "aid": "int"},
            pks=["pid", "aid"],
            fks={"pid": FKPointer("person", "pid"), "aid": FKPointer("addr", "aid")},
        )
    )
    g.add(TableSchema("addr", {"aid": "int", "city": "varchar"}, pks=["aid"]))
    rt = compile_rules(g)
    # the pure-join table still becomes a class (its own group of one)
    assert "person_addr" in rt.plans


def test_longest_common_substring():
    assert longest_common_substring(["order_item", "order_hist"]) == "order"
    assert longest_common_substring(["abc", "xyz"]) == "abc_xyz"


def test_transcript_schema_rules():
    rt = compile_rules(transcript_schema())
    assert "kg:Turn" in rt.classes and "kg:Conversation" in rt.classes
    link = [e for e in rt.plans["turn"].emits if isinstance(e, LinkEmit)][0]
    assert link.pred == "kg:p_turn_conversation"


def test_needed_columns_pruning():
    plan = compile_rules(tpch_schema(["orders"])).plans["orders"]
    assert set(plan.needed_columns) == {
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    }
