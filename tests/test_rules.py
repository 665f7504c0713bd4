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
    assert link.inverse_pred == "kg:p_region_nation"  # reference inverse naming (Properties.java:34-36)


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


def test_obj_prop_rules_3_4_join_table():
    """ObjectPropExtractor.java:62-85 — a PK⊆FK join table mints pairwise
    properties between its referenced classes (both directions, r3) and
    refClass -> joinTableClass properties (r4)."""
    from knowledgegraphs_ray.schema.model import bridge_schema

    rt = compile_rules(bridge_schema())
    assert "r3" in rt.pure_props["kg:p_orders_part"].rules
    assert "r3" in rt.pure_props["kg:p_part_orders"].rules
    assert rt.pure_props["kg:p_orders_part"].domains == {"kg:Orders"}
    assert rt.pure_props["kg:p_orders_part"].ranges == {"kg:Part"}
    assert "r4" in rt.pure_props["kg:p_orders_orderpart"].rules
    assert "r4" in rt.pure_props["kg:p_part_orderpart"].rules


def test_obj_prop_rule_2_and_link_gating():
    """r2 fires for the join table (it has a non-key column), so its FK
    columns emit links; without the extra column NO property exists and the
    plan has no LinkEmits (addForeignKeysToPaths gating)."""
    from knowledgegraphs_ray.schema.model import bridge_schema

    rt = compile_rules(bridge_schema())
    links = {e.pred for e in rt.plans["orderpart"].emits if isinstance(e, LinkEmit)}
    assert links == {"kg:p_orderpart_orders", "kg:p_orderpart_part"}

    # strip the non-key column -> r2 can't fire -> no link props, no LinkEmits
    g = bridge_schema()
    del g["orderpart"].columns["l_quantity"]
    rt2 = compile_rules(g)
    assert "kg:p_orderpart_orders" not in rt2.pure_props
    assert not [e for e in rt2.plans["orderpart"].emits if isinstance(e, LinkEmit)]
    # r3/r4 ontology surface still present
    assert "kg:p_orders_part" in rt2.pure_props


def test_obj_prop_rule_6_symmetric_same_target():
    """ObjectPropExtractor.java:87-103 — even PK, all PK∩FK keys referencing
    the SAME class -> symmetric has_<class>."""
    g = SchemaGraph()
    g.add(TableSchema("city", {"c_id": "int", "c_name": "varchar"}, pks=["c_id"]))
    g.add(
        TableSchema(
            "city_pairs",
            {"a_id": "int", "b_id": "int"},
            pks=["a_id", "b_id"],
            fks={
                "a_id": FKPointer("city", "c_id"),
                "b_id": FKPointer("city", "c_id"),
            },
        )
    )
    rt = compile_rules(g)
    p = rt.pure_props["kg:has_city"]
    assert "r6" in p.rules
    assert p.domains == {"kg:City"} and p.ranges == {"kg:City"}


def test_obj_prop_rule_7_self_reference():
    """ObjectPropExtractor.java:105-115 — self-FK onto own PK -> symmetric
    has_<thisClass>, used as the link predicate of the self-FK column."""
    from knowledgegraphs_ray.schema.model import bridge_schema

    rt = compile_rules(bridge_schema())
    p = rt.pure_props["kg:has_nation_sibling"]
    assert "r7" in p.rules
    assert p.domains == {"kg:Nation_sibling"}
    link = [e for e in rt.plans["nation_sibling"].emits if isinstance(e, LinkEmit)]
    assert len(link) == 1 and link[0].pred == "kg:has_nation_sibling"


def test_obj_prop_rule_8_shared_fk_target():
    """ObjectPropExtractor.java:117-134 — customer and supplier share the
    non-PK FK target nation.n_nationkey -> p_customer_supplier both ways."""
    rt = compile_rules(tpch_schema())
    assert "r8" in rt.pure_props["kg:p_customer_supplier"].rules
    assert "r8" in rt.pure_props["kg:p_supplier_customer"].rules


def test_r1_registers_inverse_in_ontology():
    """r1 always registers the inverse property name in the ontology
    (Properties 'r1 inv'); data-side inverse emission stays behind
    include_inverse."""
    rt = compile_rules(tpch_schema(["nation", "region"]))
    assert "kg:p_region_nation" in rt.pure_props
    assert "r1 inv" in rt.pure_props["kg:p_region_nation"].rules
    link = [e for e in rt.plans["nation"].emits if isinstance(e, LinkEmit)][0]
    assert link.inverse_pred is None  # default: no inverse data triples
