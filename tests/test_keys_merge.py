"""Candidate-key/FK discovery (A1/J5) and ontology merge (E2/E3/E5)."""

import ray.data

from knowledgegraphs_ray.rules.compiler import DataEmit, LinkEmit, compile_rules
from knowledgegraphs_ray.rules.merge import Matches, merge_po_into_do
from knowledgegraphs_ray.schema.keys import candidate_keys, discover_fks
from knowledgegraphs_ray.schema.model import tpch_schema


def test_candidate_keys_customer(sf_dir):
    ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet")
    df = candidate_keys(ds).set_index("column")
    assert df.loc["c_custkey", "is_candidate_key"]
    assert not df.loc["c_mktsegment", "is_candidate_key"]
    assert not df.loc["c_nationkey", "is_candidate_key"]


def test_discover_fks(sf_dir):
    tables = {
        "orders": ray.data.read_parquet(f"{sf_dir}/orders.parquet"),
        "customer": ray.data.read_parquet(f"{sf_dir}/customer.parquet"),
    }
    fks = discover_fks(tables, {"customer": ["c_custkey"]})
    got = set(
        map(tuple, fks[["src_table", "src_column", "ref_table"]].itertuples(index=False))
    )
    assert ("orders", "o_custkey", "customer") in got


def test_merge_subclass_and_pred_rewrite():
    rules = compile_rules(tpch_schema(["customer", "nation"]))
    m = Matches(
        classes={"kg:Customer": "do:Client"},
        object_props={"kg:p_customer_nation": "do:hasCountry"},
        data_props={"kg:has_c_name": "do:name"},
    )
    res = merge_po_into_do(rules, m)
    assert ("kg:Customer", "do:Client") in res.subclass_edges
    plan = res.rules.plans["customer"]
    links = [e for e in plan.emits if isinstance(e, LinkEmit)]
    assert links[0].pred == "do:hasCountry"
    dnames = {e.pred for e in plan.emits if isinstance(e, DataEmit)}
    assert "do:name" in dnames and "kg:has_c_name" not in dnames
    assert res.hierarchy().is_ancestor("do:Client", "kg:Customer")


def test_merge_prunes_unmatched_attr_class():
    rules = compile_rules(tpch_schema(["region"]), attrs_to_classes=True)
    m = Matches(data_props={"kg:has_r_name_VALUE": "do:regionName"})
    res = merge_po_into_do(rules, m)
    assert "kg:Region_r_name" in res.pruned
    plan = res.rules.plans["region"]
    d = [e for e in plan.emits if isinstance(e, DataEmit)][0]
    # attr class gone: data property attaches directly to the table class
    assert d.attr_cls is None and d.pred == "do:regionName"


def test_distinct_counts_distributed_exact_path(sf_dir):
    """driver_limit=0 forces the distributed (column, value) groupby path —
    must agree exactly with the driver-merge fast path."""
    import pandas as pd
    import ray.data

    from knowledgegraphs_ray.schema.keys import distinct_counts

    ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet")
    a = distinct_counts(ds)
    b = distinct_counts(ds, driver_limit=0).astype(
        {"n_distinct": "int64", "n_rows": "int64"}
    )
    pd.testing.assert_frame_equal(a, b)


def test_distinct_counts_hll_close(sf_dir):
    """HLL tier estimates within a few percent of exact."""
    import ray.data

    from knowledgegraphs_ray.schema.keys import distinct_counts

    ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet")
    exact = distinct_counts(ds).set_index("column")["n_distinct"]
    est = distinct_counts(ds, approx=True).set_index("column")["n_distinct"]
    for c in exact.index:
        assert abs(est[c] - exact[c]) <= max(3, 0.05 * exact[c]), c


def test_hll_estimate_accuracy():
    import numpy as np

    from knowledgegraphs_ray.util.hll import (
        DEFAULT_P,
        hll_add_hashes,
        hll_estimate,
        hll_merge,
        hll_new,
    )

    rng = np.random.default_rng(11)
    for true_n in (100, 10_000, 1_000_000):
        h = rng.integers(0, 2**64, true_n, dtype=np.uint64)
        # split into two sketches and merge — mergeability check
        a = hll_add_hashes(hll_new(DEFAULT_P), h[: true_n // 2])
        b = hll_add_hashes(hll_new(DEFAULT_P), h[true_n // 2 :])
        est = hll_estimate(hll_merge(a, b))
        assert abs(est - true_n) / true_n < 0.06, (true_n, est)
