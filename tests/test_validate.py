"""Data-quality validation suite (schema/validate.py): per-rule semantics
(SQL null discipline), DuckDB-twin equivalence, fk broadcast vs anti-join
tier equivalence, and parallelism invariance."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray

from knowledgegraphs_ray.schema.validate import Rule, validate, validate_oracle_sql


def _frame():
    rng = np.random.default_rng(2)
    return pd.DataFrame(
        {
            "id": np.r_[np.arange(200), [3, 3, 9]].astype("int64"),
            "status": rng.choice(["O", "F", "P", "X", None], 203),
            "price": rng.uniform(-5, 120, 203),
            "code": rng.choice(["1-A", "5-Z", "bad", None], 203),
            "cust": rng.choice([1, 2, 3, 42], 203),
        }
    )


def _rules(ref_ds):
    return [
        Rule("id_not_null", "not_null", "id"),
        Rule("id_unique", "unique", "id"),
        Rule("status_vals", "accepted_values", "status", {"values": ["O", "F", "P"]}),
        Rule("price_range", "in_range", "price", {"lo": 0, "hi": 100}),
        Rule("code_fmt", "matches_regex", "code", {"pattern": "^[0-9]-"}),
        Rule("cust_fk", "fk", "cust", {"ref": ref_ds, "ref_col": "c_id"}),
    ]


def test_validate_matches_duckdb_twin_both_fk_tiers():
    df = _frame()
    ref = pd.DataFrame({"c_id": [1, 2, 3]})
    con = duckdb.connect()
    con.register("t", df)
    con.register("ref", ref)
    rules = _rules(ray.data.from_pandas(ref))
    want = (
        con.execute(
            validate_oracle_sql(
                "SELECT * FROM t", rules, ref_sqls={"cust_fk": "SELECT * FROM ref"}
            )
        )
        .df()
        .sort_values("rule")
        .reset_index(drop=True)
    )
    for nparts in (1, 7):
        got = (
            validate(ray.data.from_pandas(df).repartition(nparts), rules)
            .to_pandas()
            .sort_values("rule")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # forced anti-join fk tier
    got0 = (
        validate(
            ray.data.from_pandas(df).repartition(7), rules, fk_broadcast_limit=0
        )
        .to_pandas()
        .sort_values("rule")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got0, want, check_dtype=False)


def test_validate_null_semantics_hand_checked():
    # NULL violates only not_null; comparisons / IN / regex / fk skip NULLs;
    # unique counts count(col) - count(DISTINCT col) over non-nulls
    df = pd.DataFrame(
        {
            "x": [None, None, "a", "a", "b"],
            "n": [None, 5.0, -1.0, 2.0, 2.0],
        }
    )
    rules = [
        Rule("x_not_null", "not_null", "x"),
        Rule("x_unique", "unique", "x"),
        Rule("x_vals", "accepted_values", "x", {"values": ["a"]}),
        Rule("n_range", "in_range", "n", {"lo": 0, "hi": 4}),
    ]
    got = validate(ray.data.from_pandas(df), rules).to_pandas()
    rows = {r.rule: (r.violations, r.total) for r in got.itertuples()}
    assert rows["x_not_null"] == (2, 5)
    assert rows["x_unique"] == (1, 3)  # 3 non-null, 2 distinct
    assert rows["x_vals"] == (1, 5)  # only 'b'
    assert rows["n_range"] == (2, 5)  # -1 and 5; NULL skipped


def test_validate_rejects_bad_kind_and_dup_names():
    with pytest.raises(ValueError, match="unknown rule kind"):
        Rule("r", "nope", "x")
    df = pd.DataFrame({"x": [1]})
    with pytest.raises(ValueError, match="unique"):
        validate(
            ray.data.from_pandas(df),
            [Rule("r", "not_null", "x"), Rule("r", "not_null", "x")],
        )
