"""Hierarchy closure (H1-H5), PII identification (F-stage), window ops."""

import pandas as pd
import ray.data

from knowledgegraphs_ray.pii.identify import identify_schema_pii
from knowledgegraphs_ray.rules.compiler import compile_rules
from knowledgegraphs_ray.rules.hierarchy import Hierarchy, consider_hierarchies
from knowledgegraphs_ray.schema.model import tpch_schema
from knowledgegraphs_ray.streaming.windows import sessionize, tumbling_window_agg

EDGES = [
    ("kg:Dog", "kg:Mammal"),
    ("kg:Cat", "kg:Mammal"),
    ("kg:Mammal", "kg:Animal"),
    ("kg:Bird", "kg:Animal"),
]


def test_ancestors_with_depth():
    h = Hierarchy.build(EDGES)
    assert h.ancestors("kg:Dog") == {"kg:Mammal": 1, "kg:Animal": 2}
    assert h.is_ancestor("kg:Animal", "kg:Cat")
    assert not h.is_ancestor("kg:Dog", "kg:Cat")


def test_cycle_safe():
    h = Hierarchy.build([("a", "b"), ("b", "a")])
    assert h.ancestors("a") == {"b": 1, "a": 2}


def test_compatibility_and_siblings():
    h = Hierarchy.build(EDGES)
    assert h.are_compatible("kg:Dog", "kg:Mammal")
    assert not h.are_compatible("kg:Dog", "kg:Bird")
    assert ["kg:Cat", "kg:Dog"] in h.siblings()


def test_consider_hierarchies_specialize():
    h = Hierarchy.build(EDGES)
    g = pd.DataFrame(
        {
            "cand_iri": ["kg:Dog", "kg:Mammal"],
            "pj_rank": [1, 2],
            "bes": [0.9, 0.8],
        }
    )
    out = consider_hierarchies(g, h)
    assert out["cand_iri"].tolist() == ["kg:Dog"]  # child wins (specialize)

    g2 = pd.DataFrame(
        {"cand_iri": ["kg:Dog", "kg:Mammal"], "pj_rank": [3, 1], "bes": [0.5, 0.9]}
    )
    out2 = consider_hierarchies(g2, h)
    assert out2["cand_iri"].tolist() == ["kg:Mammal"]  # ancestor wins


def test_consider_hierarchies_siblings_single_best():
    h = Hierarchy.build(EDGES)
    g = pd.DataFrame(
        {"cand_iri": ["kg:Dog", "kg:Cat"], "pj_rank": [2, 1], "bes": [0.6, 0.9]}
    )
    out = consider_hierarchies(g, h)
    assert out["cand_iri"].tolist() == ["kg:Cat"]


def test_identify_schema_pii():
    rules = compile_rules(tpch_schema(["customer", "part"]))
    df = identify_schema_pii(rules)
    elems = dict(zip(df["element"], df["dpv_matches"]))
    assert "customer.c_name" in elems and "dpv:Name" in elems["customer.c_name"]
    assert "customer.c_acctbal" in elems  # acctbal -> FinancialAccount
    assert df[df["element"] == "customer.c_name"]["is_identifying"].iloc[0]
    # part.p_name also matches "name" (schema-level mapping is label-driven)
    assert "part.p_name" in elems
    # sorted by element (T7)
    assert df["element"].tolist() == sorted(df["element"].tolist())


def test_identify_pii_preflagged_append():
    rules = compile_rules(tpch_schema(["region"]))
    df = identify_schema_pii(rules, preflagged={"region.secret_col": True})
    row = df[df["element"] == "region.secret_col"].iloc[0]
    assert row["is_personal_data"] and row["dpv_matches"] == "dpv:PersonalData"


def _events():
    base = 1_700_000_000_000_000  # µs epoch
    rows = []
    for i, (uid, off_s, val) in enumerate(
        [
            (1, 0, 1.0),
            (1, 600, 2.5),      # same session (gap 10 min)
            (1, 600 + 3000, 4.0),  # gap 50 min -> new session
            (2, 100, 10.0),
        ]
    ):
        rows.append(
            {
                "event_id": i,
                "user_id": uid,
                "ts": pd.Timestamp(base + off_s * 1_000_000, unit="us"),
                "value": val,
            }
        )
    return ray.data.from_items(rows)


def test_sessionize():
    out = sessionize(_events(), gap_sec=1800).to_pandas()
    u1 = out[out["user_id"] == 1].sort_values("session_idx")
    assert u1["n_events"].tolist() == [2, 1]
    assert u1["sum_cents"].tolist() == [350, 400]
    assert len(out[out["user_id"] == 2]) == 1


def test_tumbling_window():
    out = tumbling_window_agg(_events(), window_sec=3600).to_pandas()
    u1 = out[out["user_id"] == 1].sort_values("window_start")
    # events at +0s, +600s land in one hour bucket; +3600s in the next
    assert u1["n_events"].tolist() == [2, 1]
    assert u1["sum_cents"].tolist() == [350, 400]


def test_sessionize_scan_matches_group_strategy(sf_dir):
    """The sort+scan sessionizer (no per-key Python) is row-identical to the
    literal per-key pandas path, including cross-block session boundaries."""
    import pandas as pd
    import ray.data

    from knowledgegraphs_ray.streaming.windows import sessionize

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    ).repartition(13)
    key = ["user_id", "session_idx"]
    a = sessionize(ds, gap_sec=1800).to_pandas().sort_values(key).reset_index(drop=True)
    b = (
        sessionize(ds, gap_sec=1800, strategy="group")
        .to_pandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        a[sorted(a.columns)].astype("int64"), b[sorted(b.columns)].astype("int64")
    )


def test_pii_redaction_masks_all_kinds():
    import ray.data

    from knowledgegraphs_ray.pii.scan import redact_pii, scan_value_pii

    rows = [
        {"doc_id": 0, "text": "mail a@b.com call +1 (555) 123-4567 ip 10.0.0.1"},
        {"doc_id": 1, "text": "card 1234 5678 9012 3456 ssn 123-45-6789 clean"},
        {"doc_id": 2, "text": "nothing sensitive here"},
    ]
    ds = ray.data.from_items(rows)
    red = redact_pii(ds).to_pandas().set_index("doc_id")["redacted"]
    assert "[email]" in red[0] and "[phone]" in red[0] and "[ipv4]" in red[0]
    assert "[card]" in red[1] and "[ssn_like]" in red[1]
    assert red[2] == "nothing sensitive here"
    # re-scanning the redacted text finds nothing
    red_ds = redact_pii(ds).map_batches(
        lambda df: df.rename(columns={"redacted": "text"}), batch_format="pandas"
    )
    counts = scan_value_pii(red_ds).to_pandas()
    assert counts.drop(columns="doc_id").to_numpy().sum() == 0
