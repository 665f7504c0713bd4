"""Edge cases for DSIR importance weighting (text/dsir.py) and SemDeDup
(sim/semdedup.py). The sf0.001 full-table oracle equivalence runs in
test_oracle_gate.py; these pin the selection semantics, the clustered
tier's recall/precision contract, and planted-corpus weight signs."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray

from knowledgegraphs_ray.sim.semdedup import (
    semantic_dedup,
    semantic_dedup_oracle_sql,
    semantic_pairs,
)
from knowledgegraphs_ray.text.dsir import dsir_oracle_sql, dsir_select, dsir_weights

# target domain talks about cats; raw corpus is mostly finance noise
DSIR_ROWS = [
    {"doc_id": 0, "text": "cat cat feline whiskers purr"},     # target member
    {"doc_id": 1, "text": "bond yield swap rate margin"},
    {"doc_id": 2, "text": "cat purr whiskers nap"},            # target-like raw doc
    {"doc_id": 3, "text": "margin call yield curve bond"},
    {"doc_id": 4, "text": ""},                                 # 0 tokens
    {"doc_id": 10, "text": "feline nap purr cat whiskers"},    # target member
]


def _target(ds):
    import pyarrow as pa

    return ds.map_batches(
        lambda t: t.filter(pa.array(t["doc_id"].to_numpy() % 10 == 0)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def test_dsir_weights_match_oracle_exactly():
    raw = ray.data.from_items(DSIR_ROWS)
    mine = (
        dsir_weights(raw, _target(raw))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(DSIR_ROWS))
    gold = (
        con.execute(dsir_oracle_sql())
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        mine[sorted(mine.columns)], gold[sorted(gold.columns)], check_dtype=False
    )


def test_dsir_weight_signs_and_select():
    raw = ray.data.from_items(DSIR_ROWS)
    w = dsir_weights(raw, _target(raw)).to_pandas().set_index("doc_id")
    # target-like raw doc outweighs finance docs; empty doc weighs 0
    assert w.loc[2, "logweight_micro"] > w.loc[1, "logweight_micro"]
    assert w.loc[2, "logweight_micro"] > w.loc[3, "logweight_micro"]
    assert w.loc[4, "logweight_micro"] == 0 and w.loc[4, "n_tokens"] == 0
    top = dsir_select(raw, _target(raw), 3).to_pandas()
    assert len(top) == 3
    # the cat-domain docs fill the top-3 ahead of every finance doc
    assert set(top["doc_id"]) == {0, 2, 10}


def _planted_embeddings():
    # 3 tight clusters of near-identical vectors + 2 singletons
    rng = np.random.default_rng(7)
    base = rng.normal(size=(5, 16))
    rows = []
    vid = 0
    for c in range(3):
        for _ in range(3):  # 3 near-dups per cluster
            v = base[c] + rng.normal(scale=1e-3, size=16)
            rows.append({"vec_id": vid, "embedding": v.astype(np.float32).tolist()})
            vid += 1
    for c in (3, 4):
        rows.append(
            {"vec_id": vid, "embedding": base[c].astype(np.float32).tolist()}
        )
        vid += 1
    return rows


def test_semantic_dedup_exact_tier_matches_oracle():
    rows = _planted_embeddings()
    ds = ray.data.from_items(rows)
    mine = (
        semantic_dedup(ds, threshold=0.95)
        .to_pandas()
        .sort_values("vec_id")["vec_id"]
        .tolist()
    )
    con = duckdb.connect()
    emb = pd.DataFrame(rows)
    con.register("embeddings", emb)
    gold = (
        con.execute(semantic_dedup_oracle_sql(threshold=0.95))
        .fetchdf()
        .sort_values("vec_id")["vec_id"]
        .tolist()
    )
    # min-id survivor of each 3-dup cluster + the 2 singletons
    assert mine == gold == [0, 3, 6, 9, 10]


def test_semantic_clustered_tier_recall_and_precision():
    rows = _planted_embeddings()
    ds = ray.data.from_items(rows)
    exact = semantic_pairs(ds, threshold=0.95).to_pandas()
    clus = semantic_pairs(ds, threshold=0.95, n_list=4).to_pandas()
    se = set(map(tuple, exact[["doc_a", "doc_b"]].values))
    sc = set(map(tuple, clus[["doc_a", "doc_b"]].values))
    # precision: every clustered pair is a true near-dup pair
    assert sc <= se
    # recall: tight planted clusters land in one k-means cell each
    assert sc == se
    # survivors via the clustered tier equal the exact tier on this corpus
    mine = (
        semantic_dedup(ds, threshold=0.95, n_list=4)
        .to_pandas()
        .sort_values("vec_id")["vec_id"]
        .tolist()
    )
    assert mine == [0, 3, 6, 9, 10]


def test_semantic_dedup_no_pairs_is_identity():
    rng = np.random.default_rng(11)
    rows = [
        {"vec_id": i, "embedding": rng.normal(size=16).astype(np.float32).tolist()}
        for i in range(8)
    ]
    ds = ray.data.from_items(rows)
    out = semantic_dedup(ds, threshold=0.999).to_pandas()
    assert sorted(out["vec_id"].tolist()) == list(range(8))


def test_dsir_masked_single_pass_equals_two_dataset_path():
    raw = ray.data.from_items(DSIR_ROWS)
    two = (
        dsir_weights(raw, _target(raw))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    one = (
        dsir_weights(
            raw, target_mask=lambda t: t["doc_id"].to_numpy() % 10 == 0
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(one, two)
    with pytest.raises(ValueError):
        dsir_weights(raw)  # neither target form
    with pytest.raises(ValueError):
        dsir_weights(raw, _target(raw), target_mask=lambda t: None)  # both


def test_dsir_hashed_bigram_parallelism_invariant_and_oracle():
    """The hashed uni+bigram tier must be invariant to input partitioning
    (fixed-bucket smoothing, integer sums) and match its DuckDB twin."""
    from knowledgegraphs_ray.text.dsir import (
        dsir_hashed_oracle_sql,
        dsir_hashed_weights,
    )

    df = pd.DataFrame(DSIR_ROWS)
    mask = lambda t: t["doc_id"].to_numpy() % 10 == 0
    outs = []
    for nb in (1, 4):
        ds = ray.data.from_pandas(df).repartition(nb)
        out = (
            dsir_hashed_weights(ds, target_mask=mask, n_buckets=64)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])

    con = duckdb.connect()
    con.register("docs_df", df)
    con.execute("CREATE VIEW documents AS SELECT * FROM docs_df")
    gold = (
        con.execute(dsir_hashed_oracle_sql(n_buckets=64))
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        outs[0].astype({"n_grams": "int64", "logweight_micro": "int64"}),
        gold.astype({"n_grams": "int64", "logweight_micro": "int64"}),
    )
    # target-like doc outranks the finance doc; empty doc is weight 0
    w = dict(zip(outs[0].doc_id, outs[0].logweight_micro))
    assert w[2] > w[3] and w[4] == 0
    # bigrams counted: "cat purr whiskers nap" -> 4 uni + 3 bi
    n = dict(zip(outs[0].doc_id, outs[0].n_grams))
    assert n[2] == 7
