"""Edge cases for the round-3 LM-perplexity (text/lm.py) and duplicated
n-gram span (dedup/spans.py) operators. The sf0.001 full-table oracle
equivalence runs in test_oracle_gate.py; these pin the tiers and the
removal semantics on planted corpora."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray

from knowledgegraphs_ray.dedup.spans import (
    duplicated_window_stats,
    duplicated_window_stats_oracle_sql,
    remove_duplicated_spans,
)
from knowledgegraphs_ray.text.lm import (
    perplexity,
    perplexity_oracle_sql,
    train_unigram_lm,
)


def _gold(rows, sql):
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows))
    return con.execute(sql).fetchdf().sort_values("doc_id").reset_index(drop=True)


LM_ROWS = [
    {"doc_id": 1, "text": "the cat sat on the mat"},
    {"doc_id": 2, "text": "the the the the"},          # low-ppl repeat
    {"doc_id": 3, "text": "zyx qwv unique rare words"},  # high ppl
    {"doc_id": 4, "text": ""},                          # 0 tokens
    {"doc_id": 5, "text": "Cat CAT cat!"},              # case folding + punct
]


def test_perplexity_matches_oracle_exactly():
    mine = (
        perplexity(ray.data.from_items(LM_ROWS))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    gold = _gold(LM_ROWS, perplexity_oracle_sql())
    pd.testing.assert_frame_equal(
        mine[sorted(mine.columns)], gold[sorted(gold.columns)], check_dtype=False
    )
    # the double column is bit-exact, not just close (libm contract)
    assert (mine["ppl"].to_numpy() == gold["ppl"].to_numpy()).all()
    r = mine.set_index("doc_id")
    assert r.loc[4, "n_tokens"] == 0 and r.loc[4, "ppl"] == 1.0
    assert r.loc[2, "ppl"] < r.loc[3, "ppl"]  # repeats are more fluent
    assert r.loc[5, "n_tokens"] == 3  # case-folded into one type


def test_capped_vocab_pools_tail_into_oov():
    docs = ray.data.from_items(LM_ROWS)
    full = train_unigram_lm(docs)
    capped = train_unigram_lm(docs, vocab_limit=2)
    assert len(capped.vocab) == 2
    assert capped.total_tokens == full.total_tokens  # tail mass still counted
    kept = set(capped.vocab["token"].to_list())
    assert "the" in kept  # highest-count token survives the cap
    # scoring still runs and stays finite with the pooled OOV bucket
    out = perplexity(docs, capped).to_pandas()
    assert np.isfinite(out["ppl"]).all() and len(out) == len(LM_ROWS)


SPAN = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens


SPAN_ROWS = [
    {"doc_id": 1, "text": f"intro one {SPAN} tail one"},
    {"doc_id": 2, "text": f"other head {SPAN} different end"},
    {"doc_id": 3, "text": "wholly unrelated words without any repeats here"},
    {"doc_id": 4, "text": "short"},  # < w tokens -> 0 windows
    {"doc_id": 5, "text": f"{SPAN} {SPAN}"},  # dup within ONE doc counts too
]


@pytest.mark.parametrize("broadcast_limit", [2_000_000, 0])
def test_dup_window_stats_tiers_match_oracle(broadcast_limit):
    mine = (
        duplicated_window_stats(
            ray.data.from_items(SPAN_ROWS), w=8, broadcast_limit=broadcast_limit
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    gold = _gold(SPAN_ROWS, duplicated_window_stats_oracle_sql(w=8))
    pd.testing.assert_frame_equal(
        mine[sorted(mine.columns)], gold[sorted(gold.columns)], check_dtype=False
    )
    r = mine.set_index("doc_id")
    assert r.loc[4, "n_windows"] == 0
    assert r.loc[3, "n_dup_windows"] == 0
    assert r.loc[1, "n_dup_windows"] >= 1 and r.loc[2, "n_dup_windows"] >= 1
    assert r.loc[5, "n_dup_windows"] >= 2


def test_dup_window_stride_matches_oracle():
    rows = SPAN_ROWS
    mine = (
        duplicated_window_stats(ray.data.from_items(rows), w=4, stride=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    gold = _gold(rows, duplicated_window_stats_oracle_sql(w=4, stride=3))
    pd.testing.assert_frame_equal(
        mine[sorted(mine.columns)], gold[sorted(gold.columns)], check_dtype=False
    )


def test_remove_duplicated_spans_semantics():
    out = (
        remove_duplicated_spans(ray.data.from_items(SPAN_ROWS), w=8)
        .to_pandas()
        .set_index("doc_id")
    )
    # untouched docs keep their text byte-for-byte
    assert out.loc[3, "text"] == SPAN_ROWS[2]["text"]
    assert out.loc[4, "text"] == "short"
    assert out.loc[3, "n_removed_tokens"] == 0
    # the shared span is cut from both carriers; their unique context survives
    assert "alpha" not in out.loc[1, "text"] and "intro one" in out.loc[1, "text"]
    assert "theta" not in out.loc[2, "text"] and "different end" in out.loc[2, "text"]
    # doc 5 was nothing but the duplicated span -> dropped entirely
    assert 5 not in out.index
    # re-running on the cleaned corpus finds nothing left to cut
    again = duplicated_window_stats(
        ray.data.from_pandas(out.reset_index()[["doc_id", "text"]]), w=8
    ).to_pandas()
    assert again["n_dup_windows"].sum() == 0


def test_remove_spans_past_broadcast_limit_uses_join_tier():
    # past the broadcast limit the removal falls back to the hash-join
    # tier instead of raising (round-3 close); outputs stay identical,
    # which test_remove_spans_join_tier_equals_broadcast_tier pins
    out = remove_duplicated_spans(
        ray.data.from_items(SPAN_ROWS), w=8, broadcast_limit=0
    ).materialize()
    gold = remove_duplicated_spans(ray.data.from_items(SPAN_ROWS), w=8)
    assert sorted(out.to_pandas()["doc_id"]) == sorted(
        gold.to_pandas()["doc_id"]
    )


def test_perplexity_filter_keeps_fluent_head():
    from knowledgegraphs_ray.text.lm import perplexity_filter

    common = "the quick brown fox jumps over the lazy dog"
    rows = [{"doc_id": i, "text": common, "lang": "en"} for i in range(18)] + [
        {"doc_id": 100, "text": "zyxqwv unseen gibberish blorp", "lang": "en"},
        {"doc_id": 101, "text": "another xylophone quagmire vortex", "lang": "en"},
    ]
    kept = perplexity_filter(
        ray.data.from_items(rows), keep_quantile=0.9
    ).to_pandas()
    assert set(kept.columns) == {"doc_id", "text", "lang", "ppl"}
    assert 100 not in set(kept.doc_id) and 101 not in set(kept.doc_id)
    assert set(range(18)) <= set(kept.doc_id)  # fluent head survives
    # exact-quantile contract: kept fraction >= keep_quantile
    assert len(kept) >= 0.9 * len(rows)


def test_read_table_filter_pushdown(sf_dir):
    import pyarrow.dataset as pads

    from knowledgegraphs_ray.pipelines.relational import read_table

    full = read_table(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    pushed = read_table(
        sf_dir,
        "orders",
        ["o_orderkey", "o_totalprice"],
        filter=pads.field("o_totalprice") > 100_000.0,
    ).to_pandas()
    gold = full.to_pandas()
    gold = gold[gold.o_totalprice > 100_000.0]
    assert len(pushed) == len(gold) > 0
    assert set(pushed.o_orderkey) == set(gold.o_orderkey)


def test_remove_spans_join_tier_equals_broadcast_tier():
    """Scale tier (dup set too large to broadcast, forced via
    broadcast_limit=0): window rows hash-join the dup table and the
    per-doc cut starts come back through a bucketed join — output must be
    row-identical to the broadcast tier, including untouched docs."""
    rows = [
        {"doc_id": 1, "text": "alpha beta gamma delta epsilon zeta eta theta unique1 one two"},
        {"doc_id": 2, "text": "prefix alpha beta gamma delta epsilon zeta eta theta suffix"},
        {"doc_id": 3, "text": "alpha beta gamma delta epsilon zeta eta theta"},  # fully dup
        {"doc_id": 4, "text": "completely different words with no duplication at all here"},
    ]
    ds = ray.data.from_items(rows).repartition(2)
    a = (
        remove_duplicated_spans(ds, w=8)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        remove_duplicated_spans(ds, w=8, broadcast_limit=0)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b[a.columns])
    assert list(a["doc_id"]) == [1, 2, 4]  # fully-dup doc dropped
    assert a.loc[2, "n_removed_tokens"] == 0  # untouched doc intact


def test_bigram_ppl_tiers_and_fit(sf_dir):
    """Pruning tiers: an unpruned bigram_limit reproduces the full model
    exactly; a hard prune only raises surprisal (backoff branch). The
    self-trained bigram model fits better than the unigram model on
    average (interpolation with the true bigram distribution)."""
    import ray.data

    from knowledgegraphs_ray.text.lm import bigram_perplexity, perplexity

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    full = (
        bigram_perplexity(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    unpruned = (
        bigram_perplexity(docs, bigram_limit=10_000_000)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert full.equals(unpruned)

    pruned = (
        bigram_perplexity(docs, bigram_limit=50)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (
        pruned["surprisal_micro"].to_numpy() >= full["surprisal_micro"].to_numpy()
    ).all()

    uni = (
        perplexity(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert full["ppl"].mean() < uni["ppl"].mean()


def test_bigram_vocab_cap_oov_path(sf_dir):
    """Bounded-vocab tier: OOV tokens and vocab-crossing bigrams route
    through the pooled-tail backoff without error; schema unchanged."""
    import ray.data

    from knowledgegraphs_ray.text.lm import bigram_perplexity

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    out = bigram_perplexity(docs, vocab_limit=20, bigram_limit=100).to_pandas()
    assert len(out) == 500
    assert (out["surprisal_micro"] >= 0).all()
    assert set(out.columns) == {"doc_id", "n_tokens", "surprisal_micro", "ppl"}
