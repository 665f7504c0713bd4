"""Funnel analysis (streaming/funnel.py) and token co-occurrence
(text/cooccur.py): hand-checked semantics, strict-ordering edge cases,
DuckDB-twin equivalence on synthetic frames, and parallelism invariance."""

import duckdb
import numpy as np
import pandas as pd
import ray

from knowledgegraphs_ray.streaming.funnel import funnel_counts, funnel_oracle_sql
from knowledgegraphs_ray.text.cooccur import (
    cooccurrence_oracle_sql,
    token_cooccurrence,
)


def _ts(*minutes):
    return pd.to_datetime([f"2024-01-01 00:{m:02d}:00" for m in minutes])


def _funnel(df, steps, **kw):
    out = funnel_counts(ray.data.from_pandas(df), steps=steps, **kw).to_pandas()
    return dict(zip(out["step"] + "#" + out["step_idx"].astype(str), out["users"]))


def test_funnel_ordered_reach():
    # u1 completes view->click->purchase in order; u2 clicks BEFORE viewing
    # (click doesn't count), never purchases; u3 views only
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2, 3],
            "ts": _ts(1, 2, 3, 1, 2, 5),
            "event_type": ["view", "click", "purchase", "click", "view", "view"],
        }
    )
    got = _funnel(df, ["view", "click", "purchase"])
    assert got == {"view#0": 3, "click#1": 1, "purchase#2": 1}


def test_funnel_strictly_after():
    # u1's click is at the SAME timestamp as the view reach -> not counted
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 2, 2],
            "ts": _ts(1, 1, 1, 2),
            "event_type": ["view", "click", "view", "click"],
        }
    )
    got = _funnel(df, ["view", "click"])
    assert got == {"view#0": 2, "click#1": 1}


def test_funnel_repeated_step_names():
    # view->view: needs two strictly-ordered views
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 2],
            "ts": _ts(1, 2, 1),
            "event_type": ["view", "view", "view"],
        }
    )
    got = _funnel(df, ["view", "view"])
    assert got == {"view#0": 2, "view#1": 1}


def test_funnel_no_matching_events_emits_zero_rows():
    df = pd.DataFrame(
        {"user_id": [1], "ts": _ts(1), "event_type": ["error"]}
    )
    got = _funnel(df, ["view", "click"])
    assert got == {"view#0": 0, "click#1": 0}


def test_funnel_matches_duckdb_twin_and_parallelism():
    rng = np.random.default_rng(7)
    n = 3000
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 120, n),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
            "event_type": rng.choice(
                ["view", "click", "purchase", "error"], n, p=[0.4, 0.3, 0.1, 0.2]
            ),
        }
    )
    steps = ["view", "click", "purchase"]
    con = duckdb.connect()
    con.register("events", df)
    want = con.execute(funnel_oracle_sql(steps)).df()
    got = (
        funnel_counts(ray.data.from_pandas(df).repartition(7), steps=steps)
        .to_pandas()
        .sort_values("step_idx")
        .reset_index(drop=True)
    )
    assert got["users"].tolist() == want["users"].tolist()
    got1 = funnel_counts(
        ray.data.from_pandas(df).repartition(1), steps=steps
    ).to_pandas()
    assert got1["users"].tolist() == want["users"].tolist()


def _cooc(df, **kw):
    return token_cooccurrence(ray.data.from_pandas(df), **kw).to_pandas()


def test_cooccurrence_hand_checked():
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["a b c", "a b", "a a b"],  # dup 'a' in doc 3 counts once
        }
    )
    out = _cooc(df, min_pair_count=1)
    got = {
        (r.x, r.y): (r.pair_count, r.x_df, r.y_df) for r in out.itertuples()
    }
    assert got == {
        ("a", "b"): (3, 3, 3),
        ("a", "c"): (1, 3, 1),
        ("b", "c"): (1, 3, 1),
    }


def test_cooccurrence_min_pair_count_filters():
    df = pd.DataFrame({"doc_id": [1, 2], "text": ["a b c", "a b"]})
    out = _cooc(df, min_pair_count=2)
    assert out[["x", "y"]].values.tolist() == [["a", "b"]]


def test_cooccurrence_vocab_truncation_tie_break():
    # dfs: a=3, b=2, c=2, d=1; vocab_size=2 keeps a and b (tie b<c broken
    # by token order on equal df)
    df = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["a b c", "a b c d", "a"]}
    )
    out = _cooc(df, vocab_size=2, min_pair_count=1)
    assert set(zip(out["x"], out["y"])) == {("a", "b")}
    assert out["pair_count"].tolist() == [2]


def test_cooccurrence_matches_duckdb_twin():
    rng = np.random.default_rng(5)
    words = np.array([f"w{i}" for i in range(40)])
    texts = [
        " ".join(rng.choice(words, rng.integers(3, 25)))
        for _ in range(400)
    ]
    df = pd.DataFrame({"doc_id": np.arange(400), "text": texts})
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(
        cooccurrence_oracle_sql(vocab_size=25, min_pair_count=3)
    ).df()
    got = _cooc(
        pd.DataFrame(df), vocab_size=25, min_pair_count=3
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False
    )
    # parallelism invariance
    got7 = token_cooccurrence(
        ray.data.from_pandas(df).repartition(7), vocab_size=25, min_pair_count=3
    ).to_pandas()
    pd.testing.assert_frame_equal(got7.reset_index(drop=True), want, check_dtype=False)


def test_pmi_hand_checked():
    from math import floor, log

    from knowledgegraphs_ray.text.cooccur import pmi_collocations

    df = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["a b c", "a b", "a a b"]}
    )
    out = pmi_collocations(
        ray.data.from_pandas(df), min_pair_count=1
    ).to_pandas()
    got = {(r.x, r.y): r.pmi_micro for r in out.itertuples()}
    # N=3; ab: c=3, dfs 3·3 -> ln(9/9)=0; ac: c=1, dfs 3·1 -> ln(3/3)=0;
    # bc identical to ac
    assert got == {("a", "b"): 0, ("a", "c"): 0, ("b", "c"): 0}
    # a negative-PMI pair: x,y independent-ish
    df2 = pd.DataFrame(
        {
            "doc_id": range(6),
            "text": ["x y", "x q", "x q", "y q", "y q", "q q"],
        }
    )
    out2 = pmi_collocations(
        ray.data.from_pandas(df2), min_pair_count=1
    ).to_pandas()
    got2 = {(r.x, r.y): r.pmi_micro for r in out2.itertuples()}
    # (x,y): c=1, df_x=3, df_y=3, N=6 -> ln(6/9) < 0
    assert got2[("x", "y")] == floor(1_000_000 * log(6 / 9))


def test_pmi_matches_duckdb_twin():
    from knowledgegraphs_ray.text.cooccur import pmi_collocations, pmi_oracle_sql

    rng = np.random.default_rng(11)
    words = np.array([f"w{i}" for i in range(30)])
    texts = [
        " ".join(rng.choice(words, rng.integers(3, 20))) for _ in range(300)
    ]
    df = pd.DataFrame({"doc_id": np.arange(300), "text": texts})
    con = duckdb.connect()
    con.register("documents", df)
    want = (
        con.execute(pmi_oracle_sql(vocab_size=20, min_pair_count=2))
        .df()
        .sort_values(["x", "y"])
        .reset_index(drop=True)
    )
    got = (
        pmi_collocations(
            ray.data.from_pandas(df).repartition(5),
            vocab_size=20,
            min_pair_count=2,
        )
        .to_pandas()
        .sort_values(["x", "y"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["pmi_micro"] != 0).any()
