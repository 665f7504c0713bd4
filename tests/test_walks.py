"""graph/walks.py — deterministic md5-ranked random walks.

Checks: (1) walks follow the defined hash rule exactly on a toy graph
(driver-side brute force), (2) broadcast vs join tier exact equality,
(3) sink termination emits the partial prefix, (4) DuckDB oracle match,
(5) start-prefix filtering and walks_per_node fan-out."""

import hashlib

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data

from knowledgegraphs_ray.graph.walks import random_walks, random_walks_oracle_sql


def _edges(rows) -> ray.data.Dataset:
    df = pd.DataFrame(rows, columns=["src", "dst"])
    return ray.data.from_pandas(df).repartition(3)


def _u64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def _brute(rows, *, start_prefix=None, walk_len=4, walks_per_node=1):
    adj = {}
    nodes = set()
    for s, d in sorted(set(rows)):
        adj.setdefault(s, []).append(d)
        nodes.update((s, d))
    for k in adj:
        adj[k] = sorted(set(adj[k]))
    out = []
    for s in sorted(nodes):
        if start_prefix is not None and not s.startswith(start_prefix):
            continue
        for w in range(walks_per_node):
            cur = s
            out.append((s, w, 0, s))
            for t in range(1, walk_len + 1):
                nb = adj.get(cur)
                if not nb:
                    break
                cur = nb[_u64(f"{cur}\x1f{w}\x1f{t}") % len(nb)]
                out.append((s, w, t, cur))
    return pd.DataFrame(out, columns=["start", "walk", "step", "node"])


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df.astype({"walk": "int64", "step": "int64"})
        .sort_values(["start", "walk", "step"])
        .reset_index(drop=True)
    )


ROWS = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "a"),
    ("c", "d"), ("d", "a"), ("a", "b"),  # duplicate edge: deduped
    ("x", "sink"),  # 'sink' has no out-edges
]


def test_matches_bruteforce_both_tiers():
    want = _canon(_brute(ROWS, walk_len=5))
    got_bc = _canon(
        random_walks(_edges(ROWS), walk_len=5, tier="broadcast").to_pandas()
    )
    got_jn = _canon(
        random_walks(_edges(ROWS), walk_len=5, tier="join").to_pandas()
    )
    pd.testing.assert_frame_equal(got_bc, want)
    pd.testing.assert_frame_equal(got_jn, want)


def test_sink_terminates_early():
    got = _canon(random_walks(_edges(ROWS), walk_len=3).to_pandas())
    sink_walk = got[got["start"] == "sink"]
    assert len(sink_walk) == 1 and sink_walk["step"].iloc[0] == 0
    x_walk = got[got["start"] == "x"]
    # x -> sink -> (stuck): steps 0 and 1 only
    assert list(x_walk["step"]) == [0, 1]
    assert list(x_walk["node"]) == ["x", "sink"]


def test_oracle_match_and_fanout():
    df = pd.DataFrame(ROWS, columns=["src", "dst"])
    con = duckdb.connect()
    con.register("edges_df", df)
    gold = con.execute(
        random_walks_oracle_sql(
            "SELECT src, dst FROM edges_df", walk_len=4, walks_per_node=3
        )
    ).fetchdf()
    got = random_walks(
        _edges(ROWS), walk_len=4, walks_per_node=3
    ).to_pandas()
    pd.testing.assert_frame_equal(_canon(got), _canon(gold))
    # fan-out: every start has walks 0..2
    assert set(got["walk"].unique()) == {0, 1, 2}


def test_start_prefix_filters():
    got = random_walks(
        _edges(ROWS), walk_len=2, start_prefix="a"
    ).to_pandas()
    assert set(got["start"].unique()) == {"a"}
    df = pd.DataFrame(ROWS, columns=["src", "dst"])
    con = duckdb.connect()
    con.register("edges_df", df)
    gold = con.execute(
        random_walks_oracle_sql(
            "SELECT src, dst FROM edges_df", walk_len=2, start_prefix="a"
        )
    ).fetchdf()
    pd.testing.assert_frame_equal(_canon(got), _canon(gold))


def test_random_graph_tier_equivalence():
    rng = np.random.default_rng(3)
    rows = [
        (f"n{a}", f"n{b}")
        for a, b in zip(rng.integers(0, 60, 400), rng.integers(0, 60, 400))
        if a != b
    ]
    bc = _canon(random_walks(_edges(rows), walk_len=6, tier="broadcast").to_pandas())
    jn = _canon(random_walks(_edges(rows), walk_len=6, tier="join").to_pandas())
    pd.testing.assert_frame_equal(bc, jn)
    want = _canon(_brute(rows, walk_len=6))
    pd.testing.assert_frame_equal(bc, want)
