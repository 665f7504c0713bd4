"""Triangle counting (graph/triangles.py): known graphs, brute-force
equivalence on a random graph, tier equivalence (edge-broadcast closure vs
wedge join; degree broadcast vs join orientation), parallelism invariance,
string node ids, and the co-occurrence edge builder."""

import itertools

import numpy as np
import pandas as pd
import pytest
import ray

from knowledgegraphs_ray.graph.triangles import (
    canonical_edges,
    cooccurrence_edges,
    triangle_counts,
)


def _counts(ds) -> dict:
    # Ray's to_pandas() drops columns on 0-row datasets even when the Arrow
    # schema is intact — check the schema, then short-circuit empties
    assert ds.schema().names == ["node", "triangles"]
    if ds.count() == 0:
        return {}
    df = ds.to_pandas()
    return dict(zip(df["node"], df["triangles"]))


def _brute(edges: pd.DataFrame) -> dict:
    adj: dict = {}
    for a, b in zip(edges["src"], edges["dst"]):
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out: dict = {}
    for u, v, w in itertools.combinations(sorted(adj), 3):
        if v in adj[u] and w in adj[u] and w in adj[v]:
            for n in (u, v, w):
                out[n] = out.get(n, 0) + 1
    return out


def test_k4_every_node_in_three_triangles():
    k4 = pd.DataFrame({"src": [0, 0, 0, 1, 1, 2], "dst": [1, 2, 3, 2, 3, 3]})
    got = _counts(triangle_counts(ray.data.from_pandas(k4)))
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangle_free_graph_is_empty():
    path = pd.DataFrame({"src": [0, 1, 2], "dst": [1, 2, 3]})
    assert _counts(triangle_counts(ray.data.from_pandas(path))) == {}


def test_direction_multiplicity_and_self_loops_ignored():
    messy = pd.DataFrame(
        {
            "src": [0, 1, 2, 2, 0, 7],
            "dst": [1, 0, 0, 1, 0, 7],  # dup reversed edge, self loops
        }
    )
    got = _counts(triangle_counts(ray.data.from_pandas(messy)))
    assert got == {0: 1, 1: 1, 2: 1}


def test_random_graph_matches_brute_force_and_tiers_agree():
    rng = np.random.default_rng(11)
    edges = pd.DataFrame(
        {
            "src": rng.integers(0, 60, 500).astype(np.int64),
            "dst": rng.integers(0, 60, 500).astype(np.int64),
        }
    )
    expect = _brute(edges)
    ds = ray.data.from_pandas(edges).repartition(5)
    assert _counts(triangle_counts(ds)) == expect
    # forced code-tier wedge JOIN closure (nodes broadcast, edges don't)
    assert _counts(triangle_counts(ds, edge_broadcast_limit=0)) == expect
    # forced raw-id tier: join orientation AND composite-key join closure
    assert (
        _counts(
            triangle_counts(ds, edge_broadcast_limit=0, broadcast_limit=0)
        )
        == expect
    )


def test_parallelism_invariance():
    rng = np.random.default_rng(3)
    edges = pd.DataFrame(
        {
            "src": rng.integers(0, 40, 300).astype(np.int64),
            "dst": rng.integers(0, 40, 300).astype(np.int64),
        }
    )
    a = _counts(triangle_counts(ray.data.from_pandas(edges).repartition(1)))
    b = _counts(triangle_counts(ray.data.from_pandas(edges).repartition(13)))
    assert a == b and a  # non-trivial


def test_string_node_ids():
    tri = pd.DataFrame({"src": ["a", "a", "b"], "dst": ["b", "c", "c"]})
    assert _counts(triangle_counts(ray.data.from_pandas(tri))) == {
        "a": 1,
        "b": 1,
        "c": 1,
    }


def test_empty_edges():
    empty = pd.DataFrame({"src": pd.Series([], dtype="int64"),
                          "dst": pd.Series([], dtype="int64")})
    assert _counts(triangle_counts(ray.data.from_pandas(empty))) == {}


def test_canonical_edges_distinct_undirected():
    e = pd.DataFrame({"src": [3, 1, 1, 5], "dst": [1, 3, 3, 5]})
    got = canonical_edges(ray.data.from_pandas(e)).to_pandas()
    assert sorted(map(tuple, got[["u", "v"]].values.tolist())) == [(1, 3)]


def test_cooccurrence_edges_and_max_group():
    basket = pd.DataFrame(
        {"g": [1, 1, 1, 2, 2, 3, 3, 3, 3], "i": [10, 20, 30, 20, 30, 1, 2, 3, 4]}
    )
    ds = ray.data.from_pandas(basket)
    got = cooccurrence_edges(ds, group_col="g", item_col="i").to_pandas()
    pairs = sorted(map(tuple, got[["u", "v"]].values.tolist()))
    assert pairs == [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (10, 20), (10, 30), (20, 30),
    ]
    # cap drops the size-4 group entirely, keeps the size-3 / size-2 ones
    capped = cooccurrence_edges(
        ds, group_col="g", item_col="i", max_group=3
    ).to_pandas()
    assert sorted(map(tuple, capped[["u", "v"]].values.tolist())) == [
        (10, 20), (10, 30), (20, 30),
    ]


def test_cooccurrence_min_count_support_across_blocks():
    # pair (20, 30) co-occurs in groups 1 and 2; every other pair in one
    # group only; rows of the same group straddle input blocks, so the
    # support count must survive the bucket exchange (distinct per group,
    # summed across groups)
    basket = pd.DataFrame(
        {
            "g": [1, 1, 1, 2, 2, 3, 3, 1, 2],
            "i": [10, 20, 30, 20, 30, 20, 30, 20, 30],  # dup rows too
        }
    )
    ds = ray.data.from_pandas(basket).repartition(4)
    got = cooccurrence_edges(
        ds, group_col="g", item_col="i", min_count=2
    ).to_pandas()
    assert sorted(map(tuple, got[["u", "v"]].values.tolist())) == [(20, 30)]
    # min_count=3: groups 1, 2 AND 3 all contain {20, 30}
    got3 = cooccurrence_edges(
        ds, group_col="g", item_col="i", min_count=3
    ).to_pandas()
    assert sorted(map(tuple, got3[["u", "v"]].values.tolist())) == [(20, 30)]
    got4 = cooccurrence_edges(
        ds, group_col="g", item_col="i", min_count=4
    ).to_pandas()
    assert len(got4) == 0
