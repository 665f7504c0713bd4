"""k-core decomposition (graph/kcore.py): known graphs, brute-force peel
equivalence on random graphs, DuckDB unrolled-twin equivalence, forced
semi-join delta tier, data-derived k parity, string ids, empty core."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray

from knowledgegraphs_ray.graph.kcore import kcore, kcore_oracle_sql, mean_degree_k


def _core(ds) -> dict:
    df = ds.to_pandas()
    if df.empty:
        return {}
    return dict(zip(df["node"], df["core_deg"]))


def _brute(edges: pd.DataFrame, k: int) -> dict:
    adj: dict = {}
    for a, b in zip(edges["src"], edges["dst"]):
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    while True:
        drop = {n for n in alive if len(adj[n] & alive) < k}
        if not drop:
            break
        alive -= drop
    return {n: len(adj[n] & alive) for n in alive}


def test_k4_with_pendants():
    # K4 plus two pendant nodes: 2-core (and 3-core) strips the pendants
    e = pd.DataFrame(
        {"src": [0, 0, 0, 1, 1, 2, 0, 4], "dst": [1, 2, 3, 2, 3, 3, 4, 5]}
    )
    got = _core(kcore(ray.data.from_pandas(e), k=3))
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_cascading_peel():
    # path 0-1-2-3 attached to a triangle 3-4-5: k=2 peels the path
    # node-by-node (multiple rounds), leaving the triangle
    e = pd.DataFrame({"src": [0, 1, 2, 3, 3, 4], "dst": [1, 2, 3, 4, 5, 5]})
    got = _core(kcore(ray.data.from_pandas(e), k=2))
    assert got == {3: 2, 4: 2, 5: 2}


def test_empty_core():
    e = pd.DataFrame({"src": [0, 1], "dst": [1, 2]})
    assert _core(kcore(ray.data.from_pandas(e), k=5)) == {}


def test_random_graph_matches_brute_and_forced_join_tier():
    rng = np.random.default_rng(13)
    e = pd.DataFrame(
        {
            "src": rng.integers(0, 80, 600).astype(np.int64),
            "dst": rng.integers(0, 80, 600).astype(np.int64),
        }
    )
    for k in (3, 6, 10):
        expect = _brute(e, k)
        ds = ray.data.from_pandas(e).repartition(5)
        assert _core(kcore(ds, k=k)) == expect
        assert _core(kcore(ds, k=k, delta_broadcast_limit=0)) == expect


def test_matches_duckdb_unrolled_twin_with_derived_k():
    # sparse background + planted 12-clique: the derived k = ceil(2E/V)
    # lands between the background degrees and the clique degree, so the
    # peel is non-trivial AND the surviving core is non-empty
    rng = np.random.default_rng(29)
    bg_src = rng.integers(0, 80, 300).astype(np.int64)
    bg_dst = rng.integers(0, 80, 300).astype(np.int64)
    cl = np.array([(a, b) for a in range(12) for b in range(a + 1, 12)])
    e = pd.DataFrame(
        {
            "src": np.concatenate([bg_src, cl[:, 0]]),
            "dst": np.concatenate([bg_dst, cl[:, 1]]),
        }
    )
    con = duckdb.connect()
    con.register("e", e)
    want = con.execute(
        kcore_oracle_sql("SELECT src, dst FROM e", rounds=24)
    ).df()
    assert len(want) > 0  # the planted clique must survive
    got = (
        kcore(ray.data.from_pandas(e).repartition(3))
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_string_nodes_and_mean_degree_k():
    # triangle a-b-c plus pendant d: V=4, E=4 -> k = ceil(8/4) = 2
    e = pd.DataFrame(
        {"src": ["a", "a", "b", "c"], "dst": ["b", "c", "c", "d"]}
    )
    assert mean_degree_k(4, 4) == 2
    got = _core(kcore(ray.data.from_pandas(e)))
    assert got == {"a": 2, "b": 2, "c": 2}


def test_nonconvergence_raises():
    # path of 6 nodes at k=2 needs ~3 peel rounds; max_rounds=2 must raise
    e = pd.DataFrame({"src": [0, 1, 2, 3, 4], "dst": [1, 2, 3, 4, 5]})
    with pytest.raises(RuntimeError, match="no fixpoint"):
        kcore(ray.data.from_pandas(e), k=2, max_rounds=2)
