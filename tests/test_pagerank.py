"""graph/pagerank.py — integer fixed-point PageRank.

Checks: (1) both tiers equal a driver-side numpy reference on a seeded
random graph, (2) tier equivalence (broadcast vs forced join), (3) block-
count invariance, (4) dangling/isolated-node and empty-edge behavior."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from knowledgegraphs_ray.graph.pagerank import SCALE, pagerank


def _reference(edges: pd.DataFrame, *, iters: int, damping_pct: int = 85,
               scale: int = SCALE) -> pd.DataFrame:
    """Single-process numpy twin of the distributed iteration."""
    nodes = np.sort(pd.unique(pd.concat([edges["src"], edges["dst"]])))
    idx = {n: i for i, n in enumerate(nodes)}
    s = edges["src"].map(idx).to_numpy(np.int64)
    d = edges["dst"].map(idx).to_numpy(np.int64)
    deg = np.bincount(s, minlength=len(nodes)).astype(np.int64)
    base = (scale * (100 - damping_pct)) // 100
    r = np.full(len(nodes), scale, dtype=np.int64)
    for _ in range(iters):
        contrib = (r[s] * damping_pct) // 100 // deg[s]
        nxt = np.full(len(nodes), base, dtype=np.int64)
        np.add.at(nxt, d, contrib)
        r = nxt
    return pd.DataFrame({"node": nodes, "pr": r})


def _random_edges(n_nodes: int, n_edges: int, seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    s = rng.integers(0, n_nodes, n_edges)
    d = rng.integers(0, n_nodes, n_edges)
    keep = s != d
    return pd.DataFrame(
        {"src": [f"n{v}" for v in s[keep]], "dst": [f"n{v}" for v in d[keep]]}
    )


def _run(edges_df: pd.DataFrame, **kw) -> pd.DataFrame:
    ds = ray.data.from_pandas(edges_df)
    if "n_blocks" in kw:
        ds = ds.repartition(kw.pop("n_blocks"))
    out = pagerank(ds, **kw).to_pandas()
    return out.sort_values("node").reset_index(drop=True)


def test_matches_numpy_reference():
    edges = _random_edges(200, 1500, seed=7)
    got = _run(edges, iters=6)
    exp = _reference(edges, iters=6).sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_tier_equivalence_and_block_invariance():
    edges = _random_edges(150, 900, seed=11)
    broadcast = _run(edges, iters=4, n_blocks=3)
    joined = _run(edges, iters=4, n_blocks=9, broadcast_limit=0)
    pd.testing.assert_frame_equal(broadcast, joined)


def test_multi_edges_count_per_occurrence():
    # a duplicated edge contributes twice — multiset semantics, shared with
    # the SQL oracle (edges CTE is not DISTINCT)
    edges = pd.DataFrame(
        {"src": ["a", "a", "a", "b"], "dst": ["b", "b", "c", "a"]}
    )
    got = _run(edges, iters=3)
    exp = _reference(edges, iters=3)
    pd.testing.assert_frame_equal(got, exp)
    once = _run(edges.drop_duplicates(), iters=3)
    assert not got.equals(once)


def test_dangling_mass_evaporates():
    # b has no out-edges: its damped mass is dropped, not redistributed
    edges = pd.DataFrame({"src": ["a"], "dst": ["b"]})
    got = _run(edges, iters=1)
    base = (SCALE * 15) // 100
    exp = pd.DataFrame(
        {"node": ["a", "b"], "pr": [base, base + (SCALE * 85) // 100]}
    )
    pd.testing.assert_frame_equal(got, exp)


def test_empty_edges():
    empty = pa.table({"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())})
    out = pagerank(ray.data.from_arrow(empty))
    # assert on the Dataset schema: Ray's to_pandas drops columns entirely
    # on 0-row datasets, so the schema IS the contract here
    assert out.schema().names == ["node", "pr"]
    assert out.count() == 0


def test_oracle_parity_small(sf_dir, tmp_path):
    duckdb = pytest.importorskip("duckdb")
    from knowledgegraphs_ray.graph.pagerank import pagerank_oracle_sql

    edges = _random_edges(80, 400, seed=3)
    edges.to_parquet(tmp_path / "edges.parquet")
    sql = pagerank_oracle_sql(
        f"SELECT src, dst FROM '{tmp_path / 'edges.parquet'}'", iters=5
    )
    exp = (
        duckdb.sql(sql).df().sort_values("node").reset_index(drop=True)
        .astype({"pr": "int64"})
    )
    got = _run(edges, iters=5)
    pd.testing.assert_frame_equal(got, exp)


def _ppr_reference(edges: pd.DataFrame, *, iters: int, prefix: str,
                   damping_pct: int = 85, scale: int = SCALE) -> pd.DataFrame:
    nodes = np.sort(pd.unique(pd.concat([edges["src"], edges["dst"]])))
    idx = {n: i for i, n in enumerate(nodes)}
    s = edges["src"].map(idx).to_numpy(np.int64)
    d = edges["dst"].map(idx).to_numpy(np.int64)
    deg = np.bincount(s, minlength=len(nodes)).astype(np.int64)
    base = (scale * (100 - damping_pct)) // 100
    seed = np.array([str(n).startswith(prefix) for n in nodes])
    base_vec = np.where(seed, np.int64(base), np.int64(0))
    r = np.where(seed, np.int64(scale), np.int64(0))
    for _ in range(iters):
        contrib = (r[s] * damping_pct) // 100 // deg[s]
        nxt = base_vec.copy()
        np.add.at(nxt, d, contrib)
        r = nxt
    return pd.DataFrame({"node": nodes, "pr": r})


def test_personalized_matches_reference_both_tiers_and_oracle():
    import duckdb

    from knowledgegraphs_ray.graph.pagerank import pagerank_oracle_sql

    edges = _random_edges(120, 800, seed=23)
    # seeds = the n1* bucket (n1, n10..n19, n100..n119)
    exp = _ppr_reference(edges, iters=4, prefix="n1")
    got_bc = _run(edges, iters=4, n_blocks=4, seed_prefix="n1")
    got_jn = _run(edges, iters=4, n_blocks=4, seed_prefix="n1",
                  broadcast_limit=0)
    exp = exp.sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_bc, exp)
    pd.testing.assert_frame_equal(got_jn, exp)
    # non-seed nodes never receive teleport mass
    non_seed = ~got_bc["node"].str.startswith("n1")
    assert (got_bc.loc[non_seed, "pr"] >= 0).all()

    con = duckdb.connect()
    con.register("edges_df", edges)
    gold = con.execute(
        pagerank_oracle_sql("SELECT src, dst FROM edges_df", iters=4,
                            seed_prefix="n1")
    ).fetchdf().sort_values("node").reset_index(drop=True)
    gold["pr"] = gold["pr"].astype("int64")
    pd.testing.assert_frame_equal(got_bc, gold)
