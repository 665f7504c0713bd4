"""graph/components.py — connected components over string-node edges.

Checks: (1) driver tier matches a brute-force reference on a seeded random
graph, (2) tier equivalence (driver union-find vs forced min-label
propagation) and block invariance, (3) non-convergence raises instead of
returning over-counted components, (4) DuckDB recursive-CTE oracle parity,
(5) hot_nodes top-k degree order, (6) empty-edge schema stability."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from knowledgegraphs_ray.graph.components import (
    components_oracle_sql,
    connected_components,
    hot_nodes,
)


def _reference(edges: pd.DataFrame) -> pd.DataFrame:
    """Brute-force label relaxation to fixpoint (small inputs only)."""
    label = {n: n for n in pd.unique(pd.concat([edges["src"], edges["dst"]]))}
    changed = True
    while changed:
        changed = False
        for a, b in zip(edges["src"], edges["dst"]):
            m = min(label[a], label[b])
            if label[a] != m or label[b] != m:
                label[a] = label[b] = m
                changed = True
    items = sorted(label)
    return pd.DataFrame({"node": items, "component": [label[n] for n in items]})


def _random_edges(n_nodes: int, n_edges: int, seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    s = rng.integers(0, n_nodes, n_edges)
    d = rng.integers(0, n_nodes, n_edges)
    keep = s != d
    return pd.DataFrame(
        {"src": [f"n{v:03d}" for v in s[keep]], "dst": [f"n{v:03d}" for v in d[keep]]}
    )


def _run(edges_df: pd.DataFrame, **kw) -> pd.DataFrame:
    ds = ray.data.from_pandas(edges_df)
    if "n_blocks" in kw:
        ds = ds.repartition(kw.pop("n_blocks"))
    out = connected_components(ds, **kw).to_pandas()
    return (
        out.astype({"node": "object", "component": "object"})
        .sort_values("node")
        .reset_index(drop=True)
    )


def test_driver_tier_matches_reference():
    edges = _random_edges(120, 90, seed=5)  # sparse: many small components
    got = _run(edges)
    pd.testing.assert_frame_equal(got, _reference(edges))


def test_tier_equivalence_and_block_invariance():
    edges = _random_edges(100, 70, seed=9)
    driver = _run(edges, n_blocks=3)
    propagated = _run(edges, n_blocks=7, driver_edge_limit=0)
    pd.testing.assert_frame_equal(driver, propagated)


def test_propagation_nonconvergence_raises():
    # an 8-node path has min-label distance 7 > max_iter: the propagation
    # tier must refuse to return partial (over-counted) labels
    chain = pd.DataFrame(
        {"src": [f"n{i:03d}" for i in range(7)],
         "dst": [f"n{i + 1:03d}" for i in range(7)]}
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        _run(chain, driver_edge_limit=0, max_iter=2)
    # and converges fine with headroom
    got = _run(chain, driver_edge_limit=0, max_iter=10)
    assert (got["component"] == "n000").all()


def test_oracle_parity_small(tmp_path):
    duckdb = pytest.importorskip("duckdb")
    edges = _random_edges(150, 100, seed=3)
    edges.to_parquet(tmp_path / "edges.parquet")
    sql = components_oracle_sql(
        f"SELECT src, dst FROM '{tmp_path / 'edges.parquet'}'"
    )
    exp = duckdb.sql(sql).df().sort_values("node").reset_index(drop=True)
    got = _run(edges)
    pd.testing.assert_frame_equal(got, exp)


def test_hot_nodes_topk():
    edges = pd.DataFrame(
        {"src": ["a"] * 5 + ["b"] * 3 + ["c"],
         "dst": ["x"] * 4 + ["y"] * 4 + ["z"]}
    )
    got = hot_nodes(ray.data.from_pandas(edges), node_col="dst", k=2).to_pandas()
    # tie between x and y at degree 4 broken by node ASC
    assert list(got["node"]) == ["x", "y"]
    assert list(got["degree"]) == [4, 4]
    out = hot_nodes(ray.data.from_pandas(edges), node_col="src", k=1).to_pandas()
    assert list(out["node"]) == ["a"] and list(out["degree"]) == [5]


def test_empty_edges():
    empty = pa.table({"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())})
    out = connected_components(ray.data.from_arrow(empty))
    assert out.schema().names == ["node", "component"]
    assert out.count() == 0
