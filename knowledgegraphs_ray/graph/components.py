"""Connected components over a (src, dst) string-node edge Dataset.

Graph-analytics companion to ``graph/pagerank.py``: component structure of
the KG link graph (the ``kg:p_*`` object-property triples). The reference
repo ships its graph to GraphDB and leaves reachability to the store
(GraphDB_Util.java upload path); here components are a first-class
distributed operator, shared in spirit with the near-dup clustering tier
(``dedup/minhash.py:components_by_propagation``) but over STRING node ids
(IRIs), where min-label = lexicographic minimum.

Representative convention (both tiers AND the SQL oracle): a node's
component id is the lexicographically smallest node reachable from it —
the same smaller-value-becomes-root rule as ``canon/unionfind.py``.

Two tiers, exact-equivalent (tier-equivalence pytest):

* **driver union-find** (edge count <= ``driver_edge_limit``): the verified
  edge list is collected once and folded through ``UnionFind``. Right for
  sparse post-filter edge sets (near-dup pairs, sampled subgraphs).
* **min-label propagation** (beyond the limit): labels stay a Dataset; each
  round hash-joins the node-sized label table onto the exploded edges,
  takes per-batch partial mins before the small groupby, and checks the
  fixpoint with a distributed changed-row count (labels only ever decrease
  lexicographically, so zero changes ⟺ fixpoint). No per-round driver
  collect; converges in O(graph diameter) rounds and raises on
  non-convergence rather than silently over-counting components.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from knowledgegraphs_ray.canon.unionfind import UnionFind
from knowledgegraphs_ray.extract.joins import native_join
from knowledgegraphs_ray.util.blocks import compact_nonempty

_OUT_SCHEMA = pa.schema(
    [("node", pa.large_string()), ("component", pa.large_string())]
)


def connected_components(
    edges: ray.data.Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    driver_edge_limit: int = 1_000_000,
    max_iter: int = 30,
) -> ray.data.Dataset:
    """(src, dst) edge multiset -> (node, component): every node that
    appears in any edge, labelled with the lexicographically smallest node
    of its undirected component."""
    edges = edges.materialize()  # read twice below (count + fold/propagate)
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(_OUT_SCHEMA.empty_table())
    if n_edges <= driver_edge_limit:
        return _components_driver(edges, src=src, dst=dst)
    return _components_propagation(edges, src=src, dst=dst, max_iter=max_iter)


def _components_driver(edges, *, src, dst) -> ray.data.Dataset:
    df = edges.select_columns([src, dst]).to_pandas()
    uf = UnionFind()
    for a, b in zip(df[src], df[dst]):
        uf.union(a, b)
    items = sorted(uf.parent)
    return ray.data.from_arrow(
        pa.table(
            {"node": pa.array(items, pa.large_string()),
             "component": pa.array([uf.find(x) for x in items], pa.large_string())}
        )
    )


def _components_propagation(edges, *, src, dst, max_iter) -> ray.data.Dataset:
    from ray.data.aggregate import Min

    EDGE_SCHEMA = pa.schema([("node", pa.large_string()), ("peer", pa.large_string())])
    LABEL_SCHEMA = pa.schema([("node", pa.large_string()), ("label", pa.large_string())])

    def explode(b: pa.Table) -> pa.Table:
        a = b[src].combine_chunks().cast(pa.large_string())
        bb = b[dst].combine_chunks().cast(pa.large_string())
        return pa.table(
            {"node": pa.concat_arrays([a, bb]), "peer": pa.concat_arrays([bb, a])}
        )

    und = compact_nonempty(
        edges.map_batches(explode, batch_format="pyarrow"), EDGE_SCHEMA
    )

    def partial_min(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("node", as_index=False)["label"].min()

    def stabilize(df: pd.DataFrame) -> pd.DataFrame:
        return df.reindex(columns=["node", "label"]).astype(
            {"node": "large_string[pyarrow]", "label": "large_string[pyarrow]"}
        )

    def group_min(ds: ray.data.Dataset) -> ray.data.Dataset:
        combined = ds.map_batches(partial_min, batch_format="pandas")
        agg = combined.groupby("node").aggregate(Min("label", alias_name="label"))
        return compact_nonempty(
            agg.map_batches(stabilize, batch_format="pandas"), LABEL_SCHEMA
        )

    # all renames below are pyarrow-level: a pandas round-trip would flip
    # string -> large_string and break the hash-join key types
    import pyarrow.compute as pc

    init = und.map_batches(
        lambda t: pa.table(
            {"node": t["node"], "label": pc.min_element_wise(t["node"], t["peer"])}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    labels = group_min(init)

    def n_changed(old: ray.data.Dataset, new: ray.data.Dataset) -> int:
        """Distributed count of nodes whose label strictly decreased — the
        fixpoint check; node-sized hash join, no driver materialization."""
        prev = old.map_batches(
            lambda t: t.rename_columns(["node", "prev"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        j = native_join(new, prev, left_on="node", right_on="node")
        diff = j.map_batches(
            lambda df: pd.DataFrame(
                {"changed": (df["label"] != df["prev"]).astype("int64")}
            ),
            batch_format="pandas",
        )
        return int(diff.sum("changed") or 0)

    converged = False
    for _ in range(max_iter):
        by_peer = labels.map_batches(
            lambda t: t.rename_columns(["peer", "label"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        via_peers = native_join(
            und, by_peer, left_on="peer", right_on="peer"
        ).select_columns(["node", "label"])
        labels_new = group_min(via_peers.union(labels))
        changed = n_changed(labels, labels_new)
        labels = labels_new
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(graph diameter exceeds max_iter); raise max_iter — returning "
            "partial labels would over-count components"
        )
    return labels.map_batches(
        lambda t: t.rename_columns(["node", "component"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def hot_nodes(
    edges: ray.data.Dataset,
    *,
    node_col: str = "dst",
    k: int = 20,
) -> ray.data.Dataset:
    """Top-k nodes by occurrence count in ``node_col`` (in-degree for dst,
    out-degree for src) — the hot-entity / skew detector the north rule's
    "skew-aware repartitioning of hot entities" keys off (the same count
    feeds ``extract/joins.py:bucket_join``'s salt threshold).

    Per-batch partial counts combine BEFORE the shuffle, so the groupby
    input is (distinct nodes per block)-sized, never edge-sized; the sort
    runs on the node-count-sized aggregate. Deterministic total order:
    (degree DESC, node ASC)."""
    from knowledgegraphs_ray.util.fastagg import sum_partials

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(node_col, as_index=False, sort=False).agg(
            degree=(node_col, "size")
        )
        return g.rename(columns={node_col: "node"})

    counts = sum_partials(
        edges.map_batches(partial, batch_format="pandas"),
        keys=["node"], sum_cols=["degree"],
    )
    return counts.sort(["degree", "node"], descending=[True, False]).limit(k)


def components_oracle_sql(edges_sql: str) -> str:
    """DuckDB oracle: undirected reachability via a recursive CTE, component
    representative = min reachable node (matches the UnionFind rule and the
    propagation fixpoint). ``edges_sql`` must select (src, dst)."""
    return f"""
WITH RECURSIVE e AS ({edges_sql}),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM e UNION ALL SELECT dst FROM e
  )
), und AS (
  SELECT src AS u, dst AS v FROM e
  UNION ALL SELECT dst AS u, src AS v FROM e
), walk(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT u.u, w.label FROM und u JOIN walk w ON w.node = u.v
)
SELECT node, min(label) AS component FROM walk GROUP BY node
"""
