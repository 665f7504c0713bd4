"""Multi-source BFS hop distances over a (src, dst) string-node edge Dataset.

Graph-analytics companion to ``graph/components.py`` / ``graph/pagerank.py``:
the shortest hop distance from a SEED SET to every reachable node — the
"how far is this entity from the ontology core" signal (entity-importance
tiers, curriculum ordering by KG distance, blast-radius queries). The
reference ships its graph to GraphDB and leaves reachability to the store
(GraphDB_Util.java upload path); here BFS is a first-class distributed
operator.

Semantics: depth(n) = min hops from any seed to n, seeds at 0, reported
only for nodes with depth <= ``max_depth``; unreachable nodes are absent.
Seeds are the nodes whose id starts with ``seed_prefix`` (IRI namespaces
make prefixes the natural seed selector: ``kg:region/`` = "the region
entities").

Three tiers, exact-equivalent (tier-equivalence pytest):

* **driver BFS** (edge count <= ``driver_edge_limit``): edges collected
  once, factorized to a CSR adjacency, layer-at-a-time numpy frontier
  sweep. Right for post-filter subgraphs.
* **broadcast-frontier BFS** (edges beyond the limit, VISITED NODE count
  <= ``node_driver_limit``): the edge table stays distributed and
  materializes exactly once; each round the frontier node set broadcasts
  (``ray.put``) and one zero-copy Arrow ``is_in`` map over the edges
  emits per-block-distinct successors — only node IDs ever reach the
  driver, never edges. This is the 100-TB shape for graphs whose node
  set is driver-bounded (edge count is what explodes, node count rarely
  does); raises with guidance past the limit.
* **distributed Bellman-Ford rounds** (``tier="join"``, the unbounded
  path): the (node, depth) label table stays a Dataset; each round
  hash-joins the node-sized labels onto the exploded edges (labels flow
  along ``peer -> node``), takes per-batch partial mins before the small
  groupby, and checks the fixpoint with a distributed changed-row count.
  Depth only ever decreases and new labels are capped at ``max_depth``,
  so the loop fixes in <= max_depth + 1 rounds — no non-convergence
  branch exists. Same machinery as
  ``components.py:_components_propagation`` with int64 labels. Costs one
  full edge shuffle per round — pick it only when the node set itself
  exceeds driver memory.

The DuckDB twin (:func:`bfs_oracle_sql`) is a depth-capped recursive CTE
with ``min(depth)`` — polynomial because states are (node, depth <=
max_depth) pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from knowledgegraphs_ray.extract.joins import native_join
from knowledgegraphs_ray.util.blocks import compact_nonempty

_OUT_SCHEMA = pa.schema([("node", pa.large_string()), ("depth", pa.int64())])


def bfs_depths(
    edges: ray.data.Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    seed_prefix: str,
    max_depth: int = 8,
    undirected: bool = True,
    driver_edge_limit: int = 1_000_000,
    node_driver_limit: int = 50_000_000,
    tier: str = "auto",
) -> ray.data.Dataset:
    """(src, dst) edge multiset -> (node, depth): min hop distance from the
    ``seed_prefix`` node set, nodes beyond ``max_depth`` omitted.

    ``tier``: "auto" picks driver CSR below ``driver_edge_limit`` edges,
    else the broadcast-frontier sweep (raises past ``node_driver_limit``
    visited nodes — pass tier="join" for the unbounded shuffle path);
    "driver" / "broadcast" / "join" force a tier."""
    edges = edges.materialize()  # read twice (count + sweep/propagate)
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(_OUT_SCHEMA.empty_table())
    if tier == "driver" or (tier == "auto" and n_edges <= driver_edge_limit):
        return _bfs_driver(
            edges, src=src, dst=dst, seed_prefix=seed_prefix,
            max_depth=max_depth, undirected=undirected,
        )
    if tier in ("auto", "broadcast"):
        return _bfs_broadcast(
            edges, src=src, dst=dst, seed_prefix=seed_prefix,
            max_depth=max_depth, undirected=undirected,
            node_driver_limit=node_driver_limit,
        )
    return _bfs_propagation(
        edges, src=src, dst=dst, seed_prefix=seed_prefix,
        max_depth=max_depth, undirected=undirected,
    )


def _bfs_driver(
    edges, *, src, dst, seed_prefix, max_depth, undirected
) -> ray.data.Dataset:
    df = edges.select_columns([src, dst]).to_pandas()
    nodes, codes = np.unique(
        np.concatenate(
            [df[src].astype(str).to_numpy(), df[dst].astype(str).to_numpy()]
        ),
        return_inverse=True,
    )
    a, b = codes[: len(df)], codes[len(df):]
    if undirected:
        heads = np.concatenate([a, b])  # edge travels head -> tail
        tails = np.concatenate([b, a])
    else:
        heads, tails = a, b
    order = np.argsort(heads, kind="stable")
    heads, tails = heads[order], tails[order]
    offsets = np.searchsorted(heads, np.arange(len(nodes) + 1))

    depth = np.full(len(nodes), -1, dtype=np.int64)
    frontier = np.flatnonzero(np.char.startswith(nodes.astype(str), seed_prefix))
    depth[frontier] = 0
    for d in range(1, max_depth + 1):
        if len(frontier) == 0:
            break
        # all out-neighbors of the frontier, vectorized CSR gather
        counts = offsets[frontier + 1] - offsets[frontier]
        starts = np.repeat(offsets[frontier], counts)
        idx = starts + (np.arange(counts.sum()) -
                        np.repeat(np.cumsum(counts) - counts, counts))
        nxt = np.unique(tails[idx])
        frontier = nxt[depth[nxt] < 0]
        depth[frontier] = d
    seen = depth >= 0
    return ray.data.from_arrow(
        pa.table(
            {"node": pa.array(nodes[seen], pa.large_string()),
             "depth": pa.array(depth[seen], pa.int64())}
        )
    )


def _bfs_broadcast(
    edges, *, src, dst, seed_prefix, max_depth, undirected, node_driver_limit
) -> ray.data.Dataset:
    EDGE_SCHEMA = pa.schema([("node", pa.large_string()), ("peer", pa.large_string())])

    def explode(b: pa.Table) -> pa.Table:
        s = b[src].combine_chunks().cast(pa.large_string())
        d = b[dst].combine_chunks().cast(pa.large_string())
        if undirected:
            return pa.table(
                {"node": pa.concat_arrays([s, d]), "peer": pa.concat_arrays([d, s])}
            )
        return pa.table({"node": d, "peer": s})

    und = compact_nonempty(
        edges.map_batches(explode, batch_format="pyarrow"), EDGE_SCHEMA
    )  # materialized once; every round re-maps the SAME object-store blocks

    def seed_part(t: pa.Table) -> pa.Table:
        n = t["node"].combine_chunks()
        if not undirected:  # directed: sources appear only in the peer column
            n = pa.concat_arrays([n, t["peer"].combine_chunks()])
        return pa.table(
            {"node": pc.unique(pc.filter(n, pc.starts_with(n, seed_prefix)))}
        )

    seed_tbls = ray.get(
        und.map_batches(
            seed_part, batch_format="pyarrow", zero_copy_batch=True
        ).to_arrow_refs()
    )
    seeds = pc.unique(pa.concat_tables(seed_tbls)["node"].combine_chunks())
    if len(seeds) == 0:
        return ray.data.from_arrow(_OUT_SCHEMA.empty_table())

    visited_parts: list[pa.Array] = [seeds]
    depth_parts: list[np.ndarray] = [np.zeros(len(seeds), np.int64)]
    visited: pa.Array = seeds  # all visited nodes so far (for membership)
    frontier: pa.Array = seeds
    n_visited = len(seeds)
    for d in range(1, max_depth + 1):
        if len(frontier) == 0:
            break
        fr_ref = ray.put(frontier)

        def expand(t: pa.Table) -> pa.Table:
            fr = ray.get(fr_ref)  # zero-copy from the object store
            mask = pc.is_in(t["peer"].combine_chunks(), value_set=fr)
            return pa.table(
                {"node": pc.unique(pc.filter(t["node"].combine_chunks(), mask))}
            )

        cand_tbls = ray.get(
            und.map_batches(
                expand, batch_format="pyarrow", zero_copy_batch=True
            ).to_arrow_refs()
        )
        cand = pc.unique(pa.concat_tables(cand_tbls)["node"].combine_chunks())
        new = pc.filter(cand, pc.invert(pc.is_in(cand, value_set=visited)))
        n_visited += len(new)
        if n_visited > node_driver_limit:
            raise RuntimeError(
                f"bfs_depths broadcast tier: visited node count {n_visited} "
                f"exceeds node_driver_limit={node_driver_limit}; rerun with "
                "tier='join' (unbounded distributed rounds) or raise the limit"
            )
        if len(new):
            visited_parts.append(new)
            depth_parts.append(np.full(len(new), d, np.int64))
            visited = pa.concat_arrays(
                [a.cast(pa.large_string()) for a in (visited, new)]
            )
        frontier = new
    return ray.data.from_arrow(
        pa.table(
            {
                "node": pa.concat_arrays(
                    [a.cast(pa.large_string()) for a in visited_parts]
                ),
                "depth": pa.array(np.concatenate(depth_parts), pa.int64()),
            }
        )
    )


def _bfs_propagation(
    edges, *, src, dst, seed_prefix, max_depth, undirected
) -> ray.data.Dataset:
    from ray.data.aggregate import Min

    EDGE_SCHEMA = pa.schema([("node", pa.large_string()), ("peer", pa.large_string())])
    LABEL_SCHEMA = pa.schema([("node", pa.large_string()), ("depth", pa.int64())])

    def explode(b: pa.Table) -> pa.Table:
        s = b[src].combine_chunks().cast(pa.large_string())
        d = b[dst].combine_chunks().cast(pa.large_string())
        if undirected:
            return pa.table(
                {"node": pa.concat_arrays([s, d]), "peer": pa.concat_arrays([d, s])}
            )
        return pa.table({"node": d, "peer": s})

    und = compact_nonempty(
        edges.map_batches(explode, batch_format="pyarrow"), EDGE_SCHEMA
    ).materialize()

    def partial_min(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("node", as_index=False)["depth"].min()

    def stabilize(df: pd.DataFrame) -> pd.DataFrame:
        return df.reindex(columns=["node", "depth"]).astype(
            {"node": "large_string[pyarrow]", "depth": "int64"}
        )

    def group_min(ds: ray.data.Dataset) -> ray.data.Dataset:
        combined = ds.map_batches(partial_min, batch_format="pandas")
        agg = combined.groupby("node").aggregate(Min("depth", alias_name="depth"))
        return compact_nonempty(
            agg.map_batches(stabilize, batch_format="pandas"), LABEL_SCHEMA
        )

    def seed_block(t: pa.Table) -> pa.Table:
        n = t["node"].combine_chunks()
        if not undirected:  # directed: sources appear only in the peer column
            n = pa.concat_arrays([n, t["peer"].combine_chunks()])
        mask = pc.starts_with(n, seed_prefix)
        seeds = pc.filter(n, mask)
        return pa.table(
            {"node": seeds, "depth": pa.array(np.zeros(len(seeds), np.int64))}
        )

    labels = group_min(
        compact_nonempty(
            und.map_batches(seed_block, batch_format="pyarrow", zero_copy_batch=True),
            LABEL_SCHEMA,
        )
    ).materialize()
    if labels.count() == 0:
        return ray.data.from_arrow(_OUT_SCHEMA.empty_table())

    def n_changed(old: ray.data.Dataset, new: ray.data.Dataset) -> int:
        """Distributed count of nodes whose depth appeared or decreased —
        node-sized LEFT join of new onto old, no driver materialization."""
        prev = old.map_batches(
            lambda t: t.rename_columns(["node", "prev"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        j = native_join(new, prev, left_on="node", right_on="node", how="left_outer")
        diff = j.map_batches(
            lambda df: pd.DataFrame(
                {
                    "changed": (
                        df["prev"].isna() | (df["depth"] != df["prev"])
                    ).astype("int64")
                }
            ),
            batch_format="pandas",
        )
        return int(diff.sum("changed") or 0)

    for _ in range(max_depth + 1):
        by_peer = labels.map_batches(
            lambda t: t.rename_columns(["peer", "depth"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )
        via = native_join(und, by_peer, left_on="peer", right_on="peer")

        def step(t: pa.Table) -> pa.Table:
            d = pc.add(t["depth"].combine_chunks().cast(pa.int64()), 1)
            keep = pc.less_equal(d, max_depth)
            return pa.table(
                {"node": pc.filter(t["node"].combine_chunks(), keep),
                 "depth": pc.filter(d, keep)}
            )

        candidates = compact_nonempty(
            via.select_columns(["node", "depth"]).map_batches(
                step, batch_format="pyarrow"
            ),
            LABEL_SCHEMA,
        )
        labels_new = group_min(candidates.union(labels)).materialize()
        changed = n_changed(labels, labels_new)
        labels = labels_new
        if changed == 0:
            return labels
    # depth caps at max_depth, so round max_depth+1 is a fixpoint no-op by
    # construction — reaching here means n_changed is broken, not the graph
    raise AssertionError("bfs_depths: fixpoint not reached past the depth cap")


def bfs_oracle_sql(edges_sql: str, *, seed_prefix: str, max_depth: int = 8) -> str:
    """DuckDB oracle: depth-capped recursive CTE, depth = min over (node,
    depth) states. ``edges_sql`` must select (src, dst); undirected."""
    return f"""
WITH RECURSIVE e AS ({edges_sql}),
und AS (
  SELECT src AS u, dst AS v FROM e
  UNION ALL SELECT dst AS u, src AS v FROM e
), seeds AS (
  SELECT DISTINCT u AS node FROM und WHERE starts_with(u, '{seed_prefix}')
), walk(node, depth) AS (
  SELECT node, 0 FROM seeds
  UNION
  SELECT u.v, w.depth + 1 FROM und u JOIN walk w ON w.node = u.u
  WHERE w.depth < {max_depth}
)
SELECT node, CAST(min(depth) AS BIGINT) AS depth FROM walk GROUP BY node
"""
