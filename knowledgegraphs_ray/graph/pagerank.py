"""Integer fixed-point PageRank over a (src, dst) edge Dataset.

KG analytics companion to the extraction kernels: entity importance over
the link-triple graph (``pred LIKE 'kg:p_%'`` edges from
``extract/kernel.py``). The reference repo materializes its graph into
GraphDB and leaves ranking to the store; here the rank computation itself
is a first-class distributed operator.

All arithmetic is int64 fixed-point (micro-units, ``scale`` = 1e6) so the
result is bit-exact across tiers, block counts, AND the DuckDB oracle
(``pagerank_oracle_sql`` below emits the same unrolled iterations):

    pr_0(v)   = scale
    contrib(u)= (pr(u) * damping_pct) // 100 // outdeg(u)
    pr_t+1(v) = (scale * (100 - damping_pct)) // 100  +  sum_{u->v} contrib(u)

Floor division matches DuckDB's ``//`` on non-negative int64, and the
contribution sum is bounded by the total rank mass (n_nodes * scale), so
int64 never overflows below ~9e12 nodes. Dangling-node mass (nodes with no
out-edges) evaporates rather than being redistributed — the classic
"no dangling redistribution" variant — identically on both sides.

Two tiers, exact-equivalent (tier-equivalence pytest):

* **broadcast** (node count <= ``broadcast_limit``): edges are integer-
  encoded ONCE against a driver-held node index and materialized; each
  iteration ships one node-sized int64 rank array via ``ray.put`` and
  streams the encoded edges through a vectorized contribution kernel
  (per-batch ``groupby(dst).sum`` partials -> ``sum_partials``). No edge
  shuffle per iteration — the iteration cost is one map pass over edges
  plus a node-sized partial merge.
* **join** (beyond the broadcast limit): ranks stay a Dataset; each
  iteration is hash-join(edges_with_outdeg, ranks) -> per-batch partial
  sums by dst -> node left-join — the Pregel-style shuffle-per-superstep
  shape, used only when ranks genuinely cannot be broadcast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from knowledgegraphs_ray.extract.joins import bucket_join
from knowledgegraphs_ray.util.fastagg import sum_partials

SCALE = 1_000_000


def _distinct_nodes(edges: ray.data.Dataset, src: str, dst: str) -> ray.data.Dataset:
    """Distinct src ∪ dst via per-batch unique partials (one row per node
    per block) merged by key — never a full-edge shuffle."""

    def partial(b: pa.Table) -> pa.Table:
        # pure-Arrow unique: no Python string materialization per edge
        u = pc.unique(
            pa.chunked_array(
                [b[src].combine_chunks(), b[dst].combine_chunks()]
            ).cast(pa.string())
        )
        return pa.table({"node": u, "one": pa.array(np.ones(len(u), np.int64))})

    parts = edges.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return sum_partials(parts, keys=["node"], sum_cols=["one"]).drop_columns(["one"])


def pagerank(
    edges: ray.data.Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    damping_pct: int = 85,
    scale: int = SCALE,
    broadcast_limit: int = 5_000_000,
) -> ray.data.Dataset:
    """(src, dst) edge multiset -> (node, pr) with ``pr`` the int64
    fixed-point rank after ``iters`` synchronous iterations."""
    assert 0 < damping_pct < 100
    base = (scale * (100 - damping_pct)) // 100

    # the edge list is the loop invariant and every tier reads it at least
    # twice (node scan + encode/degree/join passes) — materialize ONCE so an
    # expensive upstream (e.g. the triple-extraction kernel) never re-runs;
    # at cluster scale the blocks live in / spill from the object store
    edges = edges.materialize()
    nodes = _distinct_nodes(edges, src, dst).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.string()), "pr": pa.array([], pa.int64())})
        )
    if n_nodes <= broadcast_limit:
        return _pagerank_broadcast(
            edges, nodes, src=src, dst=dst, iters=iters,
            damping_pct=damping_pct, scale=scale, base=base,
        )
    return _pagerank_join(
        edges, nodes, src=src, dst=dst, iters=iters,
        damping_pct=damping_pct, scale=scale, base=base,
    )


def _pagerank_broadcast(
    edges, nodes, *, src, dst, iters, damping_pct, scale, base
) -> ray.data.Dataset:
    # node index: sorted for determinism; node-count-sized on the driver
    # (<= broadcast_limit by construction). Broadcast as an Arrow array —
    # pc.index_in is a vectorized hash lookup, no Python strings per edge.
    node_tbl = pa.concat_tables(ray.get(nodes.to_arrow_refs())).combine_chunks()
    node_pa = pc.array_sort_indices(node_tbl["node"].combine_chunks())
    node_pa = node_tbl["node"].combine_chunks().take(node_pa)
    node_arr = node_pa.to_numpy(zero_copy_only=False)
    vs_ref = ray.put(node_pa)
    n = len(node_arr)

    class Encode:
        """String edges -> int64 (s, d) via pc.index_in against the
        broadcast node value set; the set ships once per actor."""

        def __init__(self):
            self._vs = ray.get(vs_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            s = pc.index_in(b[src].combine_chunks().cast(pa.string()), self._vs)
            d = pc.index_in(b[dst].combine_chunks().cast(pa.string()), self._vs)
            return pa.table({"s": s.cast(pa.int64()), "d": d.cast(pa.int64())})

    enc = edges.map_batches(
        Encode, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 8)
    ).materialize()

    # out-degree: per-batch bincount partials, merged on the driver
    # (node-sized — same bound as the index itself)
    def deg_partial(b: pa.Table) -> pd.DataFrame:
        cnt = np.bincount(b["s"].to_numpy(zero_copy_only=False), minlength=0)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"s": nz.astype(np.int64), "outdeg": cnt[nz].astype(np.int64)})

    deg_df = sum_partials(
        enc.map_batches(deg_partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=["s"], sum_cols=["outdeg"],
    ).to_pandas()
    outdeg = np.zeros(n, dtype=np.int64)
    outdeg[deg_df["s"].to_numpy()] = deg_df["outdeg"].to_numpy()
    outdeg_ref = ray.put(outdeg)

    ranks = np.full(n, scale, dtype=np.int64)
    for _ in range(iters):
        ranks_ref = ray.put(ranks)

        def contrib(b: pa.Table, _r=ranks_ref) -> pd.DataFrame:
            # ray.get of an int64 array is zero-copy from plasma — a plain
            # task (no actor pool churn per iteration) pays nothing per batch
            r, deg = ray.get(_r), ray.get(outdeg_ref)
            s = b["s"].to_numpy(zero_copy_only=False)
            d = b["d"].to_numpy(zero_copy_only=False)
            c = (r[s] * damping_pct) // 100 // deg[s]
            df = pd.DataFrame({"d": d, "c": c})
            return df.groupby("d", as_index=False, sort=False).agg(c=("c", "sum"))

        agg = sum_partials(
            enc.map_batches(contrib, batch_format="pyarrow", zero_copy_batch=True),
            keys=["d"], sum_cols=["c"],
        ).to_pandas()
        ranks = np.full(n, base, dtype=np.int64)
        if len(agg):
            ranks[agg["d"].to_numpy()] += agg["c"].to_numpy()

    return ray.data.from_arrow(
        pa.table({"node": pa.array(node_arr, pa.string()), "pr": pa.array(ranks)})
    )


def _pagerank_join(
    edges, nodes, *, src, dst, iters, damping_pct, scale, base
) -> ray.data.Dataset:
    # out-degree as a Dataset, hash-joined onto the edges exactly once; the
    # joined edge table is the loop invariant and is materialized so the
    # extraction upstream never re-runs per iteration
    def deg_partial(b: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({src: b[src].to_numpy(zero_copy_only=False)})
        return df.groupby(src, as_index=False, sort=False).agg(outdeg=(src, "size"))

    deg = sum_partials(
        edges.map_batches(deg_partial, batch_format="pyarrow", zero_copy_batch=True),
        keys=[src], sum_cols=["outdeg"],
    )
    sel = edges.select_columns([src, dst])
    edges_deg = bucket_join(
        sel, deg, left_on=src, right_on=src, how="inner",
        right_cols=[src, "outdeg"],
    ).materialize()

    ranks = nodes.map_batches(
        lambda b: pa.table(
            {"node": b["node"], "pr": pa.array(np.full(len(b), scale, np.int64))}
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()

    for _ in range(iters):
        j = bucket_join(
            edges_deg, ranks, left_on=src, right_on="node", how="inner",
            right_cols=["node", "pr"],
        )

        def contrib(df: pd.DataFrame) -> pd.DataFrame:
            c = (
                df["pr"].to_numpy(np.int64) * damping_pct // 100
                // df["outdeg"].to_numpy(np.int64)
            )
            out = pd.DataFrame({"node": df[dst], "c": c})
            return out.groupby("node", as_index=False, sort=False).agg(c=("c", "sum"))

        agg = sum_partials(
            j.map_batches(contrib, batch_format="pandas"),
            keys=["node"], sum_cols=["c"],
        )
        nx = bucket_join(
            nodes, agg, left_on="node", right_on="node", how="left",
            right_cols=["node", "c"],
        )

        def finish(df: pd.DataFrame) -> pd.DataFrame:
            c = df["c"].fillna(0).astype(np.int64)
            return pd.DataFrame({"node": df["node"], "pr": base + c})

        ranks = nx.map_batches(finish, batch_format="pandas").materialize()

    return ranks


def pagerank_oracle_sql(
    edges_sql: str,
    *,
    iters: int = 5,
    damping_pct: int = 85,
    scale: int = SCALE,
) -> str:
    """Unrolled-CTE DuckDB oracle computing the identical fixed-point
    iteration. ``edges_sql`` must select columns (src, dst). DuckDB sums
    BIGINT into HUGEINT; the CAST back to BIGINT is safe because the sum is
    bounded by the total rank mass."""
    base = (scale * (100 - damping_pct)) // 100
    parts = [
        f"WITH edges AS ({edges_sql}),",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),",
        "outdeg AS (SELECT src AS node, count(*) AS outdeg FROM edges GROUP BY src),",
        f"r0 AS (SELECT node, CAST({scale} AS BIGINT) AS pr FROM nodes),",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"r{i} AS (SELECT n.node, CAST({base} + coalesce(s.c, 0) AS BIGINT) AS pr "
            f"FROM nodes n LEFT JOIN ("
            f"SELECT e.dst AS node, sum((r.pr * {damping_pct}) // 100 // d.outdeg) AS c "
            f"FROM edges e JOIN r{i-1} r ON r.node = e.src "
            f"JOIN outdeg d ON d.node = e.src GROUP BY e.dst) s ON s.node = n.node),"
        )
    body = "\n".join(parts).rstrip(",")
    return f"{body}\nSELECT node, pr FROM r{iters}"
