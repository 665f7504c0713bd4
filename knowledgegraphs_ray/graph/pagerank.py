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

* **broadcast** (HLL node estimate <= 0.8 × ``broadcast_limit``): the node
  set is built by a tree-unique merge over edge blocks (no shuffle), edges
  are integer-encoded ONCE against the broadcast index and materialized;
  each iteration ships one node-sized int64 rank array via ``ray.put``,
  scatter-adds per-group dense contribution vectors (int64-exact), and
  tree-sums <= 32 of them. NOTHING shuffles, ever — per-iteration cost is
  one map pass over encoded edges + O(log tasks) dense adds.
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
    seed_prefix: str | None = None,
) -> ray.data.Dataset:
    """(src, dst) edge multiset -> (node, pr) with ``pr`` the int64
    fixed-point rank after ``iters`` synchronous iterations.

    ``seed_prefix``: PERSONALIZED PageRank — the teleport mass lands only
    on nodes whose name starts with the prefix (pr_0 = scale on seeds, 0
    elsewhere; the per-iteration base term is seed-masked the same way).
    Relevance-from-seeds ranking for KG neighborhoods; identical integer
    arithmetic, so the unrolled-CTE oracle stays bit-exact (the prefix
    must not contain SQL LIKE wildcards)."""
    assert 0 < damping_pct < 100
    base = (scale * (100 - damping_pct)) // 100

    # the edge list is the loop invariant and every tier reads it at least
    # twice (node scan + encode/degree/join passes) — materialize ONCE so an
    # expensive upstream (e.g. the triple-extraction kernel) never re-runs;
    # at cluster scale the blocks live in / spill from the object store
    edges = edges.materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.string()), "pr": pa.array([], pa.int64())})
        )
    # an HLL sketch (±1.6%) picks the tier without paying a distinct-node
    # shuffle: below the (margin-guarded) limit the broadcast tier builds
    # its exact node set with a tree-unique merge instead
    est = _estimate_node_count(edges, src, dst)
    if est <= 0.8 * broadcast_limit:
        return _pagerank_broadcast(
            edges, src=src, dst=dst, iters=iters,
            damping_pct=damping_pct, scale=scale, base=base,
            seed_prefix=seed_prefix,
        )
    nodes = _distinct_nodes(edges, src, dst).materialize()
    return _pagerank_join(
        edges, nodes, src=src, dst=dst, iters=iters,
        damping_pct=damping_pct, scale=scale, base=base,
        seed_prefix=seed_prefix,
    )


def _estimate_node_count(edges: ray.data.Dataset, src: str, dst: str) -> int:
    """Approximate distinct src ∪ dst: per-block HLL registers (4 KiB each)
    max-merged on the driver — one cheap map pass, no shuffle."""
    import polars as pl

    from knowledgegraphs_ray.util.hll import (
        DEFAULT_P,
        hll_add_hashes,
        hll_estimate,
        hll_merge,
        hll_new,
    )

    def sketch(b: pa.Table) -> pd.DataFrame:
        s = pl.from_arrow(
            pa.table({"v": pa.chunked_array(
                [b[src].combine_chunks(), b[dst].combine_chunks()]
            ).cast(pa.string())})
        )["v"]
        h = s.hash(seed=7).to_numpy().astype(np.uint64)
        return pd.DataFrame({"regs": [hll_add_hashes(hll_new(DEFAULT_P), h)]})

    parts = edges.map_batches(
        sketch, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    regs = hll_new(DEFAULT_P)
    for r in parts["regs"]:
        regs = hll_merge(regs, np.asarray(r, dtype=np.uint8))
    return int(round(hll_estimate(regs)))


def _pagerank_broadcast(
    edges, *, src, dst, iters, damping_pct, scale, base, seed_prefix=None
) -> ray.data.Dataset:
    # exact node set via tree-unique over the edge blocks (per-leaf
    # pc.unique, pairwise unique-merge — O(log blocks) rounds, node-sized
    # intermediates, no hash shuffle); sorted for determinism. Driver-held
    # (<= ~broadcast_limit by the HLL tier guard), broadcast as an Arrow
    # array — pc.index_in is a vectorized hash lookup, no Python strings
    # per edge.
    @ray.remote
    def leaf_unique(block: pa.Table) -> pa.Array:
        return pc.unique(
            pa.chunked_array(
                [block[src].combine_chunks(), block[dst].combine_chunks()]
            ).cast(pa.string())
        )

    @ray.remote
    def merge_unique(a: pa.Array, b: pa.Array) -> pa.Array:
        return pc.unique(pa.chunked_array([a, b]).combine_chunks())

    refs = [leaf_unique.remote(r) for r in edges.to_arrow_refs()]
    while len(refs) > 1:
        nxt = [merge_unique.remote(refs[i], refs[i + 1]) for i in range(0, len(refs) - 1, 2)]
        if len(refs) % 2:
            nxt.append(refs[-1])
        refs = nxt
    node_pa = ray.get(refs[0])
    node_pa = node_pa.take(pc.array_sort_indices(node_pa))
    node_arr = node_pa.to_numpy(zero_copy_only=False)
    vs_ref = ray.put(node_pa)
    n = len(node_arr)

    class Encode:
        """String edges -> int64 (s, d) via pc.index_in against the
        broadcast node value set; instance-passed (task pool — no actor
        spawn), the set ray.get once per worker process (plasma-local
        after the first call)."""

        def __init__(self, ref):
            self.ref = ref
            self._vs = None

        def __call__(self, b: pa.Table) -> pa.Table:
            if self._vs is None:
                self._vs = ray.get(self.ref)
            s = pc.index_in(b[src].combine_chunks().cast(pa.string()), self._vs)
            d = pc.index_in(b[dst].combine_chunks().cast(pa.string()), self._vs)
            return pa.table({"s": s.cast(pa.int64()), "d": d.cast(pa.int64())})

    enc = edges.map_batches(
        Encode(vs_ref), batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # group the encoded edge blocks into <= 32 reduce tasks up front; the
    # grouping is the loop invariant, so every iteration reuses it
    all_refs = enc.to_arrow_refs()
    n_tasks = max(1, min(32, len(all_refs)))
    groups = [all_refs[i::n_tasks] for i in range(n_tasks) if all_refs[i::n_tasks]]

    @ray.remote
    def dense_deg(blocks: list) -> np.ndarray:
        out = np.zeros(n, dtype=np.int64)
        for b in ray.get(blocks):  # refs nested in a list resolve manually
            cnt = np.bincount(b["s"].to_numpy(zero_copy_only=False), minlength=n)
            out += cnt.astype(np.int64)
        return out

    @ray.remote
    def dense_contrib(blocks: list, r: np.ndarray, deg: np.ndarray) -> np.ndarray:
        # r/deg are top-level ObjectRef args — Ray resolves them zero-copy
        # from plasma; plain tasks (no actor pool churn per iteration)
        out = np.zeros(n, dtype=np.int64)
        for b in ray.get(blocks):
            s = b["s"].to_numpy(zero_copy_only=False)
            d = b["d"].to_numpy(zero_copy_only=False)
            c = (r[s] * damping_pct) // 100 // deg[s]
            np.add.at(out, d, c)  # int64 scatter-add: exact, no float round-trip
        return out

    @ray.remote
    def add2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return a + b

    def tree_sum(refs: list) -> np.ndarray:
        # node-sized dense vectors tree-reduce in O(log tasks) rounds —
        # the iteration never shuffles the edge set (the r1-r3 design paid a
        # 2M-row hash exchange per iteration; this ships <= 32 dense arrays)
        while len(refs) > 1:
            nxt = [add2.remote(refs[i], refs[i + 1]) for i in range(0, len(refs) - 1, 2)]
            if len(refs) % 2:
                nxt.append(refs[-1])
            refs = nxt
        return ray.get(refs[0])

    outdeg = tree_sum([dense_deg.remote(g) for g in groups])
    outdeg_ref = ray.put(outdeg)

    if seed_prefix is None:
        base_vec = np.full(n, base, dtype=np.int64)
        ranks = np.full(n, scale, dtype=np.int64)
    else:
        # node-sized seed mask: teleport mass only on the seed set
        seed = pc.starts_with(node_pa, seed_prefix).to_numpy(zero_copy_only=False)
        base_vec = np.where(seed, np.int64(base), np.int64(0))
        ranks = np.where(seed, np.int64(scale), np.int64(0))
    for _ in range(iters):
        ranks_ref = ray.put(ranks)
        total = tree_sum(
            [dense_contrib.remote(g, ranks_ref, outdeg_ref) for g in groups]
        )
        ranks = base_vec + total

    return ray.data.from_arrow(
        pa.table({"node": pa.array(node_arr, pa.string()), "pr": pa.array(ranks)})
    )


def _pagerank_join(
    edges, nodes, *, src, dst, iters, damping_pct, scale, base, seed_prefix=None
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

    def init_ranks(b: pa.Table) -> pa.Table:
        if seed_prefix is None:
            pr = pa.array(np.full(len(b), scale, np.int64))
        else:
            seed = pc.starts_with(b["node"].combine_chunks(), seed_prefix)
            pr = pc.if_else(seed, pa.scalar(scale, pa.int64()), pa.scalar(0, pa.int64()))
        return pa.table({"node": b["node"], "pr": pr})

    ranks = nodes.map_batches(
        init_ranks, batch_format="pyarrow", zero_copy_batch=True
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
            if seed_prefix is None:
                b_vec = np.int64(base)
            else:
                b_vec = np.where(
                    df["node"].str.startswith(seed_prefix).to_numpy(),
                    np.int64(base), np.int64(0),
                )
            return pd.DataFrame({"node": df["node"], "pr": b_vec + c})

        ranks = nx.map_batches(finish, batch_format="pandas").materialize()

    return ranks


def pagerank_oracle_sql(
    edges_sql: str,
    *,
    iters: int = 5,
    damping_pct: int = 85,
    scale: int = SCALE,
    seed_prefix: str | None = None,
) -> str:
    """Unrolled-CTE DuckDB oracle computing the identical fixed-point
    iteration. ``edges_sql`` must select columns (src, dst). DuckDB sums
    BIGINT into HUGEINT; the CAST back to BIGINT is safe because the sum is
    bounded by the total rank mass. ``seed_prefix`` emits the personalized
    variant (seed-masked init and base term; prefix must be LIKE-safe)."""
    base = (scale * (100 - damping_pct)) // 100
    if seed_prefix is None:
        init_expr = f"CAST({scale} AS BIGINT)"
        base_expr = str(base)
    else:
        seed_pred = f"n.node LIKE '{seed_prefix}%'"
        init_expr = (
            f"CAST(CASE WHEN node LIKE '{seed_prefix}%' THEN {scale} ELSE 0 END"
            " AS BIGINT)"
        )
        base_expr = f"(CASE WHEN {seed_pred} THEN {base} ELSE 0 END)"
    parts = [
        f"WITH edges AS ({edges_sql}),",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),",
        "outdeg AS (SELECT src AS node, count(*) AS outdeg FROM edges GROUP BY src),",
        f"r0 AS (SELECT node, {init_expr} AS pr FROM nodes),",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"r{i} AS (SELECT n.node, CAST({base_expr} + coalesce(s.c, 0) AS BIGINT) AS pr "
            f"FROM nodes n LEFT JOIN ("
            f"SELECT e.dst AS node, sum((r.pr * {damping_pct}) // 100 // d.outdeg) AS c "
            f"FROM edges e JOIN r{i-1} r ON r.node = e.src "
            f"JOIN outdeg d ON d.node = e.src GROUP BY e.dst) s ON s.node = n.node),"
        )
    body = "\n".join(parts).rstrip(",")
    return f"{body}\nSELECT node, pr FROM r{iters}"
