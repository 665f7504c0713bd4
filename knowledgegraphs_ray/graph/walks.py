"""Deterministic random walks over a (src, dst) edge Dataset — the
corpus generator for DeepWalk/node2vec-style KG embeddings (the
reference leaves graph learning to its GraphDB export; here walk
generation is a first-class distributed operator).

Determinism: the walk makes NO random choices at run time. At node x,
walk w, step t the next hop is the neighbor at sorted rank

    H(x, w, t) mod deg(x),   H = first 8 bytes of md5(x ␟ w ␟ t)

over the DISTINCT, ascending-sorted neighbor list of x. md5 makes the
choice bit-reproducible in SQL (``('0x' || substr(md5(...), 1, 16))
::UBIGINT`` — the stratified_sample discipline), so the whole walk set
has an exact unrolled-CTE DuckDB twin. Walks at sink nodes (no
out-neighbors) terminate early; the emitted prefix is kept.

Tiers, exact-equivalent (tier-equivalence pytest):

* **broadcast** (default, distinct adjacency ≤ ``driver_edge_limit``):
  the deduped adjacency is built into one CSR (sorted node index,
  indptr, neighbor array), ``ray.put`` ONCE; each map task walks its
  slice of the start set to full depth locally — embarrassingly
  parallel, ZERO shuffles, per-walk state never leaves the task.
* **join** (beyond the limit): adjacency is ranked once via a single
  hash exchange (per-node sorted cumcount); each step is two bounded
  hash joins — frontier×degree (compute the rank), then
  frontier×adjacency on the composite (node, rank) key. Frontier size
  is constant (starts × walks), so per-step cost is frontier-bounded;
  only the adjacency side is edge-sized.

Output rows: (start, walk, step, node) — step 0 is the start itself.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from knowledgegraphs_ray.extract.joins import native_join
from knowledgegraphs_ray.util.blocks import compact_nonempty


def _nparts() -> int:
    return max(2, min(32, int(ray.cluster_resources().get("CPU", 8))))


def _md5_u64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")


def _step_ranks(cur: np.ndarray, walk: np.ndarray, step: int,
                deg: np.ndarray) -> np.ndarray:
    """Vectorized-ish rank choice: H(cur ␟ walk ␟ step) % deg."""
    n = len(cur)
    h = np.fromiter(
        (
            _md5_u64(f"{c}\x1f{w}\x1f{step}")
            for c, w in zip(cur, walk)
        ),
        dtype=np.uint64,
        count=n,
    )
    return (h % deg.astype(np.uint64)).astype(np.int64)


def random_walks(
    edges: ray.data.Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    start_prefix: str | None = None,
    walk_len: int = 4,
    walks_per_node: int = 1,
    tier: str = "auto",
    driver_edge_limit: int = 5_000_000,
) -> ray.data.Dataset:
    """-> (start, walk, step, node): ``walks_per_node`` deterministic
    walks of up to ``walk_len`` hops from every distinct node matching
    ``start_prefix`` (all nodes when None), over the DIRECTED distinct
    adjacency src -> dst."""
    assert tier in ("auto", "broadcast", "join")
    edges = edges.select_columns([src, dst]).materialize()

    # distinct adjacency: per-block distinct partials, ONE hash exchange
    # on the source node (shared by both tiers; the broadcast tier then
    # collects the already-deduped rows)
    def adj_partial(b: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "node": b[src].to_numpy(zero_copy_only=False),
                "nbr": b[dst].to_numpy(zero_copy_only=False),
            }
        )
        return df.drop_duplicates()

    nparts = _nparts()
    parts = edges.map_batches(
        adj_partial, batch_format="pyarrow", zero_copy_batch=True
    )

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(df["node"].to_numpy()) % np.uint64(nparts)
        return df.assign(__b=h.astype(np.int64))

    def ranked(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["node", "nbr"]).sort_values(
            ["node", "nbr"], kind="mergesort"
        )
        codes, _ = pd.factorize(g["node"], sort=False)
        counts = np.bincount(codes) if len(codes) else np.empty(0, np.int64)
        rnk = np.arange(len(g), dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        return pd.DataFrame(
            {
                "node": g["node"].to_numpy(),
                "nbr": g["nbr"].to_numpy(),
                "rnk": rnk,
                "deg": np.repeat(counts, counts).astype(np.int64),
            }
        )

    adj = (
        parts.map_batches(bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(lambda g: ranked(g.drop(columns=["__b"])), batch_format="pandas")
        .materialize()
    )
    n_adj = adj.count()

    # start set: distinct src ∪ dst filtered by prefix (per-block unique
    # partials merged through the same exchange)
    def node_partial(b: pa.Table) -> pa.Table:
        u = pc.unique(
            pa.chunked_array(
                [b[src].combine_chunks(), b[dst].combine_chunks()]
            ).cast(pa.string())
        )
        if start_prefix is not None:
            u = u.filter(pc.starts_with(u, start_prefix))
        return pa.table({"start": u})

    def start_bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(df["start"].to_numpy()) % np.uint64(nparts)
        return df.assign(__b=h.astype(np.int64))

    starts = (
        edges.map_batches(node_partial, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(start_bucket, batch_format="pandas")
        .groupby("__b")
        .map_groups(
            lambda g: g.drop(columns=["__b"]).drop_duplicates(),
            batch_format="pandas",
        )
        .materialize()
    )

    use_broadcast = tier == "broadcast" or (
        tier == "auto" and n_adj <= driver_edge_limit
    )
    if use_broadcast:
        return _walks_broadcast(
            adj, starts, walk_len=walk_len, walks_per_node=walks_per_node,
            driver_edge_limit=driver_edge_limit,
        )
    return _walks_join(
        adj, starts, walk_len=walk_len, walks_per_node=walks_per_node,
        nparts=nparts,
    )


def _walks_broadcast(
    adj: ray.data.Dataset,
    starts: ray.data.Dataset,
    *,
    walk_len: int,
    walks_per_node: int,
    driver_edge_limit: int,
) -> ray.data.Dataset:
    n_adj = adj.count()
    if n_adj > driver_edge_limit:
        raise RuntimeError(
            f"random_walks broadcast tier: {n_adj} distinct adjacency rows "
            f"> driver_edge_limit={driver_edge_limit}; use tier='join'"
        )
    a = adj.to_pandas().sort_values(["node", "nbr"], kind="mergesort")
    nodes, first_idx = np.unique(a["node"].to_numpy(), return_index=True)
    nbrs = a["nbr"].to_numpy()
    counts = np.diff(np.append(first_idx, len(a)))
    indptr = np.concatenate([[0], np.cumsum(counts)])
    csr_ref = ray.put((nodes, indptr.astype(np.int64), nbrs))

    class Walker:
        def __init__(self, ref, walk_len, walks_per_node):
            self.ref = ref
            self.walk_len = walk_len
            self.k = walks_per_node
            self._csr = None

        def __call__(self, b: pa.Table) -> pd.DataFrame:
            if self._csr is None:
                self._csr = ray.get(self.ref)
            nodes, indptr, nbrs = self._csr
            # level-synchronous frontier: every vector op (searchsorted,
            # degree gather, neighbor gather) runs over the whole active
            # frontier at once; only the md5 rank choice stays per-row
            # (the SQL-twin determinism contract, see _step_ranks)
            s0 = b["start"].to_numpy(zero_copy_only=False)
            k = self.k
            start = np.repeat(s0, k)
            walk = np.tile(np.arange(k, dtype=np.int64), len(s0))
            cur = start.copy()
            outs = [
                pd.DataFrame(
                    {
                        "start": start,
                        "walk": walk,
                        "step": np.int64(0),
                        "node": cur,
                    }
                )
            ]
            idx = np.arange(len(cur))
            for t in range(1, self.walk_len + 1):
                c = cur[idx]
                i = np.searchsorted(nodes, c)
                i_cl = np.minimum(i, len(nodes) - 1)
                ok = nodes[i_cl] == c  # sinks terminate their walk
                idx = idx[ok]
                if len(idx) == 0:
                    break
                i = i_cl[ok]
                deg = (indptr[i + 1] - indptr[i]).astype(np.int64)
                r = _step_ranks(cur[idx], walk[idx], t, deg)
                nxt = nbrs[indptr[i] + r]
                cur[idx] = nxt
                outs.append(
                    pd.DataFrame(
                        {
                            "start": start[idx],
                            "walk": walk[idx],
                            "step": np.int64(t),
                            "node": nxt,
                        }
                    )
                )
            return pd.concat(outs, ignore_index=True)

    return starts.map_batches(
        Walker(csr_ref, walk_len, walks_per_node),
        batch_format="pyarrow",
        batch_size=4096,
    )


def _walks_join(
    adj: ray.data.Dataset,
    starts: ray.data.Dataset,
    *,
    walk_len: int,
    walks_per_node: int,
    nparts: int,
) -> ray.data.Dataset:
    node_t = pa.string()
    ADJ_SCHEMA = pa.schema(
        [("node", node_t), ("nbr", node_t), ("rnk", pa.int64()), ("deg", pa.int64())]
    )
    adj = compact_nonempty(
        adj.map_batches(lambda t: t.cast(ADJ_SCHEMA), batch_format="pyarrow"),
        ADJ_SCHEMA,
    )
    deg = adj.map_batches(
        lambda df: df[df["rnk"] == 0][["node", "deg"]], batch_format="pandas"
    )
    DEG_SCHEMA = pa.schema([("node", node_t), ("deg", pa.int64())])
    deg = compact_nonempty(
        deg.map_batches(lambda t: t.cast(DEG_SCHEMA), batch_format="pyarrow"),
        DEG_SCHEMA,
    )

    def fan(df: pd.DataFrame) -> pd.DataFrame:
        s = np.repeat(df["start"].to_numpy(), walks_per_node)
        w = np.tile(np.arange(walks_per_node, dtype=np.int64), len(df))
        return pd.DataFrame(
            {"start": s, "walk": w, "step": np.int64(0), "node": s}
        )

    frontier = starts.map_batches(fan, batch_format="pandas").materialize()
    FRONT_SCHEMA = pa.schema(
        [("start", node_t), ("walk", pa.int64()),
         ("step", pa.int64()), ("node", node_t)]
    )
    out_steps = [frontier]
    for t in range(1, walk_len + 1):
        f = compact_nonempty(
            frontier.map_batches(
                lambda tb: tb.cast(FRONT_SCHEMA), batch_format="pyarrow"
            ),
            FRONT_SCHEMA,
        )
        if f.count() == 0:
            break
        with_deg = native_join(
            f, deg, left_on="node", right_on="node", num_partitions=nparts
        )

        def pick(df: pd.DataFrame, step=t) -> pd.DataFrame:
            if df.empty:
                return pd.DataFrame(
                    {
                        "start": pd.Series([], dtype=object),
                        "walk": pd.Series([], dtype="int64"),
                        "node": pd.Series([], dtype=object),
                        "rnk": pd.Series([], dtype="int64"),
                    }
                )
            r = _step_ranks(
                df["node"].to_numpy(), df["walk"].to_numpy(), step,
                df["deg"].to_numpy(),
            )
            return pd.DataFrame(
                {
                    "start": df["start"],
                    "walk": df["walk"].astype("int64"),
                    "node": df["node"],
                    "rnk": r,
                }
            )

        keyed = with_deg.map_batches(pick, batch_format="pandas")
        KEY_SCHEMA = pa.schema(
            [("start", node_t), ("walk", pa.int64()),
             ("node", node_t), ("rnk", pa.int64())]
        )
        keyed = compact_nonempty(
            keyed.map_batches(lambda tb: tb.cast(KEY_SCHEMA), batch_format="pyarrow"),
            KEY_SCHEMA,
        )
        stepped = native_join(
            keyed,
            adj.map_batches(
                lambda tb: tb.rename_columns(["node", "next", "rnk", "deg"]),
                batch_format="pyarrow",
            ),
            left_on=("node", "rnk"),
            right_on=("node", "rnk"),
            num_partitions=nparts,
        )
        frontier = stepped.map_batches(
            lambda df, step=t: pd.DataFrame(
                {
                    "start": df["start"],
                    "walk": df["walk"].astype("int64"),
                    "step": np.int64(step),
                    "node": df["next"],
                }
            ),
            batch_format="pandas",
        ).materialize()
        out_steps.append(frontier)

    out = out_steps[0]
    if len(out_steps) > 1:
        out = out.union(*out_steps[1:])
    return out.map_batches(
        lambda tb: tb.cast(FRONT_SCHEMA), batch_format="pyarrow"
    )


def random_walks_oracle_sql(
    edges_sql: str,
    *,
    start_prefix: str | None = None,
    walk_len: int = 4,
    walks_per_node: int = 1,
) -> str:
    """Unrolled DuckDB twin: per step, join the frontier to the ranked
    adjacency on rnk = md5-u64(cur ␟ walk ␟ step) % deg."""
    prefix_pred = (
        f"WHERE node LIKE '{start_prefix}%'" if start_prefix is not None else ""
    )
    walks = ", ".join(str(w) for w in range(walks_per_node))
    parts = [
        f"WITH e AS ({edges_sql}),",
        "adj AS (SELECT DISTINCT src AS node, dst AS nbr FROM e),",
        "ranked AS (SELECT node, nbr, "
        "row_number() OVER (PARTITION BY node ORDER BY nbr) - 1 AS rnk, "
        "count(*) OVER (PARTITION BY node) AS deg FROM adj),",
        "allnodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),",
        f"starts AS (SELECT node AS start FROM allnodes {prefix_pred}),",
        f"s0 AS (SELECT start, UNNEST([{walks}]) AS walk, start AS cur FROM starts),",
    ]
    for t in range(1, walk_len + 1):
        parts.append(
            f"s{t} AS (SELECT s.start, s.walk, r.nbr AS cur "
            f"FROM s{t-1} s JOIN ranked r ON r.node = s.cur AND r.rnk = "
            f"CAST(('0x' || substr(md5(s.cur || chr(31) || "
            f"CAST(s.walk AS VARCHAR) || chr(31) || '{t}'), 1, 16))::UBIGINT "
            f"% CAST(r.deg AS UBIGINT) AS BIGINT)),"
        )
    body = "\n".join(parts).rstrip(",")
    selects = [
        f"SELECT start, CAST(walk AS BIGINT) AS walk, CAST({t} AS BIGINT) AS step, "
        f"cur AS node FROM s{t}"
        for t in range(walk_len + 1)
    ]
    return body + "\n" + "\nUNION ALL\n".join(selects)
