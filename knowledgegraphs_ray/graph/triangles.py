"""Distributed triangle counting over a (src, dst) edge Dataset — the
degree-oriented wedge-enumeration algorithm (Schank & Wagner 2005 /
Suri & Vassilvitskii 2011 "Counting Triangles and the Curse of the Last
Reducer"), expressed as Ray Data batch transforms.

Graph-analytics companion to ``graph/pagerank.py`` / ``graph/components.py``:
per-node triangle participation is the local-clustering / community-density
signal (triangles / (deg·(deg−1)/2) is the clustering coefficient — emitted
as integers so the DuckDB twin is exact). Reference analogue: the reference
ships its KG to GraphDB and leaves graph analytics to the store; here the
computation is a first-class distributed operator.

Scale shape — why orientation, and where the data moves:

* Edges are canonicalized (u < v, self-loops dropped) and DISTINCT'd with
  per-block ``drop_duplicates`` partials merged by key — only slim
  (u, v, 1) rows shuffle, never payloads.
* Every edge is then ORIENTED from its lower-(degree, id) endpoint to its
  higher one. Under this total order each node's out-degree is
  O(sqrt(2m)), so the wedge stream Σ outdeg² is O(m^1.5) — the classic
  bound that tames hub nodes (the "curse of the last reducer"): a
  10M-neighbor hub generates ZERO wedges from its own adjacency because
  every incident edge points INTO it.
* Wedge generation is one hash exchange of the oriented edges on their
  source (16-byte rows for int ids), then fully-vectorized within-bucket
  all-pairs emission (numpy repeat arithmetic — no per-group Python loop).
* Closure is ONE hash join of wedges against oriented edges on the
  composite (x, y) key; matches ARE the triangles. Per-node counts are
  per-block partials merged by key (``sum_partials``).

Determinism: output is a set of integer counts — bit-exact vs the DuckDB
3-way self-join twin (``triangles_oracle_sql``) at any parallelism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from knowledgegraphs_ray.extract.joins import native_join
from knowledgegraphs_ray.util.blocks import compact_nonempty
from knowledgegraphs_ray.util.fastagg import sum_partials

_PHI = np.uint64(0x9E3779B97F4A7C15)


def _nparts() -> int:
    return max(2, min(32, int(ray.cluster_resources().get("CPU", 8))))


def _pairs_within_sorted_groups(codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Indices (a, b) of every within-group pair a < b, for ``codes`` a
    nondecreasing group-id array. Fully vectorized: element at local
    position l in a group of size k pairs with the k−1−l elements after it;
    repeat arithmetic builds both index arrays with no Python loop."""
    n = len(codes)
    if n == 0:
        e = np.empty(0, np.int64)
        return e, e
    k = np.bincount(codes)
    offs = np.concatenate([[0], np.cumsum(k)])[:-1].astype(np.int64)
    local = np.arange(n, dtype=np.int64) - np.repeat(offs, k)
    reps = np.repeat(k - 1, k) - local  # pairs led by each element
    a_idx = np.repeat(np.arange(n, dtype=np.int64), reps)
    total = int(reps.sum())
    run_starts = np.concatenate([[0], np.cumsum(reps)])[:-1].astype(np.int64)
    p_in_run = np.arange(total, dtype=np.int64) - np.repeat(run_starts, reps)
    b_idx = a_idx + 1 + p_in_run
    return a_idx, b_idx


def canonical_edges(
    edges: ray.data.Dataset, *, src: str = "src", dst: str = "dst"
) -> ray.data.Dataset:
    """-> distinct undirected (u, v) rows with u < v, self-loops dropped.
    Per-block dedup partials -> one slim merge; edge payloads never move."""

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        a, b = df[src], df[dst]
        lo = a.where(a <= b, b)
        hi = b.where(a <= b, a)
        out = pd.DataFrame({"u": lo.to_numpy(), "v": hi.to_numpy()})
        out = out[out["u"] != out["v"]].drop_duplicates()
        out["one"] = np.int64(1)
        return out

    parts = edges.map_batches(canon, batch_format="pandas")
    return sum_partials(parts, keys=["u", "v"], sum_cols=["one"]).drop_columns(
        ["one"]
    )


def cooccurrence_edges(
    ds: ray.data.Dataset,
    *,
    group_col: str,
    item_col: str,
    max_group: int | None = None,
    min_count: int = 1,
) -> ray.data.Dataset:
    """Market-basket graph construction: distinct (u, v) item pairs (u < v)
    that co-occur in at least ``min_count`` groups (order, session,
    document …).

    One hash exchange of slim (group, item) rows co-locates each group,
    then within-bucket all-pairs emission (vectorized) and a distinct
    merge. Pair volume is Σ k_g², so ``max_group`` is the documented skew
    guard: groups larger than it are DROPPED from edge generation (a
    100k-item group would emit 5e9 pairs; if you need those edges, sample
    the group upstream). ``None`` = no cap (fine for basket-sized groups).

    ``min_count`` counts DISTINCT groups per pair (each group contributes
    at most 1 — items are deduped per group before pair emission); the
    per-bucket partial is a vectorized value_count, so the support filter
    adds no extra exchange — the same merge that deduped now sums.
    """
    nparts = _nparts()

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[group_col, item_col]].drop_duplicates()
        h = pd.util.hash_array(out[group_col].to_numpy()) % np.uint64(nparts)
        return out.assign(__b=h.astype(np.int64))

    bucketed = ds.map_batches(slim, batch_format="pandas")

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates([group_col, item_col]).sort_values(
            [group_col, item_col], kind="mergesort"
        )
        codes, _ = pd.factorize(g[group_col], sort=False)
        if max_group is not None:
            k = np.bincount(codes)
            keep = (k <= max_group)[codes]
            g = g[keep]
            codes, _ = pd.factorize(g[group_col], sort=False)
        items = g[item_col].to_numpy()
        a, b = _pairs_within_sorted_groups(codes)
        # each unordered pair appears exactly once per group (items are
        # distinct + sorted within a group), so the within-bucket
        # value_count IS the bucket's group-support partial
        out = (
            pd.DataFrame({"u": items[a], "v": items[b]})
            .groupby(["u", "v"], sort=False)
            .size()
            .reset_index(name="one")
        )
        out["one"] = out["one"].astype(np.int64)
        return out

    pairs = bucketed.groupby("__b").map_groups(emit, batch_format="pandas")
    merged = sum_partials(pairs, keys=["u", "v"], sum_cols=["one"])
    if min_count > 1:
        merged = merged.map_batches(
            lambda t: t.filter(pc.greater_equal(t["one"], min_count)),
            batch_format="pyarrow",
        )
    return merged.drop_columns(["one"])


def _degrees(canon: ray.data.Dataset) -> ray.data.Dataset:
    """(node, deg) from distinct canonical edges — per-block endpoint
    counts merged by key."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        nodes = pd.concat([df["u"], df["v"]], ignore_index=True)
        vc = nodes.value_counts()
        return pd.DataFrame(
            {"node": vc.index.to_numpy(), "deg": vc.to_numpy().astype(np.int64)}
        )

    return sum_partials(
        canon.map_batches(partial, batch_format="pandas"),
        keys=["node"],
        sum_cols=["deg"],
    )


def _orient_join(
    canon: ray.data.Dataset, degrees: ray.data.Dataset
) -> ray.data.Dataset:
    """Join-tier orientation for node sets beyond the broadcast limit: two
    Arrow-native hash joins attach deg(u) / deg(v), then the same vectorized
    swap. native_join (not bucket_join) on purpose: the chained key must
    keep its integer dtype through the first join — bucket_join's pandas
    union-concat NaN-pads the side columns and upcasts int64 keys to
    float64, which hash into different buckets than the int64 right side."""
    node_t = canon.schema().base_schema.field("u").type
    du = compact_nonempty(
        degrees.map_batches(
            lambda df: df.rename(columns={"node": "u", "deg": "deg_u"}),
            batch_format="pandas",
        ),
        pa.schema([("u", node_t), ("deg_u", pa.int64())]),
    )
    dv = compact_nonempty(
        degrees.map_batches(
            lambda df: df.rename(columns={"node": "v", "deg": "deg_v"}),
            batch_format="pandas",
        ),
        pa.schema([("v", node_t), ("deg_v", pa.int64())]),
    )
    canon_c = compact_nonempty(canon, pa.schema([("u", node_t), ("v", node_t)]))
    nparts = _nparts()
    withu = native_join(canon_c, du, left_on="u", right_on="u", num_partitions=nparts)
    withu = compact_nonempty(
        withu, pa.schema([("u", node_t), ("v", node_t), ("deg_u", pa.int64())])
    )
    both = native_join(withu, dv, left_on="v", right_on="v", num_partitions=nparts)

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        du_ = df["deg_u"].to_numpy()
        dv_ = df["deg_v"].to_numpy()
        u, v = df["u"].to_numpy(), df["v"].to_numpy()
        swap = (du_ > dv_) | ((du_ == dv_) & (u > v))
        return pd.DataFrame(
            {
                "s": np.where(swap, v, u),
                "t": np.where(swap, u, v),
                "deg_t": np.where(swap, du_, dv_).astype(np.int64),
            }
        )

    return both.map_batches(orient, batch_format="pandas")


def _wedge_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """All wedges of a co-located out-adjacency block: neighbors sorted by
    the SAME (deg, id) total order used for orientation, so every wedge
    (x, y) satisfies x < y and its closing edge — if present — is stored
    oriented x -> y."""
    g = g.sort_values(["s", "deg_t", "t"], kind="mergesort")
    codes, _ = pd.factorize(g["s"], sort=False)
    t_arr = g["t"].to_numpy()
    a, b = _pairs_within_sorted_groups(codes)
    return pd.DataFrame({"x": t_arr[a], "y": t_arr[b], "c": g["s"].to_numpy()[a]})


def _corner_partials(tri: pd.DataFrame) -> pd.DataFrame:
    """(node, triangles) partial counts from matched-triangle rows."""
    nodes = pd.concat(
        [tri["x"], tri["y"], tri["c"]], ignore_index=True
    )
    vc = nodes.value_counts()
    return pd.DataFrame(
        {"node": vc.index.to_numpy(), "triangles": vc.to_numpy().astype(np.int64)}
    )


def _counts_by_codes(
    canon: ray.data.Dataset,
    degrees: ray.data.Dataset,
    node_t: pa.DataType,
    edge_broadcast_limit: int,
) -> ray.data.Dataset:
    """Dense-code tier (node count fits one broadcast): nodes are renamed to
    their rank in the (deg, id) total order, so

    * orientation is ``min``/``max`` on the codes (no degree column carried),
    * an oriented edge packs into ONE int64 key ``s*n + t`` (n ≤ 5M so
      s*n + t < 2^63), turning the closure test into a ``searchsorted``
      against a single broadcast sorted key array (8 B/edge) — no pandas
      multi-column hash merge,
    * corner counting is ``np.bincount`` over codes.

    The wedge stream still never leaves its task below
    ``edge_broadcast_limit`` edges; above it, wedges flow through one
    single-int64-key hash join."""
    nodes_df = (
        degrees.to_pandas()
        .sort_values(["deg", "node"], kind="mergesort")
        .reset_index(drop=True)
    )
    n = len(nodes_df)
    n64 = np.int64(n)
    code_ref = ray.put(
        pd.Series(np.arange(n, dtype=np.int64), index=nodes_df["node"].to_numpy())
    )

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        lut = ray.get(code_ref)
        cu = df["u"].map(lut).to_numpy(dtype=np.int64)
        cv = df["v"].map(lut).to_numpy(dtype=np.int64)
        return pd.DataFrame({"s": np.minimum(cu, cv), "t": np.maximum(cu, cv)})

    oriented = compact_nonempty(
        canon.map_batches(orient, batch_format="pandas"),
        pa.schema([("s", pa.int64()), ("t", pa.int64())]),
    )
    nparts = _nparts()
    bucketed = oriented.map_batches(
        lambda df: df.assign(__b=(df["s"].to_numpy() % nparts).astype(np.int64)),
        batch_format="pandas",
    )

    def wedge_arrays(g: pd.DataFrame):
        g = g.sort_values(["s", "t"], kind="mergesort")
        codes, _ = pd.factorize(g["s"], sort=False)
        t_arr = g["t"].to_numpy()
        a, b = _pairs_within_sorted_groups(codes)
        return t_arr[a], t_arr[b], g["s"].to_numpy()[a]

    def code_partials(x, y, c) -> pd.DataFrame:
        cnt = np.bincount(np.concatenate([x, y, c]))
        nz = np.nonzero(cnt)[0].astype(np.int64)
        return pd.DataFrame({"code": nz, "triangles": cnt[nz].astype(np.int64)})

    CODE_SCHEMA = pa.schema([("code", pa.int64()), ("triangles", pa.int64())])
    n_edges = canon.count()

    if n_edges <= edge_broadcast_limit:
        kdf = oriented.map_batches(
            lambda df: pd.DataFrame(
                {"k": df["s"].to_numpy() * n64 + df["t"].to_numpy()}
            ),
            batch_format="pandas",
        ).to_pandas()
        keys_ref = ray.put(np.sort(kdf["k"].to_numpy()))

        def wedges_closed(g: pd.DataFrame) -> pd.DataFrame:
            x, y, c = wedge_arrays(g)
            keys = ray.get(keys_ref)
            w = x * n64 + y
            pos = np.minimum(np.searchsorted(keys, w), len(keys) - 1)
            m = keys[pos] == w
            return code_partials(x[m], y[m], c[m])

        parts = compact_nonempty(
            bucketed.groupby("__b").map_groups(wedges_closed, batch_format="pandas"),
            CODE_SCHEMA,
        )
    else:

        def wedge_keyed(g: pd.DataFrame) -> pd.DataFrame:
            x, y, c = wedge_arrays(g)
            return pd.DataFrame({"k": x * n64 + y, "x": x, "y": y, "c": c})

        wedge_ds = compact_nonempty(
            bucketed.groupby("__b").map_groups(wedge_keyed, batch_format="pandas"),
            pa.schema(
                [("k", pa.int64()), ("x", pa.int64()), ("y", pa.int64()), ("c", pa.int64())]
            ),
        )
        closing = compact_nonempty(
            oriented.map_batches(
                lambda df: pd.DataFrame(
                    {"k": df["s"].to_numpy() * n64 + df["t"].to_numpy()}
                ),
                batch_format="pandas",
            ),
            pa.schema([("k", pa.int64())]),
        )
        tri = native_join(
            wedge_ds, closing, left_on="k", right_on="k", num_partitions=nparts
        )
        parts = compact_nonempty(
            tri.map_batches(
                lambda df: code_partials(
                    df["x"].to_numpy(), df["y"].to_numpy(), df["c"].to_numpy()
                ),
                batch_format="pandas",
            ),
            CODE_SCHEMA,
        )

    merged = sum_partials(parts, keys=["code"], sum_cols=["triangles"])
    mdf = merged.to_pandas() if merged.count() else pd.DataFrame()
    if mdf.empty:
        return ray.data.from_arrow(
            pa.schema([("node", node_t), ("triangles", pa.int64())]).empty_table()
        )
    # decode back to original ids — output is node-bounded (≤ broadcast_limit)
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "node": nodes_df["node"].to_numpy()[mdf["code"].to_numpy()],
                "triangles": mdf["triangles"].to_numpy(),
            }
        )
    )


def triangle_counts(
    edges: ray.data.Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    broadcast_limit: int = 5_000_000,
    edge_broadcast_limit: int = 10_000_000,
    assume_canonical: bool = False,
) -> ray.data.Dataset:
    """(src, dst) edge multiset -> (node, triangles) for every node in at
    least one triangle. Direction/multiplicity/self-loops are ignored
    (counting runs on the distinct undirected canonical edge set).
    ``assume_canonical`` skips the dedup pass when the input is already a
    distinct u < v edge set (e.g. straight out of ``cooccurrence_edges``).

    Tiering: below ``broadcast_limit`` distinct nodes the dense-code tier
    runs (see :func:`_counts_by_codes` — packed int64 edge keys, map-only
    orientation, searchsorted closure below ``edge_broadcast_limit`` edges,
    single-key hash join above). Above ``broadcast_limit`` nodes the raw-id
    tier runs: orientation via two Arrow hash joins, wedges from one hash
    exchange of the oriented edges, closure via one composite-key hash join.
    All tiers are exact and tier-equivalent (pytest-pinned)."""
    if assume_canonical and (src, dst) == ("u", "v"):
        canon = edges.materialize()
    else:
        canon = canonical_edges(edges, src=src, dst=dst).materialize()
    degrees = _degrees(canon).materialize()
    n_nodes = degrees.count()
    if n_nodes == 0:
        return ray.data.from_arrow(
            pa.table(
                {"node": pa.array([], pa.int64()), "triangles": pa.array([], pa.int64())}
            )
        )
    node_t = canon.schema().base_schema.field("u").type
    if n_nodes <= broadcast_limit:
        return _counts_by_codes(canon, degrees, node_t, edge_broadcast_limit)

    oriented = _orient_join(canon, degrees)
    ORIENT = pa.schema([("s", node_t), ("t", node_t), ("deg_t", pa.int64())])
    oriented = compact_nonempty(oriented, ORIENT)

    nparts = _nparts()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(df["s"].to_numpy()) % np.uint64(nparts)
        return df.assign(__b=h.astype(np.int64))

    bucketed = oriented.map_batches(add_bucket, batch_format="pandas")

    wedge_ds = compact_nonempty(
        bucketed.groupby("__b").map_groups(
            lambda g: _wedge_pairs(g[["s", "t", "deg_t"]]), batch_format="pandas"
        ),
        pa.schema([("x", node_t), ("y", node_t), ("c", node_t)]),
    )
    closing = compact_nonempty(
        oriented.drop_columns(["deg_t"]), pa.schema([("s", node_t), ("t", node_t)])
    )
    tri = native_join(
        wedge_ds,
        closing,
        left_on=("x", "y"),
        right_on=("s", "t"),
        num_partitions=nparts,
    )
    # the join can emit 0-row blocks carrying its own (wedge ∪ edge) schema,
    # which map_batches passes through un-invoked — drop them so the merge
    # sees one uniform (node, triangles) schema
    parts = compact_nonempty(
        tri.map_batches(
            lambda df: _corner_partials(df), batch_format="pandas"
        ),
        pa.schema([("node", node_t), ("triangles", pa.int64())]),
    )
    return sum_partials(parts, keys=["node"], sum_cols=["triangles"])


def triangles_oracle_sql(edges_sql: str) -> str:
    """DuckDB twin: 3-way self-join over the canonical distinct edge set of
    ``edges_sql`` (any SELECT producing src/dst columns). LEAST/GREATEST
    canonicalization matches :func:`canonical_edges`; each triangle is
    listed once at a < b < c and contributes 1 to each corner."""
    return f"""
WITH raw AS ({edges_sql}),
canon AS (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM raw WHERE src <> dst
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM canon e1
  JOIN canon e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN canon e3 ON e3.u = e1.v AND e3.v = e2.v
),
corners AS (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT node, COUNT(*)::BIGINT AS triangles
FROM corners GROUP BY node ORDER BY node
"""
