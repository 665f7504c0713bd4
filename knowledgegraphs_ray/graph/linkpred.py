"""Neighborhood-overlap link prediction over a (u, v) edge Dataset:
common-neighbor counts + Adamic-Adar scores for node pairs NOT already
connected — the classic "entities that share many KG neighbors are
probably the same / related" signal (candidate generation for entity
resolution, KG completion, co-purchase recommendation).

Adamic-Adar = Σ_w 1/ln(deg(w)) over the common neighbors w of (u, v).
Every common neighbor has deg(w) >= 2 by construction (w is adjacent to
both u and v), so ln(deg) > 0 — no guard needed. The score is emitted in
integer MICRO units (floor(1e6 / ln(deg)) per wedge, summed) so the
DuckDB twin (:func:`link_prediction_oracle_sql`) is value-exact: both
sides evaluate the same libm ln(double) on the same integer degree and
floor the same double division (the bm25/ppl discipline).

Scale shape:

* degrees: per-block endpoint-count partials merged by node — edges never
  shuffle for the degree pass.
* ONE node-sized hash join attaches deg(center) to the exploded
  (center, neighbor) rows; ONE hash exchange co-locates each center.
* wedge emission is the vectorized within-sorted-group pair kernel shared
  with ``graph/triangles.py``; per-block partial (u, v) aggregation
  happens BEFORE the pair exchange, which then carries only slim integer
  count rows.
* wedge volume is inherently Σ deg(w)² — ``max_center_degree`` is the
  documented fail-fast skew guard (a 100k-neighbor hub would emit 5e9
  pairs; cap hubs upstream or raise the guard deliberately).
* existing edges are removed with a composite-key LEFT-ANTI hash join
  (never a broadcast of the full edge set).
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
from knowledgegraphs_ray.graph.triangles import (
    _pairs_within_sorted_groups,
    canonical_edges,
)
from knowledgegraphs_ray.util.fastagg import sum_partials


def _nparts() -> int:
    return max(2, min(32, int(ray.cluster_resources().get("CPU", 8))))


def _linkpred_driver(
    df: pd.DataFrame,
    *,
    min_cn: int,
    max_center_degree: int,
    include_jaccard: bool,
) -> pd.DataFrame:
    """Driver tier: the identical wedge/AA/jaccard arithmetic on one
    pandas frame — same numpy log/floor and integer floor division as the
    distributed tier, pinned equivalent by pytest."""
    u = df["u"].to_numpy()
    v = df["v"].to_numpy()
    und = pd.DataFrame(
        {"c": np.concatenate([u, v]), "n": np.concatenate([v, u])}
    )
    deg = und.groupby("c", sort=False)["n"].size().astype("int64")
    g = und.sort_values(["c", "n"], kind="mergesort")
    codes, _ = pd.factorize(g["c"], sort=False)
    k = np.bincount(codes) if len(codes) else np.empty(0, np.int64)
    if len(k) and int(k.max()) > max_center_degree:
        raise RuntimeError(
            f"link_prediction: a node has {int(k.max())} neighbors "
            f"(> max_center_degree={max_center_degree}); wedge emission "
            "is O(deg²) per node — cap hub nodes upstream or raise the "
            "guard deliberately"
        )
    items = g["n"].to_numpy()
    a, b = _pairs_within_sorted_groups(codes)
    deg_a = deg.loc[g["c"].to_numpy()[a]].to_numpy().astype(np.float64)
    aa_w = np.floor(1_000_000.0 / np.log(deg_a)).astype(np.int64)
    pairs = pd.DataFrame(
        {"u": items[a], "v": items[b], "cn": np.int64(1), "aa_micro": aa_w}
    ).groupby(["u", "v"], as_index=False, sort=False).sum()
    pairs = pairs[pairs["cn"] >= min_cn]
    # anti join vs existing edges on the composite key
    merged = pairs.merge(
        df[["u", "v"]], on=["u", "v"], how="left", indicator=True
    )
    out = merged[merged["_merge"] == "left_only"].drop(columns="_merge")
    out = out.astype({"cn": "int64", "aa_micro": "int64"})
    if include_jaccard:
        du = deg.loc[out["u"].to_numpy()].to_numpy().astype(np.int64)
        dv = deg.loc[out["v"].to_numpy()].to_numpy().astype(np.int64)
        cn = out["cn"].to_numpy()
        out = out.assign(jac_micro=(1_000_000 * cn) // (du + dv - cn))
    return out.reset_index(drop=True)


def link_prediction(
    edges: ray.data.Dataset,
    *,
    src: str = "u",
    dst: str = "v",
    min_cn: int = 2,
    max_center_degree: int = 50_000,
    assume_canonical: bool = False,
    include_jaccard: bool = False,
    driver_limit: int = 2_000_000,
) -> ray.data.Dataset:
    """-> (u, v, cn, aa_micro) for every non-adjacent pair with at least
    ``min_cn`` common neighbors; u < v; aa_micro = Σ floor(1e6/ln(deg(w)))
    over common neighbors w.

    ``include_jaccard=True`` appends ``jac_micro`` = floor(1e6 · cn /
    (deg(u) + deg(v) − cn)) — neighborhood Jaccard in integer micro
    units, PURE int64 arithmetic (no libm at all), attached by two extra
    node-sized degree hash joins after the anti join. The
    entity-resolution blocking score: near-identical KG neighborhoods ⇒
    merge candidates."""
    base = (
        edges.select_columns([src, dst])
        if assume_canonical
        else canonical_edges(edges, src=src, dst=dst).select_columns([src, dst])
    )
    # every native_join input below goes through compact_nonempty on arrow
    # blocks: upstream aggregates can emit 0-row / pandas blocks that poison
    # Dataset.join's hash aggregator (see dedup/incremental_minhash.py)
    canon = base.map_batches(
        lambda t: t.rename_columns(["u", "v"]), batch_format="pyarrow"
    ).materialize()
    _sch = canon.schema()
    EDGE_SCHEMA = pa.schema(list(zip(_sch.names, _sch.types)))
    node_t = EDGE_SCHEMA.field("u").type
    canon = compact_nonempty(canon, EDGE_SCHEMA)

    # DRIVER TIER: below driver_limit edges the whole pipeline is one
    # vectorized pandas pass — the 4-stage join/shuffle plan's fixed
    # per-stage latency dominates small graphs (the engine-wide
    # driver-tier discipline; tier-equivalence pinned in test_linkpred)
    n_edges = canon.count()
    if n_edges <= driver_limit:
        out = _linkpred_driver(
            canon.to_pandas(),
            min_cn=min_cn,
            max_center_degree=max_center_degree,
            include_jaccard=include_jaccard,
        )
        return ray.data.from_pandas(out)

    # (center, neighbor) exploded view + per-node degree (partials merge)
    def explode(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c": np.concatenate([df["u"].to_numpy(), df["v"].to_numpy()]),
                "n": np.concatenate([df["v"].to_numpy(), df["u"].to_numpy()]),
            }
        )

    und = canon.map_batches(explode, batch_format="pandas")

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("c", as_index=False, sort=False).size()
        g.columns = ["c", "deg"]
        g["deg"] = g["deg"].astype("int64")
        return g

    deg = sum_partials(
        und.map_batches(deg_partial, batch_format="pandas"),
        keys=["c"], sum_cols=["deg"],
    )

    nparts = _nparts()
    UND_SCHEMA = pa.schema([("c", node_t), ("n", node_t)])
    DEG_SCHEMA = pa.schema([("c", node_t), ("deg", pa.int64())])
    und = compact_nonempty(
        und.map_batches(lambda t: t.cast(UND_SCHEMA), batch_format="pyarrow"),
        UND_SCHEMA,
    )
    deg = compact_nonempty(
        deg.map_batches(
            lambda t: t.select(["c", "deg"]).cast(DEG_SCHEMA), batch_format="pyarrow"
        ),
        DEG_SCHEMA,
    )
    withdeg = native_join(und, deg, left_on="c", right_on="c",
                          num_partitions=nparts)

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(df["c"].to_numpy()) % np.uint64(nparts)
        return df.assign(__b=h.astype(np.int64))

    bucketed = withdeg.map_batches(bucket, batch_format="pandas")

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["c", "n"], kind="mergesort")
        codes, _ = pd.factorize(g["c"], sort=False)
        k = np.bincount(codes) if len(codes) else np.empty(0, np.int64)
        if len(k) and int(k.max()) > max_center_degree:
            raise RuntimeError(
                f"link_prediction: a node has {int(k.max())} neighbors "
                f"(> max_center_degree={max_center_degree}); wedge emission "
                "is O(deg²) per node — cap hub nodes upstream or raise the "
                "guard deliberately"
            )
        items = g["n"].to_numpy()
        a, b = _pairs_within_sorted_groups(codes)
        # deg is constant per center row-group; wedge contribution keys off
        # the CENTER's degree — indexed AFTER pairing so degree-1 centers
        # (which emit no pairs) never reach the ln
        deg_a = g["deg"].to_numpy()[a].astype(np.float64)
        aa_w = np.floor(1_000_000.0 / np.log(deg_a)).astype(np.int64)
        out = pd.DataFrame(
            {"u": items[a], "v": items[b], "cn": np.int64(1), "aa_micro": aa_w}
        )
        return out.groupby(["u", "v"], as_index=False, sort=False).sum()

    pairs = bucketed.groupby("__b").map_groups(emit, batch_format="pandas")
    cand = sum_partials(pairs, keys=["u", "v"], sum_cols=["cn", "aa_micro"])
    CAND_SCHEMA = pa.schema(
        [("u", node_t), ("v", node_t), ("cn", pa.int64()), ("aa_micro", pa.int64())]
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t["cn"], min_cn))
        return t.select(["u", "v", "cn", "aa_micro"]).cast(CAND_SCHEMA)

    FULL_SCHEMA = pa.schema(
        list(zip(CAND_SCHEMA.names, CAND_SCHEMA.types))
        + ([("jac_micro", pa.int64())] if include_jaccard else [])
    )
    cand = compact_nonempty(
        cand.map_batches(finish, batch_format="pyarrow"), CAND_SCHEMA
    )
    if cand.count() == 0:
        # nothing survived min_cn — skip the anti join (a 0-row join side
        # breaks Ray's hash-shuffle aggregator)
        return ray.data.from_arrow(FULL_SCHEMA.empty_table())
    # drop already-connected pairs: composite-key anti join against edges
    out = native_join(
        cand, canon, left_on=("u", "v"), right_on=("u", "v"),
        how="left_anti", num_partitions=nparts,
    )
    if not include_jaccard:
        return out
    out = compact_nonempty(
        out.map_batches(lambda t: t.cast(CAND_SCHEMA), batch_format="pyarrow"),
        CAND_SCHEMA,
    )
    if out.count() == 0:
        return ray.data.from_arrow(FULL_SCHEMA.empty_table())
    # endpoint degrees: two node-sized hash joins, then pure-int64 jaccard
    degu = compact_nonempty(
        deg.map_batches(
            lambda t: t.select(["c", "deg"]).rename_columns(["u", "deg_u"]),
            batch_format="pyarrow",
        ),
        pa.schema([("u", node_t), ("deg_u", pa.int64())]),
    )
    degv = compact_nonempty(
        deg.map_batches(
            lambda t: t.select(["c", "deg"]).rename_columns(["v", "deg_v"]),
            batch_format="pyarrow",
        ),
        pa.schema([("v", node_t), ("deg_v", pa.int64())]),
    )
    out = native_join(out, degu, left_on="u", right_on="u", num_partitions=nparts)
    out = native_join(out, degv, left_on="v", right_on="v", num_partitions=nparts)

    def jac(t: pa.Table) -> pa.Table:
        cn = t["cn"]
        # denom = deg_u + deg_v - cn >= cn >= 1; int64 divide is exact
        # floor for non-negative operands
        denom = pc.subtract(pc.add(t["deg_u"], t["deg_v"]), cn)
        j = pc.divide(pc.multiply(pc.cast(cn, pa.int64()), pa.scalar(1_000_000)), denom)
        return pa.table(
            {
                "u": t["u"],
                "v": t["v"],
                "cn": t["cn"],
                "aa_micro": t["aa_micro"],
                "jac_micro": pc.cast(j, pa.int64()),
            }
        )

    return out.map_batches(jac, batch_format="pyarrow")


def link_prediction_oracle_sql(
    edges_sql: str, *, min_cn: int = 2, include_jaccard: bool = False
) -> str:
    """DuckDB twin. ``edges_sql`` must select distinct canonical (u, v)
    rows with u < v. ``include_jaccard`` appends the same pure-integer
    floor-division jac_micro (DuckDB ``//`` on BIGINT)."""
    jac_col = (
        ",\n       (1000000 * cand.cn) // (du.deg + dv.deg - cand.cn) AS jac_micro"
        if include_jaccard
        else ""
    )
    jac_join = (
        "\nJOIN deg du ON du.node = cand.u JOIN deg dv ON dv.node = cand.v"
        if include_jaccard
        else ""
    )
    return f"""
WITH e AS ({edges_sql}),
und AS (SELECT u AS c, v AS n FROM e UNION ALL SELECT v AS c, u AS n FROM e),
deg AS (SELECT c AS node, count(*)::BIGINT AS deg FROM und GROUP BY c),
wedge AS (
  SELECT a.n AS u, b.n AS v, a.c AS w
  FROM und a JOIN und b ON a.c = b.c AND a.n < b.n
),
cand AS (
  SELECT u, v, count(*)::BIGINT AS cn,
         CAST(sum(CAST(floor(1000000.0 / ln(CAST(d.deg AS DOUBLE))) AS BIGINT))
              AS BIGINT) AS aa_micro
  FROM wedge JOIN deg d ON d.node = wedge.w
  GROUP BY u, v
)
SELECT cand.u, cand.v, cand.cn, cand.aa_micro{jac_col}
FROM cand{jac_join}
WHERE cand.cn >= {min_cn}
  AND NOT EXISTS (SELECT 1 FROM e WHERE e.u = cand.u AND e.v = cand.v)
"""
