"""k-core decomposition over a (src, dst) edge Dataset — iterative peeling
(Matula & Beck 1983): repeatedly drop nodes whose degree in the surviving
subgraph is below k, until a fixpoint; the k-core is what remains.

Graph-analytics companion to ``graph/pagerank.py`` / ``graph/triangles.py``
(density/community structure of the co-occurrence graph; the reference
leaves graph analytics to its GraphDB store).

Scale shape — where the data moves per round:

* The canonical edge set materializes ONCE; every peeling round is a
  map-only filter over it plus per-block degree partials merged by key
  (``sum_partials``). The edge payload never shuffles after round 0.
* The per-round communication is the REMOVAL DELTA, not the alive set:
  nodes removed this round broadcast once via ``ray.put`` (after the first
  round the delta is typically tiny). A delta above
  ``delta_broadcast_limit`` falls back to one hash semi-join of the edges
  against the removal list (``bucket_join`` marker + filter) — the honest
  tier for adversarial graphs whose first peel removes hundreds of
  millions of nodes.
* Rounds are bounded by ``max_rounds``; non-convergence RAISES (the
  ``components_by_propagation`` discipline — never silently return a
  partial peel).

Determinism: output is the k-core's exact (node, core_deg) integer table —
bit-identical at any parallelism, bit-exact vs the unrolled-peeling DuckDB
twin (:func:`kcore_oracle_sql`, one CTE per round; extra rounds past the
fixpoint are no-ops, so any unroll depth ≥ the engine's round count — which
the engine enforces via the shared ``max_rounds`` — is exact).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from knowledgegraphs_ray.extract.joins import bucket_join
from knowledgegraphs_ray.graph.triangles import canonical_edges, _degrees
from knowledgegraphs_ray.util.blocks import compact_nonempty
from knowledgegraphs_ray.util.fastagg import sum_partials


def mean_degree_k(n_nodes: int, n_edges: int) -> int:
    """ceil(2E/V) in pure integer arithmetic — the data-derived default k
    (same formula in the SQL twin: (2*E + V - 1) // V)."""
    return (2 * n_edges + n_nodes - 1) // n_nodes if n_nodes else 0


def kcore(
    edges: ray.data.Dataset,
    *,
    k: int | None = None,
    src: str = "src",
    dst: str = "dst",
    assume_canonical: bool = False,
    max_rounds: int = 24,
    delta_broadcast_limit: int = 20_000_000,
) -> ray.data.Dataset:
    """-> (node, core_deg) for every node of the k-core (degree within the
    surviving subgraph, ≥ k by construction). ``k=None`` derives
    k = ceil(mean degree) from the canonical graph. Direction,
    multiplicity and self-loops are ignored. Raises after ``max_rounds``
    non-converged rounds."""
    if assume_canonical and (src, dst) == ("u", "v"):
        canon = edges.materialize()
    else:
        canon = canonical_edges(edges, src=src, dst=dst).materialize()
    degrees = _degrees(canon).materialize()
    n_nodes = degrees.count()
    node_t = (
        canon.schema().base_schema.field("u").type
        if n_nodes
        else pa.int64()
    )
    OUT = pa.schema([("node", node_t), ("core_deg", pa.int64())])
    if n_nodes == 0:
        return ray.data.from_arrow(OUT.empty_table())
    if k is None:
        k = mean_degree_k(n_nodes, canon.count())

    EDGE = pa.schema([("u", node_t), ("v", node_t)])
    alive_edges = compact_nonempty(canon, EDGE)
    deg = degrees

    for _round in range(max_rounds):
        ddf = deg.to_pandas() if deg.count() else pd.DataFrame(
            {"node": [], "deg": []}
        )
        removed = ddf[ddf["deg"] < k]["node"].to_numpy()
        if len(removed) == 0:
            return compact_nonempty(
                deg.map_batches(
                    lambda df: df.rename(columns={"deg": "core_deg"}),
                    batch_format="pandas",
                ),
                OUT,
            )
        if len(removed) <= delta_broadcast_limit:
            rm_ref = ray.put(pd.Index(removed))

            def drop(df: pd.DataFrame) -> pd.DataFrame:
                rm = ray.get(rm_ref)
                keep = ~(df["u"].isin(rm) | df["v"].isin(rm)).to_numpy()
                return df[keep]

            alive_edges = compact_nonempty(
                alive_edges.map_batches(drop, batch_format="pandas"), EDGE
            )
        else:
            # scale tier: one hash semi-join per endpoint against the
            # removal list (marker column + filter keeps edge payload slim)
            rm_ds = ray.data.from_pandas(
                pd.DataFrame({"node": removed, "__rm": np.int64(1)})
            )
            for side in ("u", "v"):
                joined = bucket_join(
                    alive_edges,
                    rm_ds.map_batches(
                        lambda df, s=side: df.rename(columns={"node": s}),
                        batch_format="pandas",
                    ),
                    left_on=side,
                    right_on=side,
                    how="left",
                    right_cols=[side, "__rm"],
                    left_cols=["u", "v"],
                )
                alive_edges = compact_nonempty(
                    joined.map_batches(
                        lambda df: df[df["__rm"].isna()][["u", "v"]],
                        batch_format="pandas",
                    ),
                    EDGE,
                )
        deg = _degrees(alive_edges).materialize()
        if deg.count() == 0:  # k-core is empty
            return ray.data.from_arrow(OUT.empty_table())
    raise RuntimeError(
        f"kcore: no fixpoint after {max_rounds} rounds (k={k}); raise "
        "max_rounds — the SQL twin must be unrolled at least as deep"
    )


def kcore_oracle_sql(edges_sql: str, *, k_sql: str | None = None, rounds: int = 24) -> str:
    """DuckDB twin: ``rounds`` unrolled peeling CTEs over the canonical
    distinct edge set of ``edges_sql`` (SELECT producing src/dst).
    ``k_sql`` is a scalar SQL expression for k (defaults to the integer
    ceil-mean-degree of the canonical graph — matching
    :func:`mean_degree_k`). Rounds past the fixpoint are no-ops, so any
    ``rounds`` ≥ the engine's actual round count is exact.

    Every CTE is ``AS MATERIALIZED``: each round references the previous
    one four times, so inlined CTEs would blow the plan up 4^rounds — the
    hint keeps the unroll linear."""
    parts = [
        f"WITH raw AS MATERIALIZED ({edges_sql})",
        "canon AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS u,"
        " GREATEST(src, dst) AS v FROM raw WHERE src <> dst)",
    ]
    if k_sql is None:
        v_sql = (
            "(SELECT COUNT(DISTINCT node) FROM (SELECT u AS node FROM canon"
            " UNION ALL SELECT v FROM canon))"
        )
        k_sql = f"((2 * (SELECT COUNT(*) FROM canon) + {v_sql} - 1) // {v_sql})"
    parts.append(f"kdef AS MATERIALIZED (SELECT {k_sql} AS k)")
    prev = "canon"
    for i in range(rounds):
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT node FROM (SELECT u AS node FROM"
            f" {prev} UNION ALL SELECT v FROM {prev}) GROUP BY node "
            f"HAVING COUNT(*) >= (SELECT k FROM kdef))"
        )
        parts.append(
            f"e{i} AS MATERIALIZED (SELECT u, v FROM {prev} WHERE u IN "
            f"(SELECT node FROM a{i}) AND v IN (SELECT node FROM a{i}))"
        )
        prev = f"e{i}"
    return (
        ",\n".join(parts)
        + f"\nSELECT node, COUNT(*)::BIGINT AS core_deg FROM (SELECT u AS"
        f" node FROM {prev} UNION ALL SELECT v FROM {prev}) GROUP BY node"
        " ORDER BY node"
    )
