"""Two-level aggregation: per-batch partials -> driver polars merge.

Ray Data's groupby().aggregate() pays ~20-40s per 100k distinct keys at this
scale (sort-shuffle constants). When the AGGREGATED output is bounded —
windows per user, customers, predicates, distinct texts — the partial rows
(one per key per block) are tiny, and merging them with one polars pass on
the driver is 100-1000× faster than the distributed aggregate.

``sum_partials`` auto-falls back to the distributed aggregate above
``driver_limit`` partial rows, so the same call site is correct when the key
space explodes. This is the single most load-bearing performance pattern in
the engine; see BASELINE.md for measurements.
"""

from __future__ import annotations

import pandas as pd
import polars as pl
import ray
import ray.data


def merge_partials(
    partials: ray.data.Dataset,
    *,
    keys: list[str],
    agg: dict[str, str],
    driver_limit: int = 5_000_000,
) -> ray.data.Dataset:
    """Merge partial-aggregate rows (one per key per block) per ``keys``.
    ``agg``: column -> "sum" | "min" | "max" (all three merge associatively,
    so per-batch partials compose). Driver polars below ``driver_limit``
    rows, distributed Ray aggregate above."""
    parts = partials.materialize()
    cols = list(agg)
    if parts.count() <= driver_limit:
        pdf = parts.to_pandas()
        if pdf.empty:
            # an object-dtype empty pandas frame loses its columns through
            # the Arrow roundtrip — emit a typed empty table when the
            # partials carry a usable Arrow schema
            sch = parts.schema()
            base = getattr(sch, "base_schema", None) if sch else None
            import pyarrow as pa

            if isinstance(base, pa.Schema) and all(
                n in base.names for n in keys + cols
            ):
                fields = [base.field(n) for n in keys + cols]
                return ray.data.from_arrow(pa.schema(fields).empty_table())
            return ray.data.from_pandas(pd.DataFrame(columns=keys + cols))
        ops = {
            "sum": lambda c: pl.col(c).sum(),
            "min": lambda c: pl.col(c).min(),
            "max": lambda c: pl.col(c).max(),
        }
        merged = (
            pl.from_pandas(pdf)
            .group_by(keys)
            .agg([ops[op](c).alias(c) for c, op in agg.items()])
            .sort(keys)
        )
        return ray.data.from_arrow(merged.to_arrow())
    from ray.data.aggregate import Max, Min, Sum

    ray_ops = {"sum": Sum, "min": Min, "max": Max}
    n_parts = max(8, int(ray.cluster_resources().get("CPU", 8)))
    return parts.repartition(n_parts).groupby(keys).aggregate(
        *[ray_ops[op](c, alias_name=c) for c, op in agg.items()]
    )


def sum_partials(
    partials: ray.data.Dataset,
    *,
    keys: list[str],
    sum_cols: list[str],
    driver_limit: int = 5_000_000,
) -> ray.data.Dataset:
    """Merge partial-sum rows (one per key per block) by summing ``sum_cols``
    per ``keys``. Driver polars below ``driver_limit`` rows, Ray aggregate
    above."""
    return merge_partials(
        partials,
        keys=keys,
        agg={c: "sum" for c in sum_cols},
        driver_limit=driver_limit,
    )
