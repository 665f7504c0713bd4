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
    parts = partials.materialize()
    if parts.count() <= driver_limit:
        pdf = parts.to_pandas()
        if pdf.empty:
            return ray.data.from_pandas(pd.DataFrame(columns=keys + sum_cols))
        merged = (
            pl.from_pandas(pdf)
            .group_by(keys)
            .agg([pl.col(c).sum().alias(c) for c in sum_cols])
            .sort(keys)
        )
        return ray.data.from_arrow(merged.to_arrow())
    from ray.data.aggregate import Sum

    n_parts = max(8, int(ray.cluster_resources().get("CPU", 8)))
    return parts.repartition(n_parts).groupby(keys).aggregate(
        *[Sum(c, alias_name=c) for c in sum_cols]
    )
