"""Analytics operators demonstrating scale patterns on the star schema:
partial-aggregation pushdown, broadcast join, distributed top-k.

These are the A-scale shapes (SURVEY.md §2.6/§2.7) every pipeline reuses:
combine inside ``map_batches`` FIRST, then a small groupby; broadcast the
dimension side of joins; merge per-batch top-k instead of a global sort.
Money is summed as integer cents so results are engine-exact.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from knowledgegraphs_ray.extract.joins import broadcast_join


def lineitem_pricing_summary(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q1 shape with pre-aggregation: per (returnflag, linestatus):
    sum_qty, sum_base_cents, n_rows. The shuffle moves one row per group per
    block, not 6M lineitems."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"].to_numpy(zero_copy_only=False),
                "l_linestatus": batch["l_linestatus"].to_numpy(zero_copy_only=False),
                "qty": batch["l_quantity"].to_numpy(zero_copy_only=False),
                "cents": pc.cast(
                    pc.round(pc.multiply(batch["l_extendedprice"], 100)), pa.int64()
                ).to_numpy(zero_copy_only=False),
            }
        )
        out = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("qty", "sum"), sum_base_cents=("cents", "sum"), n_rows=("qty", "size")
        )
        return out

    from knowledgegraphs_ray.util.fastagg import sum_partials

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return sum_partials(
        parts,
        keys=["l_returnflag", "l_linestatus"],
        sum_cols=["sum_qty", "sum_base_cents", "n_rows"],
    )


def orders_with_customer(sf_dir: str) -> ray.data.Dataset:
    """orders ⋈ customer via broadcast join (J1 at scale: the dimension side
    ships once, the fact side streams)."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_mktsegment"]
    )
    out = broadcast_join(
        orders, customer, left_on="o_custkey", right_on="c_custkey", how="inner"
    )
    return out.select_columns(["o_orderkey", "c_name", "c_mktsegment"])


def top_customers_by_revenue(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Distributed top-k: per-batch partial sums -> small groupby -> driver
    top-k of the (customer-count-sized) aggregate. Never a global sort of
    the fact table."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "o_custkey": batch["o_custkey"].to_numpy(zero_copy_only=False),
                "cents": pc.cast(
                    pc.round(pc.multiply(batch["o_totalprice"], 100)), pa.int64()
                ).to_numpy(zero_copy_only=False),
            }
        )
        return df.groupby("o_custkey", as_index=False).agg(
            total_cents=("cents", "sum"), n_orders=("cents", "size")
        )

    from knowledgegraphs_ray.util.fastagg import sum_partials

    parts = orders.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    agg = sum_partials(parts, keys=["o_custkey"], sum_cols=["total_cents", "n_orders"])
    df = agg.to_pandas()
    df = df.sort_values(
        ["total_cents", "o_custkey"], ascending=[False, True], kind="mergesort"
    ).head(k)
    df = df.reset_index(drop=True)
    df["rank"] = pd.RangeIndex(1, len(df) + 1)
    return df[["rank", "o_custkey", "total_cents", "n_orders"]].astype(
        {"rank": "int64", "o_custkey": "int64", "total_cents": "int64", "n_orders": "int64"}
    )


def grouping_sets_agg(
    ds: ray.data.Dataset,
    *,
    key_cols: list[str],
    sets: list[list[str]],
    sum_cols: dict[str, str],
    count_col: str = "n",
) -> ray.data.Dataset:
    """Multi-grain aggregation in ONE pass + ONE slim exchange — SQL
    ``GROUP BY GROUPING SETS / ROLLUP / CUBE`` as a Dataset operator.

    Every block computes partials for ALL grouping sets map-side (the
    combiner), so the exchange moves at most |sets| rows per observed key
    per block — never a second scan per grain, never the raw rows.  Rolled-
    up key cells are NULL exactly as in SQL; ``gid`` carries the standard
    ``GROUPING(key_cols...)`` bitmask (first listed key = most significant
    bit), which disambiguates a rolled-up NULL from a genuine NULL key.

    ``sets``: subsets of ``key_cols`` (``[]`` = grand total).
    ``sum_cols``: output name -> input column (int64 measures; prepare
    cents/int64 upstream).  ``count_col``: COUNT(*) output name.
    Output: key_cols (nullable) + gid + count_col + sum_cols, merged via
    ``sum_partials`` (driver polars tier; the merged table is
    grain-bounded, ≤ Σ per-set group counts).
    """
    import numpy as np

    from knowledgegraphs_ray.util.fastagg import sum_partials

    n_keys = len(key_cols)
    set_masks = []
    for s in sets:
        unknown = set(s) - set(key_cols)
        if unknown:
            raise ValueError(f"grouping set {s} has non-key columns {unknown}")
        gid = sum(
            1 << (n_keys - 1 - i) for i, c in enumerate(key_cols) if c not in s
        )
        set_masks.append((list(s), gid))
    meas_srcs = list(sum_cols.values())
    meas_outs = list(sum_cols)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for s, gid in set_masks:
            if s:
                g = df.groupby(s, as_index=False, dropna=False, sort=False).agg(
                    **{count_col: (s[0], "size")},
                    **{o: (src, "sum") for o, src in sum_cols.items()},
                )
            else:
                g = pd.DataFrame(
                    {
                        count_col: [np.int64(len(df))],
                        **{
                            o: [np.int64(df[src].sum()) if len(df) else np.int64(0)]
                            for o, src in sum_cols.items()
                        },
                    }
                )
            for c in key_cols:
                if c not in s:
                    g[c] = None
            g["gid"] = np.int64(gid)
            frames.append(g[key_cols + ["gid", count_col] + meas_outs])
        out = pd.concat(frames, ignore_index=True)
        for o in [count_col] + meas_outs:
            out[o] = out[o].astype("int64")
        return out

    parts = ds.select_columns(
        sorted(set(c for s, _ in set_masks for c in s) | set(meas_srcs))
    ).map_batches(partial, batch_format="pandas")
    return sum_partials(
        parts, keys=key_cols + ["gid"], sum_cols=[count_col] + meas_outs
    )


def grouping_sets_oracle_sql(
    table_sql: str,
    *,
    key_cols: list[str],
    sets: list[list[str]],
    sum_cols: dict[str, str],
    count_col: str = "n",
) -> str:
    """DuckDB twin of :func:`grouping_sets_agg` — GROUP BY GROUPING SETS
    with the identical GROUPING() bitmask."""
    set_sql = ", ".join("(" + ", ".join(s) + ")" for s in sets)
    meas = ", ".join(
        f"CAST(sum({src}) AS BIGINT) AS {o}" for o, src in sum_cols.items()
    )
    return f"""
SELECT {', '.join(key_cols)},
       CAST(GROUPING({', '.join(key_cols)}) AS BIGINT) AS gid,
       COUNT(*)::BIGINT AS {count_col}{',' if meas else ''}
       {meas}
FROM ({table_sql})
GROUP BY GROUPING SETS ({set_sql})
"""
