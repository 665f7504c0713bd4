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
