"""Skew handling — hot-key detection, salting, two-phase merge.

The north_rule calls for explicit "skew-aware repartitioning of hot
entities": a handful of mention keys ("user", "assistant", common tool
names) can dominate any keyed shuffle. The standard remedy, packaged:

1. ``hot_keys`` — find keys whose frequency exceeds a threshold via
   per-block partial counts (cheap; bounded by per-block cardinality).
2. ``add_salted_key`` — rows of hot keys get ``key#<salt>`` with salt =
   deterministic hash of the row's position-independent content, fanning one
   hot group into ``n_salts`` bounded groups; cold keys keep ``key#0``.
3. Per-salted-group work runs bounded; a SECOND, tiny groupby over the
   per-salt partials merges them (two-phase pattern). For canonicalization
   the merge is trivial: every salt of a key holds the same mention string,
   so representatives agree by construction.
"""

from __future__ import annotations

import pandas as pd
import polars as pl
import pyarrow as pa
import ray
import ray.data


def hot_keys(
    ds: ray.data.Dataset, *, key: str, threshold: int, driver_limit: int = 5_000_000
) -> set[str]:
    """Keys with total frequency > threshold (per-block partials merged in
    polars; above ``driver_limit`` partial rows, raise — caller should switch
    to a distributed aggregate)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(key, as_index=False).size()
        return out[out["size"] * 1 >= 1]

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if len(parts) > driver_limit:
        raise ValueError("partial count table exceeds driver limit; use Dataset.groupby")
    merged = pl.from_pandas(parts).group_by(key).agg(pl.col("size").sum())
    return set(merged.filter(pl.col("size") > threshold)[key].to_list())


def add_salted_key(
    ds: ray.data.Dataset,
    *,
    key: str,
    hot: set[str],
    n_salts: int = 16,
    out_col: str = "salted_key",
) -> ray.data.Dataset:
    """key -> 'key#salt' for hot keys (deterministic content hash % n_salts),
    'key#0' otherwise. Downstream groupby(out_col) gets bounded groups."""
    hot_ref = ray.put(hot)

    class Salt:
        def __init__(self, ref):
            self.ref = ref
            self._hot = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self._hot is None:
                self._hot = ray.get(self.ref)
            df = pl.from_arrow(batch)
            # per-ROW salt (round-robin within the batch): a hot key's rows
            # fan out across n_salts sub-groups. Batch-boundary-dependent,
            # which is fine — the post-merge result is boundary-invariant.
            salt = (pl.int_range(0, len(df), eager=True) % n_salts).cast(pl.Utf8)
            is_hot = df[key].is_in(sorted(self._hot))
            salted = (
                pl.DataFrame({"k": df[key], "s": salt, "h": is_hot})
                .select(
                    pl.when(pl.col("h"))
                    .then(pl.col("k") + "#" + pl.col("s"))
                    .otherwise(pl.col("k") + "#0")
                    .alias(out_col)
                )
            )
            return batch.append_column(out_col, salted.to_arrow()[out_col].cast(pa.string()))

    return ds.map_batches(Salt(hot_ref), batch_format="pyarrow", zero_copy_batch=True)


def salted_group_counts(
    ds: ray.data.Dataset, *, key: str, threshold: int = 100_000, n_salts: int = 16
) -> ray.data.Dataset:
    """Frequency count robust to skew: salt hot keys, count per salted key
    (bounded groups), then merge the per-salt partials per base key — the
    second groupby sees at most n_salts rows per hot key."""
    from ray.data.aggregate import Sum

    hot = hot_keys(ds, key=key, threshold=threshold)
    salted = add_salted_key(ds, key=key, hot=hot, n_salts=n_salts)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("salted_key", as_index=False).size().rename(columns={"size": "n"})
        out["base_key"] = out["salted_key"].str.rsplit("#", n=1).str[0]
        return out[["base_key", "salted_key", "n"]]

    per_salt = salted.map_batches(partial, batch_format="pandas").repartition(8)
    return per_salt.groupby("base_key").aggregate(Sum("n", alias_name="n"))
