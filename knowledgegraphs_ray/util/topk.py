"""Per-group top-k — ``row_number() OVER (PARTITION BY key ORDER BY score
DESC, id) <= k`` without a full global sort of the input.

Two stages, both proven shapes elsewhere in the repo:

1. **Partial prune (combine-before-shuffle)**: each batch keeps at most k
   rows per key it contains — vectorized sort + cumcount, no Python per
   row. Rows entering the exchange drop from N to <= k x (keys-per-batch)
   x num_batches; for corpus-scale groups (docs per language) that is the
   difference between shuffling the corpus and shuffling k x blocks rows.
2. **Exact rank**: one range-partitioned sort on (key, order) over the
   pruned survivors + the :mod:`segrank` block scan (O(num_blocks) driver
   metadata), then a map-only ``rank < k`` cut. No ``map_groups`` — the
   per-group-Python tax at 100k+ keys is the documented anti-pattern.

The global top-k twin (no key) lives in ``pipelines/analytics.py``
(``top_customers_by_revenue``); this is the partitioned generalization.
"""

from __future__ import annotations

import pandas as pd
import ray.data


def topk_per_group(
    ds: ray.data.Dataset,
    *,
    key_cols: list[str],
    score_col: str,
    id_col: str,
    k: int,
    descending: bool = True,
    rank_col: str = "rank",
) -> ray.data.Dataset:
    """-> rows of ``ds`` whose 0-based rank under ``ORDER BY score
    [DESC], id`` within their key group is < k, with ``rank_col`` attached
    (int64). Ties break on ``id_col`` ascending, so the selection is a pure
    function of the data at any parallelism. Key/order columns must be
    non-null (they become sort keys)."""
    if k <= 0:
        raise ValueError("k must be positive")

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        d = df.sort_values(
            key_cols + [score_col, id_col],
            ascending=[True] * len(key_cols) + [not descending, True],
            kind="mergesort",
        )
        keep = d.groupby(key_cols, sort=False).cumcount() < k
        return d[keep.to_numpy()]

    from knowledgegraphs_ray.util.segrank import sorted_segment_rank

    pruned = ds.map_batches(prune, batch_format="pandas")
    # segrank sorts ascending; order by the negated score for DESC. Numeric
    # negation is exact for int64/float scores (int64 min would overflow,
    # but a score at the dtype's minimum cannot occur from counts/lengths).
    if descending:
        keyed = pruned.map_batches(
            lambda df: df.assign(__ord=-df[score_col]), batch_format="pandas"
        )
        order = ["__ord", id_col]
    else:
        keyed = pruned
        order = [score_col, id_col]
    ranked = sorted_segment_rank(
        keyed, key_cols=key_cols, order_cols=order, rank_col=rank_col, dtype="int64"
    )

    import pyarrow as pa
    import pyarrow.compute as pc

    def cut(t: pa.Table) -> pa.Table:
        out = t.filter(pc.less(t[rank_col], k))
        return out.drop_columns(["__ord"]) if descending else out

    return ranked.map_batches(cut, batch_format="pyarrow", zero_copy_batch=True)


def topk_per_group_oracle_sql(
    *,
    key_cols: list[str],
    score_expr: str,
    id_col: str,
    k: int,
    table: str,
    descending: bool = True,
) -> str:
    """DuckDB twin: row_number() window over the same (key, score, id)
    order. ``score_expr`` may be any SQL expression; it is aliased to the
    Ray side's score column name by the caller's outer SELECT."""
    keys = ", ".join(key_cols)
    direction = "DESC" if descending else "ASC"
    return f"""
WITH s AS (
  SELECT {keys}, {id_col}, {score_expr} AS score FROM {table}
), r AS (
  SELECT {keys}, {id_col}, score,
         row_number() OVER (PARTITION BY {keys}
                            ORDER BY score {direction}, {id_col}) - 1 AS rank
  FROM s
)
SELECT {keys}, {id_col}, score, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank < {int(k)}
"""


def percentile_per_group(
    ds: ray.data.Dataset,
    *,
    key_cols: list[str],
    score_col: str,
    id_col: str,
    pct_col: str = "pct_micro",
) -> ray.data.Dataset:
    """Per-group percentile normalization — calibrate a raw score across
    groups (quality scores across languages, lengths across sources) so a
    downstream "keep the top X% of every group" filter is one integer
    compare. Adds ``pct_col`` = (position * 1e6) // (group_size - 1) where
    position is the 0-based rank under ``ORDER BY score, id`` (row_number
    semantics: ties break on id — deterministic, and the SQL twin uses the
    identical window, so parity is structural integer arithmetic).
    Single-member groups get 0.

    Shape: group sizes via per-block count partials (vocabulary-sized
    broadcast), one range-partitioned sort of the rows + the segrank block
    scan, then a map-only integer division. No map_groups anywhere.
    """
    import numpy as np
    import ray

    from knowledgegraphs_ray.util.fastagg import merge_partials
    from knowledgegraphs_ray.util.segrank import sorted_segment_rank

    def count_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key_cols, sort=False).size().reset_index(name="n")
        return g

    sizes = merge_partials(
        ds.map_batches(count_part, batch_format="pandas"),
        keys=key_cols,
        agg={"n": "sum"},
    ).to_pandas()
    sref = ray.put(sizes)

    ranked = sorted_segment_rank(
        ds, key_cols=key_cols, order_cols=[score_col, id_col],
        rank_col="__pos", dtype="int64",
    )

    def pct(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df.assign(**{pct_col: pd.Series([], dtype="int64")}).drop(
                columns=["__pos"]
            )
        # vectorized size lookup: merge against the broadcast group-size
        # table (group count is vocabulary-sized)
        n = (
            df[key_cols]
            .merge(ray.get(sref), on=key_cols, how="left")["n"]
            .to_numpy()
            .astype(np.int64)
        )
        pos = df["__pos"].to_numpy()
        out = np.zeros(len(df), dtype=np.int64)
        multi = n > 1
        out[multi] = (pos[multi] * 1_000_000) // (n[multi] - 1)
        return df.assign(**{pct_col: out}).drop(columns=["__pos"])

    return ranked.map_batches(pct, batch_format="pandas")


def percentile_per_group_oracle_sql(
    *,
    table: str,
    key_cols: list[str],
    score_col: str,
    id_col: str,
    out_cols: str,
    pct_col: str = "pct_micro",
    where: str = "TRUE",
) -> str:
    """DuckDB twin: the identical row_number window + integer division."""
    keys = ", ".join(key_cols)
    return f"""
WITH r AS (
  SELECT *, row_number() OVER (PARTITION BY {keys}
              ORDER BY {score_col}, {id_col}) - 1 AS pos,
         count(*) OVER (PARTITION BY {keys}) AS n
  FROM {table} WHERE {where}
)
SELECT {out_cols},
       CAST(CASE WHEN n > 1 THEN (pos * 1000000) // (n - 1) ELSE 0 END
            AS BIGINT) AS {pct_col}
FROM r
"""
