"""Interval (range) join — match point rows to interval rows with
``lo <= point <= hi``, optionally within a key.

Ray Data has no native range join; the scale-shaped composition here is the
standard *binned replication* plan:

* points get ONE bin id (``point // bin_width``);
* intervals are replicated into every bin they overlap (replication factor
  = interval length / bin_width, so pick ``bin_width`` near the typical
  interval length);
* both sides co-locate by ``hash(key, bin) % n_buckets`` — a bounded bucket
  count, NOT a group per (key, bin), so the per-group work stays a
  vectorized pandas merge over many (key, bin) pairs at once;
* a (point, interval) match can only surface in the point's single bin, so
  the replication needs NO dedup pass.

Partitioning assumption: one hash bucket's rows fit a worker (raise
``n_buckets`` or salt hot keys upstream via ``canon.skew`` otherwise).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data


def interval_join(
    points: ray.data.Dataset,
    intervals: ray.data.Dataset,
    *,
    point_col: str,
    lo_col: str,
    hi_col: str,
    key: str | None = None,
    bin_width: int | None = None,
    n_buckets: int = 32,
) -> ray.data.Dataset:
    """Inner join: every (point row, interval row) pair with
    ``lo <= point <= hi`` (and equal ``key`` when given). Output = point
    columns + interval columns (minus its key column). Values must be
    integers (epochs, offsets) — bin arithmetic is integer.

    ``bin_width=None`` auto-tunes from a bounded deterministic sample of
    interval lengths (first ~8k intervals): width ≈ the median length, so
    the replication factor stays ~2 whether sessions span minutes or months
    (a month-long interval with a minutes-scale manual width would fan into
    thousands of bins). The joined pair set is bin-width-invariant (each
    match surfaces only in the point's bin), so tuning never changes
    results — only the shuffle volume."""
    if bin_width is None:
        sample = intervals.limit(8192).to_pandas()
        if len(sample):
            lengths = (
                sample[hi_col].to_numpy().astype(np.int64)
                - sample[lo_col].to_numpy().astype(np.int64)
            )
            bin_width = max(1, int(np.median(lengths)))
        else:
            bin_width = 1

    pcols = list(points.schema().names)
    icols = [c for c in intervals.schema().names if c != key]
    # dtype templates: the union upcasts disjoint columns to float (NaN on
    # the other side); the output casts back to the input dtypes
    from knowledgegraphs_ray.util.blocks import empty_pandas_template

    p_template = empty_pandas_template(points)
    i_template = empty_pandas_template(intervals)
    out_dtypes = {c: p_template[c].dtype for c in pcols}
    out_dtypes.update({c: i_template[c].dtype for c in icols})
    all_cols = pcols + [c for c in icols if c not in pcols]

    def _nullable(dtype):
        # null-capable placeholder for the absent side: integers widen to
        # pandas NULLABLE Int64, never float64 (exactness above 2^53 —
        # snowflake ids / ns epochs; ADVICE r2)
        if isinstance(dtype, pd.api.extensions.ExtensionDtype):
            return dtype
        if np.issubdtype(dtype, np.datetime64):
            return dtype
        if np.issubdtype(dtype, np.integer):
            return pd.Int64Dtype()
        if np.issubdtype(dtype, np.floating):
            return np.dtype("float64")
        return np.dtype("object")

    ph_dtypes = {c: _nullable(out_dtypes[c]) for c in all_cols}

    def tag_points(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bin"] = df[point_col].to_numpy().astype(np.int64) // bin_width
        df["__side"] = 0
        return df

    def tag_intervals(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            df = df.copy()
            df["__bin"] = pd.Series([], dtype="int64")
            df["__side"] = 1
            return df
        lo = df[lo_col].to_numpy().astype(np.int64) // bin_width
        hi = df[hi_col].to_numpy().astype(np.int64) // bin_width
        reps = (hi - lo + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(df)), reps)
        # bin sequence per interval: lo, lo+1, ..., hi (vectorized)
        offsets = np.concatenate([[0], np.cumsum(reps)])[:-1]
        bins = np.arange(int(reps.sum())) - np.repeat(offsets, reps) + np.repeat(lo, reps)
        out = df.iloc[idx].copy()
        out["__bin"] = bins
        out["__side"] = 1
        return out

    p = points.map_batches(tag_points, batch_format="pandas")
    iv = intervals.map_batches(tag_intervals, batch_format="pandas")

    keyed = [key] if key else []

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            df = df.copy()
            df["__bucket"] = pd.Series([], dtype="int64")
            return df
        h = df["__bin"].to_numpy().astype(np.uint64)
        if key:
            h = h * np.uint64(0x9E3779B97F4A7C15) + pd.util.hash_array(
                df[key].to_numpy()
            ).astype(np.uint64)
        df = df.copy()
        df["__bucket"] = (h % np.uint64(n_buckets)).astype("int64")
        # widen to one constant column set (null-capable Int64 for ints —
        # no float64 round-trip) so the union shuffles a stable schema
        for c in all_cols:
            if c not in df.columns:
                df[c] = pd.Series(pd.NA, dtype=ph_dtypes[c], index=df.index)
        return df[all_cols + ["__bin", "__side", "__bucket"]].astype(
            {c: ph_dtypes[c] for c in all_cols}
        )

    both = p.map_batches(bucketize, batch_format="pandas").union(
        iv.map_batches(bucketize, batch_format="pandas")
    )

    empty = pd.DataFrame(
        {c: pd.Series([], dtype=out_dtypes[c]) for c in pcols + icols}
    )

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lp = g[g["__side"] == 0]
        ri = g[g["__side"] == 1]
        if lp.empty or ri.empty:
            return empty.copy()
        # vectorized equi-merge on (key?, bin), then the range filter
        on = keyed + ["__bin"]
        merged = lp[pcols + ["__bin"]].merge(
            ri[icols + keyed + ["__bin"]],
            on=on,
            how="inner",
        )
        if merged.empty:
            return empty.copy()
        keep = (merged[lo_col] <= merged[point_col]) & (
            merged[point_col] <= merged[hi_col]
        )
        return merged.loc[keep, pcols + icols].astype(out_dtypes)

    def merge_bucket_arrow(t) -> pd.DataFrame:
        # pyarrow group format + explicit mapper: Ray's default
        # arrow->pandas turns int64-with-nulls into float64 (2^53 loss)
        import pyarrow as _pa

        mapper = {_pa.int64(): pd.Int64Dtype(), _pa.int32(): pd.Int32Dtype()}.get
        return merge_bucket(t.to_pandas(types_mapper=mapper))

    return both.groupby("__bucket").map_groups(merge_bucket_arrow, batch_format="pyarrow")
