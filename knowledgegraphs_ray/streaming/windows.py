"""Stream-shaped operators over an ordered, keyed event log.

The reference has no streaming (SURVEY.md §2.15); these are the standard
log-processing operators a transcript/event pipeline needs, expressed the
Ray-Data way: the input is a partitioned log — partition by key, sort by ts
WITHIN the partition (``groupby(key).map_groups``), windows computed over the
sorted group. Ordering assumption: event time is the ``ts`` column; no late
data / watermarks (batch semantics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def tumbling_window_agg(
    ds: ray.data.Dataset,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_sec: int = 3600,
) -> ray.data.Dataset:
    """Per (key, window) count + sum. Map-only window assignment + one
    pre-aggregated groupby: partials are combined inside ``map_batches``
    first, so the shuffle moves one row per (key, window, block), not per
    event."""

    def assign_and_partial(batch: pa.Table) -> pd.DataFrame:
        ts_us = batch[ts_col].combine_chunks().cast(pa.timestamp("us"), safe=False)
        ep_us = pc.cast(ts_us, pa.int64())  # µs epoch regardless of input unit
        win = pc.multiply(
            pc.divide(ep_us, window_sec * 1_000_000), window_sec
        )  # window start in SECONDS (integer floor)
        # money as integer cents — engine-portable exact sums
        cents = pc.cast(pc.round(pc.multiply(batch[value_col], 100)), pa.int64())
        df = pd.DataFrame(
            {
                key: batch[key].to_numpy(zero_copy_only=False),
                "window_start": win.to_numpy(zero_copy_only=False),
                "cents": cents.to_numpy(zero_copy_only=False),
            }
        )
        return (
            df.groupby([key, "window_start"], as_index=False)
            .agg(n_events=("cents", "size"), sum_cents=("cents", "sum"))
        )

    from knowledgegraphs_ray.util.fastagg import sum_partials

    partials = ds.map_batches(
        assign_and_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return sum_partials(
        partials, keys=[key, "window_start"], sum_cols=["n_events", "sum_cents"]
    )


def hopping_window_agg(
    ds: ray.data.Dataset,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_sec: int = 3600,
    hop_sec: int = 900,
) -> ray.data.Dataset:
    """Hopping (sliding) windows: length ``window_sec``, advancing by
    ``hop_sec``; an event at second t lands in every window
    [k*hop, k*hop + window) containing it (window/hop of them). Map-only
    vectorized replication + per-batch partial aggregation — the shuffle
    moves one row per (key, window, block), not per event copy."""
    assert window_sec % hop_sec == 0 or window_sec > hop_sec

    def assign_and_partial(batch: pa.Table) -> pd.DataFrame:
        import numpy as np

        ts_us = batch[ts_col].combine_chunks().cast(pa.timestamp("us"), safe=False)
        ep_s = pc.divide(pc.cast(ts_us, pa.int64()), 1_000_000).to_numpy(
            zero_copy_only=False
        )
        cents = (
            pc.cast(pc.round(pc.multiply(batch[value_col], 100)), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        keys = batch[key].to_numpy(zero_copy_only=False)
        k_min = (ep_s - window_sec) // hop_sec + 1
        k_max = ep_s // hop_sec
        reps = (k_max - k_min + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(ep_s)), reps)
        offsets = np.concatenate([[0], np.cumsum(reps)])[:-1]
        ks = np.arange(int(reps.sum())) - np.repeat(offsets, reps) + np.repeat(
            k_min, reps
        )
        df = pd.DataFrame(
            {
                key: keys[idx],
                "window_start": ks * hop_sec,
                "cents": cents[idx],
            }
        )
        return df.groupby([key, "window_start"], as_index=False).agg(
            n_events=("cents", "size"), sum_cents=("cents", "sum")
        )

    from knowledgegraphs_ray.util.fastagg import sum_partials

    partials = ds.map_batches(
        assign_and_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return sum_partials(
        partials, keys=[key, "window_start"], sum_cols=["n_events", "sum_cents"]
    )


def sessionize(
    ds: ray.data.Dataset,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_sec: int = 1800,
    strategy: str = "scan",
) -> ray.data.Dataset:
    """Session windows: events of one key sorted by ts; a gap > gap_sec
    starts a new session. -> (key, session_idx, n_events, sum_value,
    start_epoch, end_epoch).

    strategy="scan" (default): ONE distributed sort + vectorized per-block
    session scan with O(num_blocks) boundary carry (``util.segrank``), then
    combine-before-shuffle partial aggregates — no per-key Python at any
    key count. strategy="group": the literal per-key pandas path, kept as
    the semantic reference for tests."""
    if strategy == "scan":
        return _sessionize_scan(
            ds, key=key, ts_col=ts_col, value_col=value_col, gap_sec=gap_sec
        )

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, "event_id"] if "event_id" in g else [ts_col], kind="mergesort")
        # normalize to µs regardless of the pandas datetime unit (s/ms/us/ns)
        ep_us = g[ts_col].astype("datetime64[us]").astype("int64")
        gaps = ep_us.diff().fillna(0)
        session = (gaps > gap_sec * 1_000_000).cumsum()
        cents = (g[value_col] * 100).round().astype("int64")
        out = (
            pd.DataFrame(
                {
                    key: g[key].to_numpy(),
                    "session_idx": session.to_numpy(),
                    "ep_us": ep_us.to_numpy(),
                    "cents": cents.to_numpy(),
                }
            )
            .groupby([key, "session_idx"], as_index=False)
            .agg(
                n_events=("ep_us", "size"),
                sum_cents=("cents", "sum"),
                start_us=("ep_us", "min"),
                end_us=("ep_us", "max"),
            )
        )
        out["session_idx"] = out["session_idx"].astype("int64")
        return out

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


def _sessionize_scan(
    ds: ray.data.Dataset,
    *,
    key: str,
    ts_col: str,
    value_col: str,
    gap_sec: int,
) -> ray.data.Dataset:
    from knowledgegraphs_ray.util.fastagg import merge_partials
    from knowledgegraphs_ray.util.segrank import sorted_session_index

    order = ["event_id"] if "event_id" in ds.schema().names else []
    indexed = sorted_session_index(
        ds,
        key_cols=[key],
        order_cols=[ts_col] + order,
        ts_col=ts_col,
        gap_us=gap_sec * 1_000_000,
        idx_col="session_idx",
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        ep_us = pc.cast(
            batch[ts_col].combine_chunks().cast(pa.timestamp("us"), safe=False),
            pa.int64(),
        )
        cents = pc.cast(pc.round(pc.multiply(batch[value_col], 100)), pa.int64())
        df = pd.DataFrame(
            {
                key: batch[key].to_numpy(zero_copy_only=False),
                "session_idx": batch["session_idx"].to_numpy(zero_copy_only=False),
                "ep_us": ep_us.to_numpy(zero_copy_only=False),
                "cents": cents.to_numpy(zero_copy_only=False),
            }
        )
        return df.groupby([key, "session_idx"], as_index=False).agg(
            n_events=("ep_us", "size"),
            sum_cents=("cents", "sum"),
            start_us=("ep_us", "min"),
            end_us=("ep_us", "max"),
        )

    partials = indexed.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return merge_partials(
        partials,
        keys=[key, "session_idx"],
        agg={
            "n_events": "sum",
            "sum_cents": "sum",
            "start_us": "min",
            "end_us": "max",
        },
    )
