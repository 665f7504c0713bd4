"""Incremental (actor-state) sessionize matches the batch operator exactly."""

import pandas as pd
import ray.data

from knowledgegraphs_ray.streaming.stateful import incremental_sessionize
from knowledgegraphs_ray.streaming.windows import sessionize


def _events(n_users=6, n_events=300):
    base = 1_700_000_000_000_000
    rows = []
    for i in range(n_events):
        uid = i % n_users
        # irregular gaps: every ~10th event of a user jumps > 30 min
        off = (i // n_users) * 300 + ((i // n_users) % 10 == 0) * 3600 * (i // n_users)
        rows.append(
            {
                "event_id": i,
                "user_id": uid,
                "ts": pd.Timestamp(base + off * 1_000_000, unit="us"),
                "value": round(0.5 * (i % 7), 2),
            }
        )
    return ray.data.from_items(rows)


def _frame(ds) -> pd.DataFrame:
    """Dataset -> deterministic frame (the operator emits a DATASET — closed
    sessions never concatenate on the driver; materializing is test-only)."""
    assert isinstance(ds, ray.data.Dataset)
    return (
        ds.to_pandas().sort_values(["user_id", "session_idx"]).reset_index(drop=True)
    )


def test_incremental_matches_batch_sessionize():
    ds = _events()
    batch = (
        sessionize(ds, gap_sec=1800)
        .to_pandas()
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
    )
    inc = _frame(incremental_sessionize(ds, gap_sec=1800, n_shards=3, batch_size=37))
    cols = ["user_id", "session_idx", "n_events", "sum_cents", "start_us", "end_us"]
    pd.testing.assert_frame_equal(
        batch[cols].astype("int64"), inc[cols].astype("int64")
    )


def test_incremental_batch_size_invariance():
    ds = _events(n_users=3, n_events=90)
    a = _frame(incremental_sessionize(ds, gap_sec=1800, n_shards=2, batch_size=7))
    b = _frame(incremental_sessionize(ds, gap_sec=1800, n_shards=4, batch_size=64))
    cols = ["user_id", "session_idx", "n_events", "sum_cents"]
    pd.testing.assert_frame_equal(a[cols], b[cols])


def test_incremental_flush_path_identical():
    """closed_flush_rows=1 forces a mid-run object-store flush after every
    fold — the multi-ref finalize path must produce the same sessions as the
    single-table path."""
    ds = _events()
    normal = _frame(incremental_sessionize(ds, gap_sec=1800, n_shards=2))
    flushed = _frame(
        incremental_sessionize(ds, gap_sec=1800, n_shards=2, closed_flush_rows=1)
    )
    pd.testing.assert_frame_equal(normal, flushed)
    assert len(normal) > 0
