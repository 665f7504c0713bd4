"""Incremental keyed state via raw Ray actors — the documented last-resort
tier (Dataset API -> actor-pool map_batches -> raw actors) for semantics the
Dataset API can't express: state that must SURVIVE across batches in event
order, e.g. open sessions while a log streams in.

Shape: N shard actors, each owning a hash range of keys. The driver streams
ts-sorted batches (one distributed sort up front — the same ordering
assumption every log consumer makes), routes rows to shards, and actors fold
them into per-key open-session state; closed sessions are emitted
incrementally, the final flush closes the rest. Equivalent to the batch
``sessionize`` (asserted in tests) but with bounded memory per actor: state
is O(open keys), never O(events).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data


@ray.remote
class SessionShard:
    """Owns the open-session state for one key-hash shard."""

    def __init__(self, gap_us: int):
        self.gap_us = gap_us
        # key -> [session_idx, n_events, sum_cents, start_us, end_us]
        self.open: dict = {}

    def ingest(self, df: pd.DataFrame) -> pd.DataFrame:
        """Rows MUST arrive in non-decreasing ts order per key. Returns the
        sessions this batch closed."""
        closed = []
        for key, ep, cents in zip(df["key"], df["ep_us"], df["cents"]):
            st = self.open.get(key)
            if st is None:
                self.open[key] = [0, 1, int(cents), int(ep), int(ep)]
            elif ep - st[4] > self.gap_us:
                closed.append((key, st[0], st[1], st[2], st[3], st[4]))
                self.open[key] = [st[0] + 1, 1, int(cents), int(ep), int(ep)]
            else:
                st[1] += 1
                st[2] += int(cents)
                st[4] = int(ep)
        return pd.DataFrame(
            closed,
            columns=["key", "session_idx", "n_events", "sum_cents", "start_us", "end_us"],
        )

    def flush(self) -> pd.DataFrame:
        rows = [
            (k, st[0], st[1], st[2], st[3], st[4]) for k, st in sorted(self.open.items())
        ]
        self.open.clear()
        return pd.DataFrame(
            rows,
            columns=["key", "session_idx", "n_events", "sum_cents", "start_us", "end_us"],
        )


def incremental_sessionize(
    ds: ray.data.Dataset,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_sec: int = 1800,
    n_shards: int = 4,
    batch_size: int = 65536,
) -> pd.DataFrame:
    """Stream-shaped sessionization with per-shard incremental state.

    One distributed sort by ts establishes event order; batches then stream
    through shard actors keyed by hash(key) % n_shards. Output matches the
    batch ``sessionize`` exactly (same integer-cents sums, µs epochs)."""
    shards = [SessionShard.remote(gap_sec * 1_000_000) for _ in range(n_shards)]
    ordered = ds.sort([ts_col] + (["event_id"] if "event_id" in ds.schema().names else []))

    pending = []
    for batch in ordered.iter_batches(batch_size=batch_size, batch_format="pandas"):
        ep = batch[ts_col].astype("datetime64[us]").astype("int64")
        frame = pd.DataFrame(
            {
                "key": batch[key].to_numpy(),
                "ep_us": ep.to_numpy(),
                "cents": (batch[value_col] * 100).round().astype("int64").to_numpy(),
            }
        )
        shard_of = pd.util.hash_array(frame["key"].to_numpy()) % n_shards
        for s in range(n_shards):
            part = frame[shard_of == s]
            if len(part):
                pending.append(shards[s].ingest.remote(part))
    results = ray.get(pending) + ray.get([s.flush.remote() for s in shards])
    out = pd.concat([r for r in results if len(r)], ignore_index=True) if results else pd.DataFrame()
    if out.empty:
        return out
    out = out.rename(columns={"key": key}).sort_values([key, "session_idx"])
    return out.reset_index(drop=True).astype(
        {key: "int64", "session_idx": "int64", "n_events": "int64", "sum_cents": "int64"}
    )
