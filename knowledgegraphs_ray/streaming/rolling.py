"""Per-key ROLLING-WINDOW aggregates over a sorted stream — the distributed
twin of SQL sliding window frames:

* ROWS mode  — ``agg(val) OVER (PARTITION BY key ORDER BY ord
  ROWS BETWEEN w-1 PRECEDING AND CURRENT ROW)``
* RANGE mode — ``agg(val) OVER (PARTITION BY key ORDER BY rv
  RANGE BETWEEN R PRECEDING AND CURRENT ROW)`` (peer-inclusive: rows that
  tie the current row's ``rv`` are in the frame even when they sort later,
  exactly DuckDB/ANSI RANGE semantics).

Reference analogue: the reference computes per-entity running aggregates
only via full re-scans inside its annotation selector
(``MappingSelection.java`` score windows); a streaming corpus needs the
general operator (per-user rolling spend, per-source rolling token budget,
rate limiting, burst detection).

Scale shape — one range-partitioned sort, then MAP-ONLY halo scan:

* After ``sort(key_cols + order_cols)`` the blocks tile the key×order space.
  A row's frame can only reach backwards into the TRAILING RUN of its
  block's predecessors (same key, smaller order), so each block needs a
  bounded tail slice of the blocks before it — O(frame) rows, never a
  shuffle. The driver walks O(num_blocks) small metadata dicts to size the
  slices; block payloads stay in the object store.
* ROWS needs exactly ``w-1`` predecessor rows per key run; RANGE needs the
  predecessor rows within ``R`` of the block's first row — the walk takes
  whole trailing runs (overshoot is ignored by the frame arithmetic) and
  raises past ``max_halo_rows`` instead of silently degrading: a single key
  whose R-window exceeds that many rows is a hot-key signal (salt the key
  or pre-aggregate to a coarser grain first).
* Sums/counts are exact int64 (``val_col`` must be int64 — quantize floats
  upstream, the repo's cents/micro discipline); min/max are int64-exact via
  per-run pandas rolling (C kernels, float64 intermediates are exact below
  2^53).

Determinism: make ``order_cols`` a total order within each key (append a
unique id) or ROWS frames are partitioning-dependent, same as SQL. RANGE
frames are tie-symmetric and need no tiebreak. Key/order columns must be
non-null.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from knowledgegraphs_ray.util.segrank import _run_bounds



@ray.remote
def _block_meta(block, key_cols: list[str], range_col: str | None) -> dict:
    if isinstance(block, pd.DataFrame):
        block = pa.Table.from_pandas(block, preserve_index=False)
    n = block.num_rows
    if n == 0:
        return {"n": 0}
    change = _run_bounds(block, key_cols)
    starts = np.flatnonzero(change)
    tail_start = int(starts[-1])
    meta = {
        "n": n,
        "first_key": tuple(block[c][0].as_py() for c in key_cols),
        "last_key": tuple(block[c][n - 1].as_py() for c in key_cols),
        "tail_len": n - tail_start,
    }
    if range_col is not None:
        rv = block[range_col].to_numpy(zero_copy_only=False)
        meta["first_rv"] = int(rv[0])
        meta["tail_first_rv"] = int(rv[tail_start])
        meta["tail_last_rv"] = int(rv[n - 1])
        # leading rows tying (first_key, first_rv): a PRECEDING block's last
        # row may need them as frame peers (ANSI RANGE includes ties that
        # sort after the current row)
        first_run_end = int(starts[1]) if len(starts) > 1 else n
        meta["head_peer_len"] = int(
            np.searchsorted(rv[:first_run_end], rv[0], side="right")
        )
    return meta


@ray.remote
def _tail_slice(block, k: int) -> pa.Table:
    if isinstance(block, pd.DataFrame):
        block = pa.Table.from_pandas(block, preserve_index=False)
    return block.slice(block.num_rows - k, k)


@ray.remote
def _head_slice(block, k: int) -> pa.Table:
    if isinstance(block, pd.DataFrame):
        block = pa.Table.from_pandas(block, preserve_index=False)
    return block.slice(0, k)


@ray.remote
def _rolling_block(
    block,
    key_cols: list[str],
    val_col: str,
    rows_window: int | None,
    range_window: int | None,
    range_col: str | None,
    n_pre: int,
    *halos: pa.Table,
) -> pa.Table:
    if isinstance(block, pd.DataFrame):
        block = pa.Table.from_pandas(block, preserve_index=False)
    n = block.num_rows
    pre = [h for h in halos[:n_pre] if h.num_rows]
    post = [h for h in halos[n_pre:] if h.num_rows]
    parts = pre + [block] + post
    ext = pa.concat_tables(parts, promote_options="default") if len(parts) > 1 else block
    base = sum(h.num_rows for h in pre)

    change = _run_bounds(ext, key_cols)
    run_id = np.cumsum(change) - 1
    starts = np.flatnonzero(change)
    run_start = starts[run_id]  # per-row index of its key run's first row

    v = ext[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
    csum0 = np.concatenate(([0], np.cumsum(v)))
    g = np.arange(base, base + n, dtype=np.int64)
    out = block

    if rows_window is not None:
        lo = np.maximum(run_start[base : base + n], g - rows_window + 1)
        out = out.append_column(
            "roll_sum", pa.array(csum0[g + 1] - csum0[lo], pa.int64())
        )
        out = out.append_column("roll_cnt", pa.array(g - lo + 1, pa.int64()))
        roll = (
            pd.Series(v)
            .groupby(run_id)
            .rolling(rows_window, min_periods=1)
        )
        mn = roll.min().to_numpy()[base : base + n].astype(np.int64)
        mx = roll.max().to_numpy()[base : base + n].astype(np.int64)
        out = out.append_column("roll_min", pa.array(mn, pa.int64()))
        out = out.append_column("roll_max", pa.array(mx, pa.int64()))

    if range_window is not None:
        rv = ext[range_col].to_numpy(zero_copy_only=False).astype(np.int64)
        delta = rv - rv[run_start]  # within-run offsets, >= 0 and sorted
        n_runs = int(run_id[-1]) + 1
        stride = int(delta.max()) + 1 if len(delta) else 1
        if n_runs <= (1 << 62) // max(stride, 1):
            # pack within-run offsets into disjoint per-run bands so ONE
            # global searchsorted answers every run's frame
            band = run_id.astype(np.int64) * stride
            adj = band + delta
            tgt = band[base : base + n] + np.maximum(delta[base : base + n] - range_window, 0)
            lo = np.searchsorted(adj, tgt, side="left")
            hi = np.searchsorted(adj, adj[base : base + n], side="right")  # peers in
        else:  # n_runs x span overflows the packing — per-run searchsorted
            lo_full = np.empty(len(rv), np.int64)
            hi_full = np.empty(len(rv), np.int64)
            bounds = np.concatenate((starts, [len(rv)]))
            for s, e in zip(bounds[:-1], bounds[1:]):
                seg = rv[s:e]
                lo_full[s:e] = s + np.searchsorted(seg, seg - range_window, "left")
                hi_full[s:e] = s + np.searchsorted(seg, seg, "right")
            lo, hi = lo_full[base : base + n], hi_full[base : base + n]
        out = out.append_column(
            "range_sum", pa.array(csum0[hi] - csum0[lo], pa.int64())
        )
        out = out.append_column("range_cnt", pa.array(hi - lo, pa.int64()))
    return out


def sorted_rolling_agg(
    ds: ray.data.Dataset,
    *,
    key_cols: list[str],
    order_cols: list[str],
    val_col: str,
    rows_window: int | None = None,
    range_window: int | None = None,
    range_col: str | None = None,
    assume_sorted: bool = False,
    max_halo_rows: int = 1_000_000,
) -> ray.data.Dataset:
    """-> ``ds`` sorted by ``key_cols + order_cols`` with sliding-frame
    aggregate columns appended: ``roll_sum/roll_cnt/roll_min/roll_max``
    (ROWS frame of ``rows_window``) and/or ``range_sum/range_cnt`` (RANGE
    frame of ``range_window`` over int64 ``range_col``). See module doc for
    SQL equivalence, halo shape, and the int64 exactness contract."""
    if rows_window is None and range_window is None:
        raise ValueError("need rows_window and/or range_window")
    if range_window is not None and range_col is None:
        raise ValueError("range_window requires range_col")
    if range_col is not None and (not order_cols or order_cols[0] != range_col):
        raise ValueError(
            "range_col must be order_cols[0] — RANGE frames assume the "
            "range column is non-decreasing within each key"
        )

    sorted_ds = ds if assume_sorted else ds.sort(key_cols + order_cols)
    raw = sorted_ds.to_arrow_refs()
    metas = ray.get([_block_meta.remote(r, key_cols, range_col) for r in raw])
    refs = [r for r, m in zip(raw, metas) if m["n"] > 0]
    metas = [m for m in metas if m["n"] > 0]
    if not refs:
        return sorted_ds

    out_blocks = []
    for i, r in enumerate(refs):
        key = metas[i]["first_key"]
        rows_need = (rows_window - 1) if rows_window is not None else 0
        thr = (
            metas[i]["first_rv"] - range_window if range_window is not None else None
        )
        halos: list = []  # built back-to-front
        taken = 0
        j = i - 1
        while j >= 0 and metas[j]["last_key"] == key:
            m = metas[j]
            take = min(m["tail_len"], max(rows_need, 0))
            if thr is not None and m["tail_last_rv"] >= thr:
                # take the whole trailing run: the frame arithmetic ignores
                # rows before the frame start, so overshoot is harmless
                take = m["tail_len"]
            if take <= 0:
                break
            halos.append(_tail_slice.remote(refs[j], take))
            taken += take
            rows_need -= take
            if taken > max_halo_rows:
                raise ValueError(
                    f"rolling halo for block {i} exceeds max_halo_rows="
                    f"{max_halo_rows}: key {key} is hot — salt it or "
                    "pre-aggregate to a coarser grain"
                )
            if take < m["n"]:
                break  # predecessor has other keys before the tail run
            more_range = thr is not None and m["first_rv"] >= thr
            if rows_need <= 0 and not more_range:
                break
            j -= 1
        halos.reverse()

        post: list = []  # following peers: ANSI RANGE frames include ties
        if range_window is not None:
            last_key = metas[i]["last_key"]
            last_rv = metas[i]["tail_last_rv"]
            j = i + 1
            while (
                j < len(refs)
                and metas[j]["first_key"] == last_key
                and metas[j]["first_rv"] == last_rv
            ):
                take = metas[j]["head_peer_len"]
                post.append(_head_slice.remote(refs[j], take))
                taken += take
                if taken > max_halo_rows:
                    raise ValueError(
                        f"rolling halo for block {i} exceeds max_halo_rows="
                        f"{max_halo_rows}: key {last_key} is hot — salt it "
                        "or pre-aggregate to a coarser grain"
                    )
                if take < metas[j]["n"]:
                    break
                j += 1

        out_blocks.append(
            _rolling_block.remote(
                r,
                key_cols,
                val_col,
                rows_window,
                range_window,
                range_col,
                len(halos),
                *halos,
                *post,
            )
        )
    return ray.data.from_arrow_refs(out_blocks)
