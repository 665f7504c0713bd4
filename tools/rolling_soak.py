"""Soak the rolling-window operator at millions of rows: synthesize a
deterministic event stream distributed (map-only), run ROWS+RANGE frames,
verify spot invariants, report throughput.

    python tools/rolling_soak.py [n_rows] [n_keys]
"""

import sys
import time

import numpy as np
import pandas as pd
import ray
import ray.data


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    sys.path.insert(0, "/root/repo")
    from knowledgegraphs_ray.streaming.rolling import sorted_rolling_agg

    n_shards = 64

    def synth(batch: pd.DataFrame) -> pd.DataFrame:
        s = int(batch["shard"].iloc[0])
        per = n // n_shards
        rng = np.random.default_rng(1000 + s)
        ids = np.arange(s * per, (s + 1) * per, dtype=np.int64)
        return pd.DataFrame(
            {
                "id": ids,
                "k": rng.integers(0, n_keys, per).astype("int64"),
                "rv": rng.integers(0, 10_000_000, per).astype("int64"),
                "v": rng.integers(0, 1000, per).astype("int64"),
            }
        )

    ds = ray.data.from_pandas(
        pd.DataFrame({"shard": np.arange(n_shards)})
    ).repartition(n_shards).map_batches(synth, batch_format="pandas").materialize()

    t0 = time.perf_counter()
    out = sorted_rolling_agg(
        ds,
        key_cols=["k"],
        order_cols=["rv", "id"],
        val_col="v",
        rows_window=8,
        range_window=5_000,
        range_col="rv",
    ).materialize()
    dt = time.perf_counter() - t0
    rows = out.count()

    # invariants on a gathered sample: cnt bounds, sum bounds, min<=max
    sample = out.limit(200_000).to_pandas()
    assert (sample["roll_cnt"].between(1, 8)).all()
    assert (sample["roll_min"] <= sample["roll_max"]).all()
    assert (sample["roll_sum"] >= sample["roll_min"]).all()
    assert (sample["range_cnt"] >= 1).all()
    # exact check on one hot key vs pandas
    key = sample["k"].mode().iloc[0]
    g = (
        out.filter(expr=f"k == {key}")
        .to_pandas()
        .sort_values(["rv", "id"])
        .reset_index(drop=True)
    )
    v = g["v"].to_numpy()
    exp_sum = pd.Series(v).rolling(8, min_periods=1).sum().astype("int64")
    np.testing.assert_array_equal(g["roll_sum"].to_numpy(), exp_sum.to_numpy())

    print(
        f"rolling soak: {rows} rows, {n_keys} keys in {dt:.1f}s "
        f"({rows/dt/1e6:.2f}M rows/s) — invariants + per-key exact check OK"
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
