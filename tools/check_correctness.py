"""Local stand-in for the driver's correctness gate: run every queries()
entry and its oracle_sql() twin on the same sf dir, compare row count, schema,
and order-insensitive values. Usage: python tools/check_correctness.py [sf_dir] [names...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from knowledgegraphs_ray.pipelines import catalog

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = catalog.queries(), catalog.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows={len(mine)} ({dt:.1f}s) [rows-only, no oracle]")
            continue
        try:
            gold = canon(con.execute(oracles[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if len(mine) != len(gold):
            print(f"FAIL {name}: rows {len(mine)} vs oracle {len(gold)} ({dt:.1f}s)")
            failures += 1
            continue
        if list(mine.columns) != list(gold.columns):
            print(f"FAIL {name}: cols {list(mine.columns)} vs {list(gold.columns)}")
            failures += 1
            continue
        bad = None
        for c in mine.columns:
            a, b = mine[c], gold[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                import numpy as np

                if not np.allclose(a.astype(float), b.astype(float), rtol=1e-9, atol=1e-12, equal_nan=True):
                    bad = c
                    break
            elif not a.astype(str).equals(b.astype(str)):
                bad = c
                break
        if bad:
            mism = (mine[bad].astype(str) != gold[bad].astype(str))
            print(f"FAIL {name}: column '{bad}' mismatches ({int(mism.sum())} rows)")
            ex = mine[mism].head(3)
            gx = gold[mism].head(3)
            print("  mine:", ex.to_dict("records"))
            print("  gold:", gx.to_dict("records"))
            failures += 1
        else:
            print(f"PASS {name}: rows={len(mine)} ({dt:.1f}s)")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
