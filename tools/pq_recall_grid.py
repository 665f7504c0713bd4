"""IVF-PQ approximate-mode recall grid (VERDICT r3 item 7).

The driver's `ann_ivf_pq_topk` gate is exact-by-construction (full probe +
full rerank) — right for correctness, silent on the approximate path. This
tool measures what the approximate path actually delivers: recall@k vs the
exact brute-force answer over a seeded clustered corpus, swept over
(n_probe, rerank_r), with the index trained ONCE and reused across cells
(the production train-once/query-many shape `ivf_pq_topk(cent=, books=)`
enables).

Usage:
    python tools/pq_recall_grid.py [--n 1000000] [--dim 32] [--cpus 32]

Prints one markdown table (recall@10 + corpus fraction scanned) and a JSON
line for BASELINE.md. Owns its Ray session.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CLUSTER_SIZE = 16  # near-duplicate family size — the retrieval/dedup workload.
# (A first cut used 256 giant clusters: every query then has ~n/256 near-tied
# true neighbours, ADC cannot rank within a family of identical codes, and
# recall degenerates to rerank_r / cluster_size regardless of n_probe. Family
# size << rerank_r makes the sweep measure probing + quantization, not ties.)


def _hash_unit(ids: np.ndarray, dim: int) -> np.ndarray:
    """Deterministic pseudo-random [-1,1) noise per (id, j) — splitmix64-ish,
    block-boundary-invariant so any parallelism yields the same corpus."""
    x = ids[:, None].astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    x = x + (np.arange(dim, dtype=np.uint64) + np.uint64(1)) * np.uint64(
        0xBF58476D1CE4E5B9
    )
    x ^= x >> np.uint64(30)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return (x >> np.uint64(11)).astype(np.float64) / float(1 << 52) - 1.0


def make_corpus(n: int, dim: int, cluster_size: int = CLUSTER_SIZE):
    """n vectors in near-duplicate families of ``cluster_size``:
    centers[id % n_families] + 0.45·hash-noise."""
    import ray

    n_families = max(1, n // cluster_size)
    centers = np.random.default_rng(7).standard_normal((n_families, dim))

    def gen(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["id"].to_numpy()
        vecs = centers[ids % n_families] + 0.45 * _hash_unit(ids, dim)
        return pd.DataFrame(
            {"vec_id": ids.astype(np.int64), "embedding": vecs.tolist()}
        )

    return ray.data.range(n).map_batches(gen, batch_format="pandas")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument("--n-list", type=int, default=1024)
    ap.add_argument("--n-queries", type=int, default=50)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--n-codes", type=int, default=64)
    ap.add_argument("--cluster-size", type=int, default=CLUSTER_SIZE)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level="ERROR")
    from knowledgegraphs_ray.sim import pq as PQ
    from knowledgegraphs_ray.sim.ann import brute_force_topk
    from knowledgegraphs_ray.sim.ivf import train_centroids

    ds = make_corpus(args.n, args.dim, args.cluster_size).materialize()
    qids = list(range(args.n_queries))

    t0 = time.time()
    exact = brute_force_topk(ds, qids, k=args.k).to_pandas()
    t_exact = time.time() - t0
    truth = {
        q: set(exact[exact.query_id == q].neighbor_id.to_numpy()) for q in qids
    }

    t0 = time.time()
    cent = train_centroids(ds, n_list=args.n_list)
    books = PQ.train_pq(ds, m=args.m, k=args.n_codes)
    t_train = time.time() - t0

    rows = []
    for n_probe in (1, 8, 32, 128):
        for rr_mult in (None, 5, 10, 50):
            rerank_r = None if rr_mult is None else rr_mult * args.k
            t0 = time.time()
            got = PQ.ivf_pq_topk(
                ds, qids, k=args.k, n_list=args.n_list, n_probe=n_probe,
                m=args.m, n_codes=args.n_codes, rerank_r=rerank_r,
                cent=cent, books=books,
            ).to_pandas()
            dt = time.time() - t0
            rec = float(
                np.mean(
                    [
                        len(set(got[got.query_id == q].neighbor_id.to_numpy()) & truth[q])
                        / args.k
                        for q in qids
                    ]
                )
            )
            rows.append(
                {
                    "n_probe": n_probe,
                    "rerank_r": rerank_r or args.k,
                    "recall": round(rec, 4),
                    "scan_frac": round(n_probe / args.n_list, 4),
                    "sec": round(dt, 1),
                }
            )
            print(
                f"n_probe={n_probe:4d} rerank_r={rerank_r or args.k:5d} "
                f"recall@{args.k}={rec:.4f} scan={n_probe / args.n_list:.3f} "
                f"{dt:.1f}s",
                flush=True,
            )

    print(f"\n| n_probe | rerank_r | recall@{args.k} | corpus scanned | sec |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['n_probe']} | {r['rerank_r']} | {r['recall']} "
            f"| {r['scan_frac']:.1%} | {r['sec']} |"
        )
    best = [r for r in rows if r["recall"] >= 0.95]
    default = min(best, key=lambda r: (r["scan_frac"], r["rerank_r"])) if best else None
    print(
        json.dumps(
            {
                "metric": "ivf_pq_recall_grid",
                "n": args.n,
                "dim": args.dim,
                "n_list": args.n_list,
                "m": args.m,
                "n_codes": args.n_codes,
                "exact_sec": round(t_exact, 1),
                "train_sec": round(t_train, 1),
                "grid": rows,
                "default_config": default,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
