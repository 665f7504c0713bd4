"""Benchmark harness — runs the headline pipelines over $GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line.

Usage:
    python bench.py              # timed run at RAY_GRAFT_CPUS (default 32)
    python bench.py --scaling    # same pipeline at 8 and 32 CPUs in fresh
                                 # processes; prints throughput + efficiency
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _consume(ds) -> int:
    """Consume a Dataset without driver materialization."""
    import ray.data

    if isinstance(ds, ray.data.Dataset):
        n = 0
        for b in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
            n += b.num_rows
        return n
    return len(ds)


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from knowledgegraphs_ray.pipelines import catalog

    # warm the page cache (untimed) so we measure compute + shuffle
    _consume(catalog.q_kg_triples_customer(SF_DIR))

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    def timed(name: str, fn):
        t0 = time.perf_counter()
        counts[name] = _consume(fn(SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)

    timed("kg_star", catalog.q_kg_triples_star)
    timed("kg_transcripts", catalog.q_kg_transcripts)
    timed("dedup_exact", catalog.q_dedup_exact_documents)
    timed("text_quality", catalog.q_text_quality)
    timed("ann_topk", catalog.q_ann_topk)
    timed("fingerprints", catalog.q_doc_fingerprints)
    timed("minhash_pairs", catalog.q_minhash_dedup_pairs)
    timed("sessionize", catalog.q_events_sessionize)
    timed("link_scored", catalog.q_link_scored_documents)
    timed("json_triples", catalog.q_json_triples_events)
    timed("pii_scan", catalog.q_pii_scan_documents)

    total = round(sum(timings.values()), 3)
    n_turns = counts.get("kg_transcripts", 0)
    result = {
        "metric": "kg_pipeline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "rows": counts,
        "turns_per_sec": round(n_turns / max(timings.get("kg_transcripts", 1e-9), 1e-9), 1),
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    import subprocess

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo_cpus, hi_cpus = 8, 32
    lo, hi = run(lo_cpus), run(hi_cpus)
    thr_lo = sum(lo["rows"].values()) / lo["value"]
    thr_hi = sum(hi["rows"].values()) / hi["value"]
    eff = (lo["value"] / hi["value"]) / (hi_cpus / lo_cpus)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8": lo["value"],
        "sec_32": hi["value"],
        "rows_per_sec_8": round(thr_lo, 1),
        "rows_per_sec_32": round(thr_hi, 1),
        "queries_8": lo["queries"],
        "queries_32": hi["queries"],
        "sf": SF_DIR,
        "num_cpus": [lo_cpus, hi_cpus],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
