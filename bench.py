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
    timed("clean_corpus", catalog.q_clean_corpus)
    timed("kg_pred_stats", catalog.q_kg_pred_stats)
    timed("asof_last_view", catalog.q_purchases_last_view)
    timed("paragraph_dedup", catalog.q_paragraph_dedup)
    timed("bm25_topk", catalog.q_bm25_topk)
    timed("lm_perplexity", catalog.q_lm_perplexity)
    timed("dup_window_stats", catalog.q_dup_window_stats)
    timed("dsir_weights", catalog.q_dsir_weights)
    timed("semantic_dedup", catalog.q_semantic_dedup)
    timed("bpe_token_counts", catalog.q_bpe_token_counts)
    timed("c4_clean", catalog.q_c4_clean)
    timed("kg_pagerank", catalog.q_kg_pagerank)
    timed("kg_components", catalog.q_kg_components)
    timed("incremental_dedup", catalog.q_incremental_dedup)
    timed("mixture_budget", catalog.q_mixture_budget)
    timed("chunk_sequences", catalog.q_chunk_sequences)
    timed("quality_classifier", catalog.q_quality_classifier)
    timed("weighted_sample", catalog.q_weighted_sample)
    timed("corpus_diff", catalog.q_corpus_diff)
    timed("embedding_clusters", catalog.q_embedding_clusters)
    timed("lm_bigram_ppl", catalog.q_lm_bigram_ppl)
    timed("chat_pairs", catalog.q_chat_pairs)
    timed("mapping_selection", catalog.q_mapping_selection)
    timed("dsir_bigram_weights", catalog.q_dsir_bigram_weights)
    timed("curation_chain", catalog.q_curation_chain)
    timed("incremental_minhash", catalog.q_incremental_minhash)
    timed("temperature_sample", catalog.q_temperature_sample)
    timed("resolve_best_score", catalog.q_resolve_best_score)
    timed("pca_projection", catalog.q_pca_projection)
    timed("cluster_balanced_sample", catalog.q_cluster_balanced_sample)
    timed("corpus_overlap", catalog.q_corpus_overlap)
    timed("corpus_splits", catalog.q_corpus_splits)
    timed("score_percentiles", catalog.q_score_percentiles)
    timed("copurchase_triangles", catalog.q_copurchase_triangles)
    timed("copurchase_kcore", catalog.q_copurchase_kcore)
    timed("source_quota_cap", catalog.q_source_quota_cap)
    timed("leakage_safe_splits", catalog.q_leakage_safe_splits)
    timed("event_funnel", catalog.q_event_funnel)
    timed("token_cooccurrence", catalog.q_token_cooccurrence)
    timed("retention_cohorts", catalog.q_retention_cohorts)
    timed("hybrid_search", catalog.q_hybrid_search)
    timed("ngram_diversity", catalog.q_ngram_diversity)
    timed("rolling_events", catalog.q_rolling_events)
    timed("spend_outliers", catalog.q_spend_outliers)
    timed("tool_transitions", catalog.q_tool_transitions)
    timed("conv_stats", catalog.q_conv_stats)
    timed("conv_fingerprints", catalog.q_conv_fingerprints)
    timed("kg_bfs_depths", catalog.q_kg_bfs_depths)
    timed("link_prediction", catalog.q_link_prediction)
    timed("changelog_upsert", catalog.q_changelog_upsert)
    timed("copurchase_jaccard", catalog.q_copurchase_jaccard)
    timed("kg_ppr", catalog.q_kg_ppr)
    timed("kg_random_walks", catalog.q_kg_random_walks)
    timed("watermark_windows", catalog.q_watermark_windows)
    timed("watermark_sessions", catalog.q_watermark_sessions)
    timed("orders_rollup", catalog.q_orders_rollup)
    timed("dq_orders", catalog.q_dq_orders)
    timed("setjoin_pairs", catalog.q_setjoin_pairs)
    timed("pmi_collocations", catalog.q_pmi_collocations)
    timed("repeated_spans", catalog.q_repeated_spans)
    timed("snm_candidate_pairs", catalog.q_snm_candidate_pairs)
    timed("user_event_pivot", catalog.q_user_event_pivot)
    timed("er_canonical_ids", catalog.q_er_canonical_ids)

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


def run_scaling_workload(which: str) -> dict:
    """One scaling leg, executed in a fresh process at RAY_GRAFT_CPUS.

    Two workloads (see BASELINE.md for the rationale and caveats):

    * ``score`` (headline) — the entity-linking scoring stage: 1.6M unique
      mention/candidate pairs through the SurrogateCrossEncoder actor pool.
      This is the stand-in for the BERT cross-encoder that dominates the
      reference's runtime (BertMap.java:124 allots 64h per call) — pure
      CPU-bound model-stage work, the component whose scaling a bigger
      cluster actually buys.
    * ``map_path`` — the transcript flagship map path over Parquet shards
      (pruned read of the pre-materialized deterministic synthetic corpus ->
      fused text-analysis enrich -> dictionary-encoded triple kernel ->
      distributed count). The corpus is generated ONCE (untimed) so the leg
      measures the engine, not the generator.

    Each leg runs TWICE and the second (steady-state) run is the reported
    time, with the cold run kept as ``cold_sec``. Rationale (measured, see
    BASELINE.md): this sandbox VM faults fresh pages in at ~20 MB/s —
    50-100× slower than re-touching recycled pages — so a cold run mostly
    measures per-worker arena + object-store first-touch, which grows with
    worker count and masks the pipeline's actual scaling. A long-running
    cluster job (the 100 TB regime the rule targets) executes ~entirely in
    the warm regime the second run measures.
    """
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
    import numpy as np
    import pandas as pd
    import ray.data

    # spawn workers before timing (cluster warm state, not part of the job)
    ray.data.range(NUM_CPUS * 8).map_batches(lambda b: b, batch_format="pyarrow").count()

    if which == "score":
        from knowledgegraphs_ray.linking.index import AnnotationIndex
        from knowledgegraphs_ray.linking.scorer import score_candidates

        idx = AnnotationIndex.build(
            {f"kg:E{i}": [f"entity number {i} form {j}" for j in range(3)] for i in range(400)}
        )
        n_pairs = 1_600_000

        def make_pairs(batch: dict):
            # vectorized Arrow feeder — the scoring ACTORS are the measured
            # stage; a row-wise Python feeder on the one non-actor CPU would
            # starve the pool at high concurrency and measure itself instead
            import pyarrow as pa
            import pyarrow.compute as pc

            ids = batch["id"]
            ent = pa.array((ids % 400).astype(np.int64)).cast(pa.string())
            q = pa.array(ids.astype(np.int64)).cast(pa.string())
            cand = pa.array(((ids * 7) % 400).astype(np.int64)).cast(pa.string())
            return pa.table(
                {
                    "mention": pc.binary_join_element_wise(
                        "entity number ", ent, " q", q, ""
                    ),
                    "cand_iri": pc.binary_join_element_wise("kg:E", cand, ""),
                    "exact": pa.array(np.zeros(len(ids), dtype=bool)),
                }
            )

        def run_once() -> int:
            pairs = ray.data.range(
                n_pairs, override_num_blocks=max(NUM_CPUS * 8, 32)
            ).map_batches(make_pairs, batch_format="numpy")
            return score_candidates(
                pairs, idx, concurrency=max(NUM_CPUS - 1, 1), batch_size=8192
            ).count()
    else:
        from knowledgegraphs_ray.pipelines.transcripts import (
            extract_transcript_triples,
            synth_transcripts,
        )
        from knowledgegraphs_ray.text import analysis as ta

        # One-time (untimed) setup shared by both CPU legs: materialize the
        # deterministic synthetic corpus as partitioned Parquet. The flagship
        # consumes transcript Parquet shards (north_rule), so the timed path
        # below measures the ENGINE — pruned read -> enrich -> triple kernel
        # — not the synthetic generator.
        # Leg length matters: at 8 CPUs a 400k-turn corpus finishes in ~7s,
        # where fixed per-run costs (plan, schedule, count reduce) are a
        # 30-40% tax that caps measurable speedup regardless of kernel
        # scaling. 1.6M turns keeps the hi leg >20s so the measurement
        # reflects the kernel (the 100 TB regime), not session constants.
        n_turns = int(os.environ.get("GRAFT_SCALE_TURNS", "1600000"))
        shard_dir = f"/tmp/graft_scale_transcripts_{n_turns}"
        marker = os.path.join(shard_dir, "_DONE")
        if not os.path.exists(marker):
            import shutil

            shutil.rmtree(shard_dir, ignore_errors=True)
            synth_transcripts(n_turns, parallelism=64).write_parquet(shard_dir)
            with open(marker, "w") as f:
                f.write("ok")

        def enrich(b):
            return ta.enrich_stats(b, column="text")

        # Block count derived from ROW count so each fused task's OUTPUT
        # stays ~100-150 MB: the enrich+kernel task emits ~6 triples/turn,
        # and a 940k-turn block (the old fixed 32) built ~1 GB of strings
        # per task — 8 concurrent tasks of arena churn collapsed scaling to
        # ~0.6 while 120k-turn blocks measure 0.94 at 2->8 CPUs with a
        # faster absolute wall. Parquet count() is metadata-only (untimed).
        n_rows = ray.data.read_parquet(shard_dir).count()
        n_blocks = max(32, n_rows // 120_000)

        def run_once() -> int:
            ds = ray.data.read_parquet(shard_dir, override_num_blocks=n_blocks)
            return extract_transcript_triples(
                ds.map_batches(enrich, batch_format="pyarrow", batch_size=32768)
            ).count()

    result = {"workload": which, "num_cpus": NUM_CPUS}
    if which == "score":
        # single run: the actor-pool stage is compute-bound (page-fault
        # warm-up is negligible), and a back-to-back second run would race
        # the first pool's async teardown for CPU slots
        t0 = time.perf_counter()
        result["rows"] = run_once()
        result["sec"] = round(time.perf_counter() - t0, 2)
    else:
        t0 = time.perf_counter()
        rows = run_once()  # cold: pays this VM's ~20 MB/s fresh-page faults
        result["cold_sec"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        result["rows"] = run_once()  # steady state: warm arenas + object store
        result["sec"] = round(time.perf_counter() - t0, 2)

    ray.shutdown()
    return result


def run_probe_leg(kind: str) -> dict:
    """Single-box scaling ceiling probe (one leg, fresh process).

    * ``compute`` — cache-resident transcendental math per batch: no DRAM
      pressure, so efficiency ≈ 1 if the executor scales.
    * ``membw`` — large out-of-cache array copies per batch: pure DRAM
      traffic, bounded by the ONE memory bus all workers share on this box.

    The pair brackets the map_path workload: its efficiency sits between the
    two because triple/text kernels mix compute with allocation-heavy string
    traffic. On a real multi-node cluster every node brings its own memory
    bus, so the membw ceiling lifts with node count — which is exactly what
    the two-cluster-size rule measures.
    """
    import numpy as np
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
    import ray.data

    ray.data.range(NUM_CPUS * 4).map_batches(lambda b: b, batch_format="pyarrow").count()

    n_tasks = 64

    def compute_kernel(batch: dict) -> dict:
        x = np.arange(200_000, dtype=np.float64) * 1e-6  # ~1.6MB, cache-warm
        for _ in range(60):
            x = np.sin(x) * 1.0000001 + 0.1
        return {"s": np.array([float(x.sum())])}

    def membw_kernel(batch: dict) -> dict:
        x = np.empty(40_000_000, dtype=np.float64)  # 320MB >> LLC
        x[:] = 1.0
        y = x.copy()
        y += x
        return {"s": np.array([float(y[::1_000_000].sum())])}

    fn = compute_kernel if kind == "compute" else membw_kernel
    t0 = time.perf_counter()
    ray.data.range(n_tasks, override_num_blocks=n_tasks).map_batches(
        fn, batch_format="numpy"
    ).count()
    wall = time.perf_counter() - t0
    ray.shutdown()
    return {"workload": kind, "sec": round(wall, 2), "rows": n_tasks, "num_cpus": NUM_CPUS}


def run_scaling() -> dict:
    import subprocess

    lo_cpus = int(os.environ.get("GRAFT_SCALE_LO", "2"))
    hi_cpus = int(os.environ.get("GRAFT_SCALE_HI", "8"))

    def run(ncpu: int, which: str) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scaling-leg", which],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # This sandbox VM's effective capacity swings ~2x on minutes timescale
    # (measured: the identical score leg at 8 CPUs ranged 29.9-77.0 s across
    # 40 min — host noisy-neighbor, not code). External noise only ever ADDS
    # time, so each (workload, cpus) leg runs GRAFT_SCALE_ROUNDS times in
    # alternating lo/hi order and the per-leg MINIMUM is the estimator; all
    # raw times are reported so the spread stays auditable.
    rounds = int(os.environ.get("GRAFT_SCALE_ROUNDS", "2"))
    result: dict = {
        "metric": "scaling_efficiency",
        "unit": "ratio",
        "num_cpus": [lo_cpus, hi_cpus],
        "rounds": rounds,
        "workloads": {},
    }
    for which in ("score", "map_path"):
        lo_runs, hi_runs = [], []
        rows = None
        for _ in range(rounds):
            lo, hi = run(lo_cpus, which), run(hi_cpus, which)
            lo_runs.append(lo["sec"])
            hi_runs.append(hi["sec"])
            rows = lo["rows"]
        lo_sec, hi_sec = min(lo_runs), min(hi_runs)
        eff = (lo_sec / hi_sec) / (hi_cpus / lo_cpus)
        result["workloads"][which] = {
            f"sec_{lo_cpus}": lo_sec,
            f"sec_{hi_cpus}": hi_sec,
            f"runs_{lo_cpus}": lo_runs,
            f"runs_{hi_cpus}": hi_runs,
            f"rows_per_sec_{lo_cpus}": round(rows / lo_sec, 1),
            f"rows_per_sec_{hi_cpus}": round(rows / hi_sec, 1),
            "efficiency": round(eff, 3),
        }
    result["value"] = result["workloads"]["score"]["efficiency"]
    return result


def run_probe() -> dict:
    import subprocess

    lo_cpus = int(os.environ.get("GRAFT_SCALE_LO", "2"))
    hi_cpus = int(os.environ.get("GRAFT_SCALE_HI", "8"))

    def run(ncpu: int, which: str) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--probe-leg", which],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    result: dict = {
        "metric": "single_box_ceiling_probe",
        "unit": "ratio",
        "num_cpus": [lo_cpus, hi_cpus],
        "workloads": {},
    }
    for which in ("compute", "membw"):
        lo, hi = run(lo_cpus, which), run(hi_cpus, which)
        eff = (lo["sec"] / hi["sec"]) / (hi_cpus / lo_cpus)
        result["workloads"][which] = {
            f"sec_{lo_cpus}": lo["sec"],
            f"sec_{hi_cpus}": hi["sec"],
            "efficiency": round(eff, 3),
        }
    return result


if __name__ == "__main__":
    if "--scaling-leg" in sys.argv:
        which = sys.argv[sys.argv.index("--scaling-leg") + 1]
        print(json.dumps(run_scaling_workload(which)))
    elif "--probe-leg" in sys.argv:
        which = sys.argv[sys.argv.index("--probe-leg") + 1]
        print(json.dumps(run_probe_leg(which)))
    elif "--probe" in sys.argv:
        print(json.dumps(run_probe()))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
