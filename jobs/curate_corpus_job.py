"""Corpus-curation cluster job — ``ray job submit`` entry for the composed
LLM-training-data pipeline (filter -> exact dedup -> near-dup resolve ->
mixture sample -> pack), checkpointed + resumable per stage:

    ray job submit --working-dir . -- python jobs/curate_corpus_job.py \\
        --input s3://bucket/documents/ --root s3://bucket/curate_run/

Locally it reads ``$GRAFT_SF_DIR/documents.parquet``. The script OWNS its
Ray session (guarded init); the library never calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _mod10_filter(t):
    import pyarrow as pa

    return t.filter(pa.array(t["doc_id"].to_numpy() % 10 == 0))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="documents Parquet dir (doc_id, text, lang, ...)")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.001")
    )
    ap.add_argument("--root", default="/tmp/curate_job")
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--langs", default="", help="comma list; empty = all")
    ap.add_argument("--min-tokens", type=int, default=20)
    ap.add_argument("--rate", action="append", default=[],
                    help="lang=rate mixture weight (repeatable)")
    ap.add_argument("--default-rate", type=float, default=1.0)
    ap.add_argument("--pack-budget", type=int, default=2048)
    ap.add_argument("--gopher", action="store_true",
                    help="insert the Gopher quality-rule filter stage")
    ap.add_argument("--benchmark", default=None,
                    help="eval-set Parquet (doc_id, text); inserts n-gram decontamination")
    ap.add_argument("--decontam-n", type=int, default=8)
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic documents instead of reading input")
    ap.add_argument("--span-dedup-w", type=int, default=None,
                    help="cut corpus-duplicated w-token spans first")
    ap.add_argument("--ppl-quantile", type=float, default=None,
                    help="keep the q least-perplexed fraction (CCNet head)")
    ap.add_argument("--dsir-top-k", type=int, default=None,
                    help="keep top-k most target-like survivors "
                         "(target = doc_id %% 10 == 0)")
    ap.add_argument("--classifier-min-micro", type=int, default=None,
                    help="model-quality gate: keep docs with trained-classifier "
                         "score_micro >= this (0 = keep-side of the decision "
                         "boundary)")
    ap.add_argument("--weighted-k", type=int, default=None,
                    help="final size cap: length-weighted sample without "
                         "replacement down to k docs")
    ap.add_argument("--embeddings", default=None,
                    help="(doc_id, embedding) Parquet: enable SemDeDup")
    ap.add_argument("--semantic-threshold", type=float, default=0.95)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data

    from knowledgegraphs_ray.pipelines.curation import curate_run

    if args.synthetic:
        from knowledgegraphs_ray.pipelines.curation import synth_documents

        ingest = lambda: synth_documents(
            args.synthetic, parallelism=max(args.num_cpus * 4, 64)
        )
    else:
        src = args.input or os.path.join(args.sf_dir, "documents.parquet")
        ingest = lambda: ray.data.read_parquet(
            src, columns=["doc_id", "text", "lang", "source"]
        )
    rates = dict(
        (k, float(v)) for k, v in (r.split("=", 1) for r in args.rate)
    )
    benchmark = None
    if args.benchmark:
        benchmark = lambda: ray.data.read_parquet(
            args.benchmark, columns=["doc_id", "text"]
        )
    p = curate_run(
        args.root,
        ingest,
        langs=[s for s in args.langs.split(",") if s] or None,
        min_tokens=args.min_tokens,
        rates=rates,
        default_rate=args.default_rate,
        pack_budget=args.pack_budget,
        gopher_rules=args.gopher,
        benchmark=benchmark,
        decontam_n=args.decontam_n,
        span_dedup_w=args.span_dedup_w,
        ppl_keep_quantile=args.ppl_quantile,
        semantic_threshold=(
            args.semantic_threshold if args.embeddings else None
        ),
        embeddings=(
            (lambda: ray.data.read_parquet(
                args.embeddings, columns=["doc_id", "embedding"]
            ))
            if args.embeddings
            else None
        ),
        classifier_min_micro=args.classifier_min_micro,
        weighted_k=args.weighted_k,
        dsir_top_k=args.dsir_top_k,
        dsir_target=(
            (lambda: ingest().map_batches(
                _mod10_filter, batch_format="pyarrow", zero_copy_batch=True
            ))
            if args.dsir_top_k
            else None
        ),
    )
    metrics = p.metrics()
    with open(os.path.join(args.root, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    print(json.dumps(metrics))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
