"""Cluster job entry point — the ``ray job submit`` shape the north_rule
names. On a real cluster:

    ray job submit --working-dir . -- python jobs/flagship_job.py \\
        --input s3://bucket/transcripts/ --root s3://bucket/kg_run/ [--resume]

In this sandbox it runs the same pipeline locally (ray.init local). The
script OWNS its Ray session (guarded init), unlike the library / driver
contract which never calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="transcript Parquet dir (conv_id, turn_idx, role, text, tool, ts)")
    ap.add_argument("--sf-dir", default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.001"),
                    help="testdata dir for the events-derived transcript fallback")
    ap.add_argument("--root", default="/tmp/kg_job", help="checkpoint/output root")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic conversations instead of reading input")
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--no-nt", action="store_true", help="skip the N-Triples sink")
    ap.add_argument("--graphdb", help="RDF4J/GraphDB endpoint to upload edges to")
    ap.add_argument("--graphdb-repo", default="kg", help="repository id")
    ap.add_argument("--publish-pii-root",
                    help="topic-log root: publish schema PII results there")
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

    from knowledgegraphs_ray.pipelines.flagship import flagship_run
    from knowledgegraphs_ray.pipelines.transcripts import synth_transcripts

    if args.synthetic:
        ingest = lambda: synth_transcripts(args.synthetic, parallelism=max(args.num_cpus * 4, 64))
        p = flagship_run(args.root, ingest=ingest, write_nt=not args.no_nt)
    elif args.input:
        import ray.data

        ingest = lambda: ray.data.read_parquet(args.input)
        p = flagship_run(args.root, ingest=ingest, write_nt=not args.no_nt)
    else:
        p = flagship_run(args.root, args.sf_dir, write_nt=not args.no_nt)

    tail = {}
    if args.graphdb or args.publish_pii_root:
        # the reference Pipeline's epilogue: GraphDB upload + PII publish
        from knowledgegraphs_ray.pipelines.service_tail import (
            run_service_tail,
            schema_pii_results,
        )

        tail = run_service_tail(
            p.dataset("edges") if args.graphdb else None,
            graphdb_endpoint=args.graphdb,
            graphdb_repo=args.graphdb_repo,
            pii_results=(
                schema_pii_results(args.sf_dir)
                if args.publish_pii_root
                else None
            ),
            topic_root=args.publish_pii_root,
        )

    print(json.dumps({"root": args.root, "stages": p.metrics(), "tail": tail}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
