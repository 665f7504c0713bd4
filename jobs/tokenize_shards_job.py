"""Training-data delivery job: tokenize -> chunk -> shard.

The last mile of the curation story: take a (curated) documents table,
train a BPE tokenizer on it (distributed word counts, driver merge loop),
encode every document to dense token ids, expand into fixed-window training
sequences, and deliver partitioned Parquet shards with per-stage _SUCCESS
manifests — a failed run resumes past finished stages, and the output is
one file per block (never one giant file).

    python jobs/tokenize_shards_job.py --root /tmp/tok_job --synthetic 20000
    python jobs/tokenize_shards_job.py --root /tmp/tok_job \
        --input /root/testdata/sf0.01/documents.parquet
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default=None, help="documents Parquet path")
    ap.add_argument("--sf-dir", default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    ap.add_argument("--root", default="/tmp/tokenize_job")
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--num-merges", type=int, default=200)
    ap.add_argument("--chunk-size", type=int, default=128)
    ap.add_argument("--stride", type=int, default=96)
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic docs instead of reading input")
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

    from knowledgegraphs_ray.state.checkpoint import CheckpointedPipeline
    from knowledgegraphs_ray.text.bpe import (
        build_vocab,
        chunk_token_ids,
        encode_token_ids,
        train_bpe,
        word_counts,
    )

    if args.synthetic:
        from knowledgegraphs_ray.pipelines.curation import synth_documents

        ingest = lambda: synth_documents(
            args.synthetic, parallelism=max(args.num_cpus * 4, 64)
        )
    else:
        src = args.input or os.path.join(args.sf_dir, "documents.parquet")
        ingest = lambda: ray.data.read_parquet(src, columns=["doc_id", "text"])

    # tokenizer artifacts are driver-side state derived from one distributed
    # counting pass; persist them next to the stage manifests so a resume
    # reuses the exact vocabulary
    os.makedirs(args.root, exist_ok=True)
    tok_path = os.path.join(args.root, "tokenizer.json")
    # the artifact records the params it was trained with; a resume with
    # DIFFERENT params must not silently encode with the stale vocabulary
    params = {
        "num_merges": args.num_merges,
        "input": args.input or ("synthetic:%d" % args.synthetic if args.synthetic
                                else os.path.join(args.sf_dir, "documents.parquet")),
    }
    art = None
    if os.path.exists(tok_path):
        with open(tok_path) as f:
            art = json.load(f)
        if art.get("params") != params:
            raise SystemExit(
                f"{tok_path} was trained with params {art.get('params')} but this "
                f"invocation asks for {params}; delete the artifact (or use a "
                "fresh --root) to retrain"
            )
    if art is not None:
        from knowledgegraphs_ray.text.bpe import BPETokenizer

        tok = BPETokenizer(merges=[tuple(m) for m in art["merges"]])
        vocab = art["vocab"]
    else:
        counts = word_counts(ingest())
        tok = train_bpe(counts, num_merges=args.num_merges)
        vocab = build_vocab(tok, counts)
        with open(tok_path, "w") as f:
            json.dump({"merges": tok.merges, "vocab": vocab, "params": params}, f)

    p = CheckpointedPipeline(args.root)
    p.stage("token_ids", lambda: encode_token_ids(ingest(), tok, vocab))
    p.stage(
        "sequences",
        lambda: chunk_token_ids(
            p.dataset("token_ids"),
            chunk_size=args.chunk_size,
            stride=args.stride,
        ),
    )
    metrics = p.metrics()
    metrics["vocab_size"] = len(vocab)
    metrics["num_merges"] = len(tok.merges)
    with open(os.path.join(args.root, "metrics.json"), "w") as f:
        json.dump(metrics, f)
    print(json.dumps(metrics))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
