"""Streaming corpus-ingest job — shards arrive one at a time and each is
deduplicated against EVERYTHING accepted so far before it lands:

    exact   (dedup/incremental.novel_rows: Bloom prefilter + hash-prefiltered
             verify join — history text read map-only, never shuffled)
    intra   (dedup/exact.dedup_exact within the surviving shard rows)
    fuzzy   (dedup/incremental_minhash.probe_minhash_index against the
             PERSISTED band+signature index — history text never re-read)

Accepted rows append to ``root/accepted/shard=<i>/``; their MinHash
band/signature blocks append to the persisted index directories (Parquet
dirs union on read, verified), so the next shard's probe covers them with
no recompute. A ``manifest.json`` records finished shards — rerunning the
job skips them (resume = the processed-file-cache gate of
``FilesToTurtle.java`` lifted to the streaming-dedup setting; see also
``state/checkpoint.py``).

    ray job submit --working-dir . -- python jobs/ingest_job.py \\
        --root /data/ingest_run --shards 8

Locally it shards ``$GRAFT_SF_DIR/documents.parquet`` by ``doc_id % N``
to simulate arrival order. The script OWNS its Ray session (guarded
init); the library never calls ray.init.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_manifest(root: str) -> dict:
    p = os.path.join(root, "manifest.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"done_shards": [], "accepted_rows": 0}


def _save_manifest(root: str, m: dict) -> None:
    tmp = os.path.join(root, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(m, f)
    os.replace(tmp, os.path.join(root, "manifest.json"))


def ingest_shard(
    shard,
    root: str,
    shard_id: int,
    *,
    threshold: float,
    have_history: bool,
) -> dict:
    """One arrival step. -> counters dict."""
    import ray.data

    from knowledgegraphs_ray.dedup.exact import dedup_exact
    from knowledgegraphs_ray.dedup.incremental import novel_rows
    from knowledgegraphs_ray.dedup.incremental_minhash import (
        build_minhash_index,
        load_minhash_index,
        probe_minhash_index,
        save_minhash_index,
    )

    n_in = shard.count()
    accepted_dir = os.path.join(root, "accepted")
    index_dir = os.path.join(root, "minhash_index")

    # exact cross-history: drop rows whose text was accepted in ANY prior
    # shard (history read map-only into a Bloom fold)
    if have_history:
        seen = ray.data.read_parquet(accepted_dir, columns=["text"])
        shard = novel_rows(shard, seen, column="text")
    # intra-shard exact dedup (novel_rows intentionally keeps in-shard
    # copies; keep min doc_id per distinct text, restore original columns)
    shard = dedup_exact(
        shard.select_columns(["doc_id", "text"]), column="text", id_column="doc_id"
    ).drop_columns(["n_copies"])
    shard = shard.materialize()
    n_exact = shard.count()

    # fuzzy cross-history: drop near-duplicates of anything indexed so far
    n_neardup = 0
    if have_history and n_exact:
        index = load_minhash_index(index_dir)
        hits = probe_minhash_index(index, shard, threshold=threshold)
        dup_ids = hits.to_pandas()["new_doc"].unique()
        n_neardup = len(dup_ids)
        if n_neardup:
            import numpy as np
            import pyarrow as pa
            import pyarrow.compute as pc

            drop = pa.array(np.sort(dup_ids).astype("int64"))

            def keep(t: pa.Table) -> pa.Table:
                return t.filter(
                    pc.invert(pc.is_in(t["doc_id"], value_set=drop))
                )

            shard = shard.map_batches(keep, batch_format="pyarrow").materialize()

    n_out = shard.count()
    if n_out:
        shard.write_parquet(os.path.join(accepted_dir, f"shard={shard_id}"))
        # index the survivors: their band/sig blocks APPEND to the
        # persisted dirs (Parquet dirs union on read)
        save_minhash_index(build_minhash_index(shard), index_dir)
    return {
        "rows_in": n_in,
        "exact_dropped": n_in - n_exact,
        "neardup_dropped": n_neardup,
        "accepted": n_out,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dir", default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.001")
    )
    ap.add_argument("--root", default="/tmp/ingest_job")
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--threshold", type=float, default=0.7)
    ap.add_argument(
        "--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    )
    args = ap.parse_args()

    import ray
    import ray.data

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

    os.makedirs(args.root, exist_ok=True)
    manifest = _load_manifest(args.root)
    docs = ray.data.read_parquet(
        os.path.join(args.sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    stages: dict[str, dict] = {}
    for i in range(args.shards):
        if i in manifest["done_shards"]:
            stages[f"shard_{i}"] = {"resumed": True}
            continue
        n = args.shards

        def pick(df, _i=i, _n=n):
            return df[df["doc_id"] % _n == _i]

        t0 = time.time()
        counters = ingest_shard(
            docs.map_batches(pick, batch_format="pandas"),
            args.root,
            i,
            threshold=args.threshold,
            have_history=bool(manifest["done_shards"]),
        )
        counters["wall_sec"] = round(time.time() - t0, 3)
        counters["resumed"] = False
        stages[f"shard_{i}"] = counters
        manifest["done_shards"].append(i)
        manifest["accepted_rows"] += counters["accepted"]
        _save_manifest(args.root, manifest)

    print(json.dumps({"root": args.root, "shards": stages,
                      "accepted_total": manifest["accepted_rows"]}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
