"""Stage checkpointing, resume, and per-partition lineage manifests.

Reference analogues: processed-file caches (TabularFilesReader.java:64-81),
raw_mappings.json save-every-100 resume (mapping_prediction.py:463-493), and
load-or-construct (pipeline.py:175-188). Ray-Data-first redesign:

* a pipeline is a DAG of named stages; each stage writes partitioned Parquet
  under ``<root>/<stage>/`` followed by an atomic ``_SUCCESS`` manifest —
  a rerun skips any stage whose manifest exists and validates;
* the manifest carries per-partition lineage + metrics (north_rule): row
  count, file list, kernel version, wall time;
* deterministic kernels (content-derived IRIs) make re-execution after a
  partial failure produce byte-identical outputs, so skip-if-done is safe.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

import ray.data

MANIFEST = "_SUCCESS"


@dataclass
class StageResult:
    name: str
    path: str
    rows: int
    wall_sec: float
    resumed: bool


def _manifest_path(stage_dir: str) -> str:
    return os.path.join(stage_dir, MANIFEST)


def is_complete(stage_dir: str) -> bool:
    return os.path.exists(_manifest_path(stage_dir))


def read_manifest(stage_dir: str) -> dict:
    with open(_manifest_path(stage_dir)) as f:
        return json.load(f)


def checkpoint_stage(
    root: str,
    name: str,
    build: "callable[[], ray.data.Dataset]",
    *,
    kernel_version: str = "1",
    min_rows_per_file: int | None = None,
) -> StageResult:
    """Run (or skip) one stage: ``build()`` -> write_parquet -> manifest.

    Output is written to a temp dir then renamed (atomic publish), so a
    killed run never leaves a half-written stage that looks complete.
    """
    stage_dir = os.path.join(root, name)
    if is_complete(stage_dir):
        m = read_manifest(stage_dir)
        if m.get("kernel_version") == kernel_version:
            return StageResult(name, stage_dir, m["rows"], 0.0, resumed=True)

    t0 = time.perf_counter()
    tmp_dir = stage_dir + ".tmp"
    if os.path.exists(tmp_dir):
        import shutil

        shutil.rmtree(tmp_dir)
    ds = build()
    kw = {}
    if min_rows_per_file is not None:
        kw["min_rows_per_file"] = min_rows_per_file
    os.makedirs(tmp_dir, exist_ok=True)  # empty datasets may write no files
    ds.write_parquet(tmp_dir, **kw)
    files = sorted(
        f for f in os.listdir(tmp_dir) if f.endswith(".parquet")
    )
    rows = ray.data.read_parquet(tmp_dir).count() if files else 0
    wall = time.perf_counter() - t0

    if os.path.exists(stage_dir):
        import shutil

        shutil.rmtree(stage_dir)
    os.replace(tmp_dir, stage_dir)
    manifest = {
        "stage": name,
        "rows": rows,
        "wall_sec": round(wall, 3),
        "kernel_version": kernel_version,
        "partitions": [
            {"file": f, "bytes": os.path.getsize(os.path.join(stage_dir, f))}
            for f in files
        ],
        "written_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    tmp_manifest = _manifest_path(stage_dir) + ".tmp"
    with open(tmp_manifest, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp_manifest, _manifest_path(stage_dir))
    return StageResult(name, stage_dir, rows, wall, resumed=False)


def load_stage(stage_dir: str, columns: list[str] | None = None) -> ray.data.Dataset:
    has_files = any(f.endswith(".parquet") for f in os.listdir(stage_dir))
    if not has_files:  # empty stage output
        return ray.data.from_items([])
    return ray.data.read_parquet(stage_dir, columns=columns)


class CheckpointedPipeline:
    """Linear chain of checkpointed stages sharing one root directory.

    >>> p = CheckpointedPipeline("/tmp/kg_run")
    >>> p.stage("triples", lambda: extract_kg(sf))     # runs or resumes
    >>> p.stage("dedup", lambda: dedup(p.dataset("triples")))
    >>> p.results  # [StageResult...], includes which stages were resumed
    """

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.results: list[StageResult] = []

    def stage(self, name: str, build, **kw) -> StageResult:
        res = checkpoint_stage(self.root, name, build, **kw)
        self.results.append(res)
        return res

    def dataset(self, name: str, columns: list[str] | None = None) -> ray.data.Dataset:
        return load_stage(os.path.join(self.root, name), columns)

    def metrics(self) -> dict:
        return {
            r.name: {"rows": r.rows, "wall_sec": round(r.wall_sec, 3), "resumed": r.resumed}
            for r in self.results
        }
