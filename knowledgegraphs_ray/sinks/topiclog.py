"""Kafka-producer stand-in (S11): a durable, partitioned, append-only
topic log with producer semantics — key-hash partitioning, per-partition
monotone offsets, at-least-once delivery with bounded retry — backed by
the local/shared filesystem instead of a broker.

Reference parity (`A_Coordinator/Kafka/KafkaProducerService.java:28-56`,
`KafkaTopicConfig.java`): the reference publishes PII-result JSON
messages to one topic, retrying a failed send up to 3 times. Mechanism
re-expressed without a broker (none exists in this environment; the
public Kafka wire protocol needs one): each partition is owned by ONE
Ray actor that serializes appends — exactly the broker's role for a
partition — so offsets are monotone and records are never interleaved
mid-line. Producers (Ray Data workers) route record batches to partition
actors by key hash, matching Kafka's default partitioner contract
(same key -> same partition -> ordered).

Scale shape: routing is map-only (hash on an 8-byte key), the actor pool
is the only serialization point and scales with ``num_partitions``
(Kafka's own scaling knob), and segment files roll at
``segment_bytes`` so a partition is many bounded files, not one giant
append target — the same layout Kafka uses on disk. ``read_topic``
re-exposes the log as a Dataset (one read task per segment).
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _hash_key(key: str, num_partitions: int) -> int:
    """Deterministic, process-stable partitioner (Kafka contract: same
    key -> same partition). Python's hash() is salted per process; use
    a stable digest instead."""
    import hashlib

    h = int.from_bytes(hashlib.md5(key.encode()).digest()[:8], "big")
    return h % num_partitions


@ray.remote(num_cpus=0.25)
class _PartitionWriter:
    """Owns one partition directory; the single writer = broker role."""

    def __init__(self, root: str, topic: str, partition: int, segment_bytes: int):
        self.dir = os.path.join(root, topic, f"p{partition:04d}")
        os.makedirs(self.dir, exist_ok=True)
        self.segment_bytes = segment_bytes
        # resume: next offset = sum of records in existing segments
        self.offset = 0
        self._seg_size = 0
        self._seg_base = 0
        for seg in sorted(os.listdir(self.dir)):
            path = os.path.join(self.dir, seg)
            with open(path, "rb") as f:
                n = sum(1 for _ in f)
            self.offset += n
        self._seg_base = self.offset
        self._fh = None

    def _file(self):
        if self._fh is None or self._seg_size >= self.segment_bytes:
            if self._fh is not None:
                self._fh.close()
            self._seg_base = self.offset
            path = os.path.join(self.dir, f"{self._seg_base:020d}.jsonl")
            self._fh = open(path, "a", encoding="utf-8")
            self._seg_size = 0
        return self._fh

    def append(self, keys: list[str | None], values: list[str]) -> list[int]:
        """Batch append -> assigned offsets (monotone, gap-free)."""
        out = []
        f = self._file()
        for k, v in zip(keys, values):
            rec = json.dumps(
                {"offset": self.offset, "key": k, "value": v},
                separators=(",", ":"),
                sort_keys=True,
            )
            f = self._file()
            f.write(rec + "\n")
            self._seg_size += len(rec) + 1
            out.append(self.offset)
            self.offset += 1
        f.flush()
        return out

    def next_offset(self) -> int:
        return self.offset


class TopicLogProducer:
    """Producer facade: send() / send_batch() with the reference's ≤3
    retry attempts; flush() waits for outstanding appends."""

    def __init__(
        self,
        root: str,
        topic: str,
        *,
        num_partitions: int = 4,
        segment_bytes: int = 64 * 1024 * 1024,
        max_attempts: int = 3,
    ):
        self.topic = topic
        self.num_partitions = num_partitions
        self.max_attempts = max_attempts
        self._writers = [
            _PartitionWriter.remote(root, topic, p, segment_bytes)
            for p in range(num_partitions)
        ]
        self._pending: list[ray.ObjectRef] = []

    def _partition(self, key: str | None, rr: int) -> int:
        if key is not None:
            return _hash_key(key, self.num_partitions)
        return rr % self.num_partitions  # keyless: round-robin

    def send(self, value, key: str | None = None) -> ray.ObjectRef:
        return self.send_batch([value], [key])

    def send_batch(self, values: list, keys: list[str | None]) -> ray.ObjectRef:
        by_part: dict[int, tuple[list, list]] = {}
        for i, (v, k) in enumerate(zip(values, keys)):
            p = self._partition(k, i)
            ks, vs = by_part.setdefault(p, ([], []))
            ks.append(k)
            vs.append(v if isinstance(v, str) else json.dumps(v, sort_keys=True))
        refs = []
        for p, (ks, vs) in sorted(by_part.items()):
            refs.append(self._append_with_retry(p, ks, vs))
        self._pending.extend(refs)
        return refs[-1]

    def _append_with_retry(self, p: int, ks: list, vs: list) -> ray.ObjectRef:
        last: Exception | None = None
        for _ in range(self.max_attempts):
            try:
                return self._writers[p].append.remote(ks, vs)
            except Exception as e:  # actor died: Ray restarts on next call
                last = e
        raise RuntimeError(f"send failed after {self.max_attempts} attempts: {last}")

    def flush(self) -> int:
        """Wait for all outstanding appends; -> records acknowledged."""
        done = ray.get(self._pending)
        self._pending = []
        return sum(len(d) for d in done)


def publish_dataset(
    ds: ray.data.Dataset,
    *,
    root: str,
    topic: str,
    key_col: str | None = None,
    num_partitions: int = 4,
) -> int:
    """Publish every row (as one JSON message) to the topic log.
    -> records published.

    Rows route WORKER -> partition actor (the actor handles ship inside
    the map_batches UDF), so the driver never touches a message — it sums
    per-block acknowledgement counts. Per-key ordering holds within each
    block (one send per block per partition); blocks publish concurrently,
    which is exactly Kafka's multi-producer contract — strict global
    per-key order needs a single :class:`TopicLogProducer`."""
    producer = TopicLogProducer(root, topic, num_partitions=num_partitions)
    writers = producer._writers
    n_parts = producer.num_partitions

    def block(batch: pa.Table) -> pd.DataFrame:
        import numpy as np

        n = batch.num_rows
        if n == 0:
            return pd.DataFrame({"acked": [0]})
        # ONE Arrow->Python traversal for the whole block (the encoding is
        # inherently per-record — it IS the wire format — but everything
        # around it is batched: no per-row dict churn, no append loop)
        recs = batch.to_pylist()
        values = [json.dumps(r, sort_keys=True, default=str) for r in recs]
        if key_col:
            keys = [str(r[key_col]) for r in recs]
            parts = np.fromiter(
                (_hash_key(k, n_parts) for k in keys), dtype=np.int64, count=n
            )
        else:
            keys = None
            parts = np.arange(n, dtype=np.int64) % n_parts
        # group rows by partition with one stable argsort + searchsorted —
        # preserves within-partition input order (the per-key order contract)
        order = np.argsort(parts, kind="stable")
        bounds = np.searchsorted(parts[order], np.arange(n_parts + 1))
        pending = []
        for p in range(n_parts):
            lo, hi = int(bounds[p]), int(bounds[p + 1])
            if lo == hi:
                continue
            idx = order[lo:hi]
            ks = [keys[i] for i in idx] if keys is not None else [None] * (hi - lo)
            pending.append(writers[p].append.remote(ks, [values[i] for i in idx]))
        acked = sum(len(x) for x in ray.get(pending))  # parallel acks
        return pd.DataFrame({"acked": [acked]})

    acct = ds.map_batches(
        block, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    return int(acct["acked"].sum())


def read_topic(root: str, topic: str) -> ray.data.Dataset:
    """Re-expose a topic log as a Dataset (partition, offset, key, value)
    — one read task per segment file."""
    base = os.path.join(root, topic)
    paths = []
    for p in sorted(os.listdir(base)):
        pdir = os.path.join(base, p)
        paths.extend(os.path.join(pdir, s) for s in sorted(os.listdir(pdir)))
    if not paths:
        return ray.data.from_pandas(
            pd.DataFrame(
                {
                    "partition": pd.Series(dtype="int64"),
                    "offset": pd.Series(dtype="int64"),
                    "key": pd.Series(dtype="object"),
                    "value": pd.Series(dtype="object"),
                }
            )
        )
    files = ray.data.read_binary_files(paths, include_paths=True)

    def block(batch: pd.DataFrame) -> pd.DataFrame:
        rows = {"partition": [], "offset": [], "key": [], "value": []}
        for path, raw in zip(batch["path"], batch["bytes"]):
            part = int(os.path.basename(os.path.dirname(path))[1:])
            for line in bytes(raw).decode("utf-8").splitlines():
                rec = json.loads(line)
                rows["partition"].append(part)
                rows["offset"].append(int(rec["offset"]))
                rows["key"].append(rec["key"])
                rows["value"].append(rec["value"])
        return pd.DataFrame(rows)

    return files.map_batches(block, batch_format="pandas")


def publish_pii_results(results: list[dict], *, root: str, topic: str = "pii") -> int:
    """`KafkaProducerService.sendMessage(PIIresultsTemplate)` twin: each
    PII result object is one JSON message keyed by its dataset name."""
    producer = TopicLogProducer(root, topic, num_partitions=1)
    producer.send_batch(
        results, [str(r.get("dataset", "")) or None for r in results]
    )
    return producer.flush()
