"""Kafka-stand-in topic log (sinks/topiclog.py): partition-actor
serialization gives monotone gap-free offsets, key-hash routing keeps a
key on one partition, segments roll and resume, and the Dataset
publish/read roundtrip preserves every record."""

import json

import pytest
import ray

from knowledgegraphs_ray.sinks.topiclog import (
    TopicLogProducer,
    _hash_key,
    publish_dataset,
    publish_pii_results,
    read_topic,
)


def test_offsets_monotone_and_key_routing(tmp_path):
    prod = TopicLogProducer(str(tmp_path), "t1", num_partitions=3)
    keys = [f"k{i % 5}" for i in range(40)]
    prod.send_batch([{"i": i} for i in range(40)], keys)
    assert prod.flush() == 40
    log = read_topic(str(tmp_path), "t1").to_pandas()
    assert len(log) == 40
    # per-partition offsets are 0..n-1 gap-free
    for p, g in log.groupby("partition"):
        assert sorted(g["offset"]) == list(range(len(g)))
    # same key always lands on the same (stable-hash) partition
    for k, g in log.groupby("key"):
        assert g["partition"].nunique() == 1
        assert g["partition"].iloc[0] == _hash_key(str(k), 3)


def test_per_key_order_preserved(tmp_path):
    prod = TopicLogProducer(str(tmp_path), "t2", num_partitions=2)
    for i in range(10):
        prod.send({"seq": i}, key="same")
    prod.flush()
    log = read_topic(str(tmp_path), "t2").to_pandas()
    seqs = [
        json.loads(v)["seq"]
        for v in log.sort_values("offset")["value"]
    ]
    assert seqs == list(range(10))


def test_segment_roll_and_resume(tmp_path):
    prod = TopicLogProducer(
        str(tmp_path), "t3", num_partitions=1, segment_bytes=200
    )
    prod.send_batch([f"msg-{i:03d}" for i in range(20)], [None] * 20)
    prod.flush()
    pdir = tmp_path / "t3" / "p0000"
    segs = sorted(pdir.iterdir())
    assert len(segs) > 1  # rolled
    assert segs[0].name == f"{0:020d}.jsonl"
    # a new producer resumes offsets after the existing log
    prod2 = TopicLogProducer(
        str(tmp_path), "t3", num_partitions=1, segment_bytes=200
    )
    prod2.send("more", key=None)
    prod2.flush()
    log = read_topic(str(tmp_path), "t3").to_pandas()
    assert sorted(log["offset"]) == list(range(21))


def test_publish_dataset_roundtrip(tmp_path):
    ds = ray.data.from_items(
        [{"doc_id": i, "pii": f"type{i % 3}"} for i in range(25)]
    )
    n = publish_dataset(
        ds, root=str(tmp_path), topic="pii_stream", key_col="pii",
        num_partitions=2,
    )
    assert n == 25
    log = read_topic(str(tmp_path), "pii_stream").to_pandas()
    assert len(log) == 25
    payloads = [json.loads(v) for v in log["value"]]
    assert sorted(p["doc_id"] for p in payloads) == list(range(25))


def test_publish_pii_results_template(tmp_path):
    results = [
        {"dataset": "customer", "fields": ["c_name"], "dpv": ["dpv:Name"]},
        {"dataset": "orders", "fields": [], "dpv": []},
    ]
    assert publish_pii_results(results, root=str(tmp_path)) == 2
    log = read_topic(str(tmp_path), "pii").to_pandas()
    assert set(log["key"]) == {"customer", "orders"}
