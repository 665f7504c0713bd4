"""Distributed-trained quality classifier (text.classifier).

Covers: frozen-weight reproducibility across parallelism levels (the
per-round quantization + deterministic tag-ordered partial merge), holdout
separation on the synthetic wiki-vs-noise corpus, exact DuckDB-oracle parity
of the map-only scoring pass, and edge cases (empty text)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from knowledgegraphs_ray.pipelines import catalog
from knowledgegraphs_ray.text import classifier as qc


def test_frozen_weights_reproduce_across_parallelism():
    # Same corpus, different block structure -> identical quantized weights:
    # the gradient merge is tag-ordered and weights are quantized per round,
    # so partitioning-dependent float dust never reaches the stored state.
    w8 = qc.train_quality_weights(n_blocks=8)
    w3 = qc.train_quality_weights(n_blocks=3)
    assert w8 == w3 == qc.W_MICRO


def test_holdout_separation():
    df = qc.synthetic_labeled_corpus(400, seed=99)  # unseen seed
    t = qc.score(pa.Table.from_pandas(df[["doc_id", "text"]]))
    pred = t["keep"].to_numpy(zero_copy_only=False).astype(int)
    acc = float((pred == df["label"].to_numpy()).mean())
    assert acc >= 0.95


def test_oracle_parity(sf_dir):
    out = (
        catalog.q_quality_classifier(sf_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    o = (
        con.execute(qc.oracle_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype({"doc_id": "int64", "score_micro": "int64", "keep": "bool"})
    )
    pd.testing.assert_frame_equal(
        out.astype({"doc_id": "int64", "score_micro": "int64", "keep": "bool"}), o
    )


def test_empty_and_plain_text_edges():
    t = pa.table({"doc_id": [1, 2], "text": ["", "the and of a to in is"]})
    out = qc.score(t)
    # empty text: both ratios 0, tok_f/chr_f 0 -> score == bias
    assert out["score_micro"][0].as_py() == qc.W_MICRO[0]
    assert bool(out["keep"][1].as_py())  # pure stopwords -> high quality side


def test_score_is_map_only_kernel():
    # the scoring pass keeps row count and passes doc_id through untouched
    df = qc.synthetic_labeled_corpus(50, seed=5)
    ds = ray.data.from_pandas(df[["doc_id", "text"]]).repartition(4)
    out = ds.map_batches(
        qc.score, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    assert len(out) == 50
    assert sorted(out["doc_id"]) == sorted(df["doc_id"])
