"""Trainable quality classifier — fasttext-style linear model over exact,
SQL-expressible text features, trained with DISTRIBUTED full-batch logistic
regression (per-block gradient partials, the same broadcast-weights /
bounded-driver-merge shape as ``sim.ivf.train_centroids_distributed``).

This is the "model-based quality filter" stage of a large-scale
training-data pipeline (GPT-3 / LLaMA-style wiki-vs-crawl classifiers): the
reference's scoring stages (BertSim.py:60-104) hold a learned model in an
actor and score batches; here the MODEL TRAINING itself is a Ray Data
pipeline:

* featurize — one ``map_batches`` pass (pure pyarrow.compute, RE2) emitting
  a fixed feature vector per document; every feature is mirrored exactly in
  the DuckDB oracle;
* train    — per round: broadcast weights (``ray.put``), every BLOCK emits
  one (gradient-sum, count, tag) partial, the driver merges the bounded
  partials (O(num_blocks), not O(rows)) in deterministic tag order and
  takes a gradient step. Weights are quantized to 1e-6 after each round so
  float summation noise (~1e-12 on these magnitudes) never reaches the
  stored weights — retraining at a different parallelism reproduces the
  frozen weights bit-for-bit;
* score    — map-only inference with the frozen weights; the linear score
  is computed with the exact association order the oracle SQL uses, so the
  fixed-point score hashes identically against DuckDB.

At 100 TB the training corpus is a (small, labeled) dataset while SCORING
is the corpus-sized pass — scoring is map-only and shuffle-free; training
traffic per round is num_blocks × (dim+2) doubles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from knowledgegraphs_ray.text.analysis import PUNCT_RE, STOP_RE, TOKEN_RE

# feature scaling constants (powers of two -> exact division on both sides)
TOK_SCALE = 256.0
CHR_SCALE = 4096.0
FEATURES = ("punct_ratio", "stop_ratio", "tok_f", "chr_f")
DIM = 1 + len(FEATURES)  # bias + features

# Frozen weights in integer MICRO units (w = W_MICRO / 1e6): the output of
# ``train_quality_weights()`` (seeded synthetic corpus, 30 rounds, lr=2.0,
# quantized per round). Stored as integers so the Ray kernel and the DuckDB
# oracle derive the SAME float64 literals (micro / 1000000.0).
# Reproduced bit-for-bit by tests/test_quality_classifier.py.
W_MICRO = (-141928, -2927503, 3185380, 823052, 247374)


def featurize(batch: pa.Table, *, column: str = "text") -> pa.Table:
    """Append the classifier features. Mirrors analysis.quality_stats for the
    two ratios; tok_f / chr_f are scaled raw counts."""
    text = batch[column].combine_chunks()
    n_tokens = pc.cast(pc.count_substring_regex(text, TOKEN_RE), pa.float64())
    n_chars = pc.cast(pc.utf8_length(text), pa.float64())
    n_punct = pc.cast(pc.count_substring_regex(text, PUNCT_RE), pa.float64())
    n_stop = pc.cast(
        pc.count_substring_regex(pc.utf8_lower(text), STOP_RE), pa.float64()
    )
    punct_ratio = pc.if_else(
        pc.greater(n_chars, 0.0), pc.divide(n_punct, n_chars), pa.scalar(0.0)
    )
    stop_ratio = pc.if_else(
        pc.greater(n_tokens, 0.0), pc.divide(n_stop, n_tokens), pa.scalar(0.0)
    )
    out = batch.append_column("punct_ratio", punct_ratio)
    out = out.append_column("stop_ratio", stop_ratio)
    out = out.append_column("tok_f", pc.divide(n_tokens, TOK_SCALE))
    out = out.append_column("chr_f", pc.divide(n_chars, CHR_SCALE))
    return out


def weights_from_micro(micro=W_MICRO) -> np.ndarray:
    return np.asarray(micro, dtype=np.int64) / 1_000_000.0


def linear_score(batch: pa.Table, w: np.ndarray) -> pa.Array:
    """z = (((w0 + w1*punct) + w2*stop) + w3*tok_f) + w4*chr_f — the EXACT
    association order of the oracle SQL, so float64 results match bitwise."""
    z = pc.add(
        pc.add(
            pc.add(
                pc.add(
                    pa.scalar(float(w[0]), pa.float64()),
                    pc.multiply(batch["punct_ratio"], float(w[1])),
                ),
                pc.multiply(batch["stop_ratio"], float(w[2])),
            ),
            pc.multiply(batch["tok_f"], float(w[3])),
        ),
        pc.multiply(batch["chr_f"], float(w[4])),
    )
    return z


def score(batch: pa.Table, *, column: str = "text", micro=W_MICRO) -> pa.Table:
    """Map-only inference: (doc_id passthrough, score_micro BIGINT, keep BOOL)."""
    feat = featurize(batch, column=column)
    z = linear_score(feat, weights_from_micro(micro))
    score_micro = pc.cast(pc.round(pc.multiply(z, 1_000_000.0)), pa.int64())
    keep = pc.greater(z, pa.scalar(0.0, pa.float64()))
    return batch.append_column("score_micro", score_micro).append_column("keep", keep)


# ---------------------------------------------------------------------------
# Distributed training
# ---------------------------------------------------------------------------


def _feature_matrix(batch: pa.Table) -> np.ndarray:
    cols = [np.ones(batch.num_rows, dtype=np.float64)]
    cols += [batch[f].to_numpy(zero_copy_only=False) for f in FEATURES]
    return np.stack(cols, axis=1)


def train_logreg_distributed(
    ds: ray.data.Dataset,
    *,
    label_col: str = "label",
    id_col: str = "doc_id",
    n_iter: int = 30,
    lr: float = 2.0,
    quant: float = 1e-6,
) -> np.ndarray:
    """Full-batch logistic regression, Ray-Data-first.

    Each round broadcasts the weight vector; every block emits ONE partial
    row (per-feature gradient sums + count + a deterministic tag = the
    block's min id). The driver merges the O(num_blocks) partials in tag
    order — summation order is independent of scheduling, and per-round
    quantization to ``quant`` absorbs any partitioning-dependent float dust,
    so the result is reproducible across parallelism levels.

    Returns the weight vector (quantized to ``quant``).
    """
    feat = ds.map_batches(featurize, batch_format="pyarrow", zero_copy_batch=True)
    feat = feat.materialize()  # tiny labeled corpus; avoids re-read per round

    w = np.zeros(DIM, dtype=np.float64)
    for _ in range(n_iter):
        wref = ray.put(w)

        def partial(batch: pa.Table, _wref=wref) -> pd.DataFrame:
            wv = ray.get(_wref)
            x = _feature_matrix(batch)
            y = batch[label_col].to_numpy(zero_copy_only=False).astype(np.float64)
            p = 1.0 / (1.0 + np.exp(-(x @ wv)))
            g = x.T @ (p - y)
            tag = (
                int(pc.min(batch[id_col]).as_py()) if batch.num_rows else 2**62
            )
            row = {f"g{i}": [g[i]] for i in range(DIM)}
            row["n"] = [batch.num_rows]
            row["tag"] = [tag]
            return pd.DataFrame(row)

        parts = feat.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()  # O(num_blocks) rows — bounded driver merge
        parts = parts.sort_values("tag", kind="mergesort")
        n = int(parts["n"].sum())
        grad = np.array(
            [parts[f"g{i}"].to_numpy().sum() for i in range(DIM)], dtype=np.float64
        )
        w = w - lr * grad / max(n, 1)
        w = np.round(w / quant) * quant
    return w


# ---------------------------------------------------------------------------
# Deterministic synthetic labeled corpus (no external data)
# ---------------------------------------------------------------------------

_GOOD_WORDS = (
    "the and of a to in is model data graph table query stream batch node "
    "edge value record schema index column result system process output"
).split()
_BAD_TOKENS = (
    "xqz7 9f3k zzzz 00110 kj2n8 q8x !!1! ####"
).split()


def synthetic_labeled_corpus(n: int = 800, seed: int = 11) -> pd.DataFrame:
    """Seeded wiki-vs-noise corpus: positives are sentence-like English
    (stopword-rich, sparse punctuation); negatives are gibberish with
    punctuation/digit spam. Deterministic — frozen-weight provenance."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        label = i % 2
        if label:
            k = int(rng.integers(20, 60))
            words = rng.choice(_GOOD_WORDS, size=k)
            parts = []
            for j, wd in enumerate(words):
                parts.append(wd)
                if j % 12 == 11:
                    parts[-1] += "."
            text = " ".join(parts)
        else:
            k = int(rng.integers(10, 40))
            toks = rng.choice(_BAD_TOKENS, size=k)
            text = ";".join(toks) + "!!!" + str(int(rng.integers(0, 10**9)))
        rows.append({"doc_id": i, "text": text, "label": label})
    return pd.DataFrame(rows)


def train_quality_weights(
    *, n_docs: int = 800, seed: int = 11, n_blocks: int = 8, n_iter: int = 30,
    lr: float = 2.0,
) -> tuple[int, ...]:
    """Train on the synthetic corpus; returns integer micro weights (the
    frozen ``W_MICRO`` provenance)."""
    ds = ray.data.from_pandas(synthetic_labeled_corpus(n_docs, seed)).repartition(
        n_blocks
    )
    w = train_logreg_distributed(ds, n_iter=n_iter, lr=lr)
    return tuple(int(round(v * 1_000_000)) for v in w)


def oracle_sql(table: str = "documents", micro=W_MICRO) -> str:
    """DuckDB SQL computing the same features + the same left-associated
    linear score with the same micro/1e6 weight literals."""
    w = [f"({m} / 1000000.0)" for m in micro]
    feat = (
        "SELECT doc_id, "
        "CASE WHEN length(text) > 0 THEN "
        f"  len(regexp_extract_all(text, '{PUNCT_RE}')) / CAST(length(text) AS DOUBLE) ELSE 0.0 END AS punct_ratio, "
        f"CASE WHEN len(regexp_extract_all(text, '{TOKEN_RE}')) > 0 THEN "
        f"  len(regexp_extract_all(lower(text), '{STOP_RE}')) "
        f"  / CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS DOUBLE) ELSE 0.0 END AS stop_ratio, "
        f"len(regexp_extract_all(text, '{TOKEN_RE}')) / {TOK_SCALE} AS tok_f, "
        f"length(text) / {CHR_SCALE} AS chr_f "
        f"FROM {table}"
    )
    z = (
        f"(((({w[0]} + {w[1]} * punct_ratio) + {w[2]} * stop_ratio) "
        f"+ {w[3]} * tok_f) + {w[4]} * chr_f)"
    )
    return (
        "SELECT doc_id, CAST(round(z * 1000000.0) AS BIGINT) AS score_micro, "
        "z > 0.0 AS keep FROM "
        f"(SELECT doc_id, {z} AS z FROM ({feat}))"
    )
