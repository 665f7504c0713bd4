"""Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
weight every raw document by how much more likely its tokens are under a
TARGET-domain language model than under the RAW-corpus model, then keep
the highest-weight documents — the standard recipe for skewing a web
crawl toward a quality domain before pre-training.

    log w(doc) = sum_tokens [ ln p_target(tok) - ln p_raw(tok) ]

Both unigram distributions are add-one smoothed over the SHARED (union)
vocabulary V — ``p(tok) = (count + 1) / (total + |V|)`` — the paper's
smoothed-ratio estimator. Sharing the vocabulary matters: independent
per-corpus OOV floors (``1/total``) make every rare raw token look
target-like whenever the target corpus is smaller than the raw one,
inverting the selection. With the shared denominator a token the target
never uses always drags the weight down.

Following :mod:`knowledgegraphs_ray.text.lm`'s determinism contract,
per-token surprisal is quantized to INTEGER micro-nats — ``q =
floor(-ln p * 1e6)`` with libm ``ln`` (bit-identical to DuckDB) — so the
per-doc weight is the integer sum

    logweight_micro(doc) = sum_tokens [ q_raw(tok) - q_target(tok) ]

immune to float reassociation in either engine.

Scale shape (the ``lm.py`` shape, run twice):

* Two counting passes of per-block ``value_counts`` partials ->
  ``fastagg.merge_partials`` — token text never shuffles
  row-per-occurrence; the target pass reads only the target subset.
* The merged (token, q_raw - q_target ingredients) table is
  vocabulary-sized, broadcast ONCE via ``ray.put``; scoring is one map
  over doc blocks (polars explode -> hash-join -> integer group sums).
* Selection is ``dsir_select``'s distributed sort+limit over the integer
  weights, or a quantile threshold via the mergeable histogram
  (:mod:`knowledgegraphs_ray.text.quantiles`) in a single pass.

Reference analogue: the reference scores match candidates with a neural
LM (bert_classifier.py); DSIR is the corpus-statistics importance tier a
curation pipeline runs over billions of documents first.
"""

from __future__ import annotations

import math

import polars as pl
import pyarrow as pa
import ray
import ray.data

from knowledgegraphs_ray.text.analysis import TOKEN_RE
from knowledgegraphs_ray.text.lm import _token_count_partials
from knowledgegraphs_ray.util.fastagg import merge_partials


def _count_table(
    ds: ray.data.Dataset, *, text_col: str, lower: bool, driver_limit: int
) -> pl.DataFrame:
    """(token, n) counts — per-block partials, one combine-before-shuffle."""
    merged = merge_partials(
        _token_count_partials(ds, text_col=text_col, lower=lower),
        keys=["token"],
        agg={"n": "sum"},
        driver_limit=driver_limit,
    )
    return pl.from_arrow(
        pa.Table.from_pandas(merged.to_pandas(), preserve_index=False)
    )


def _q_series(counts: pl.Series, denom: float) -> pl.Series:
    # the exact expression tree the oracle evaluates: floor(-ln((c+1)/d)*1e6)
    return pl.Series(
        [
            math.floor((-math.log((int(c) + 1) / denom)) * 1000000.0)
            for c in counts
        ],
        dtype=pl.Int64,
    )


def _dual_count_partials(
    docs: ray.data.Dataset, *, text_col: str, lower: bool, target_mask
) -> ray.data.Dataset:
    """(token, n_raw, n_t) per-block partials in ONE pass — when the
    target domain is a row predicate of the raw corpus, counting both
    distributions separately wastes a full corpus read."""

    def block(batch: pa.Table) -> pa.Table:
        import numpy as np

        mask = np.asarray(target_mask(batch), dtype=bool)
        s = pl.from_arrow(batch[text_col]).rename("t")
        if lower:
            s = s.str.to_lowercase()
        ex = (
            pl.DataFrame(
                {
                    "__t": pl.Series(mask),
                    "tok": s.str.extract_all(TOKEN_RE),
                }
            )
            .explode("tok")
            .drop_nulls("tok")
        )
        agg = ex.group_by("tok").agg(
            n_raw=pl.len().cast(pl.Int64),
            n_t=pl.col("__t").cast(pl.Int64).sum(),
        )
        return agg.rename({"tok": "token"}).to_arrow()

    return docs.map_batches(block, batch_format="pyarrow", zero_copy_batch=True)


def dsir_weights(
    raw: ray.data.Dataset,
    target: ray.data.Dataset | None = None,
    *,
    target_mask=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    lower: bool = True,
    driver_limit: int = 5_000_000,
) -> ray.data.Dataset:
    """-> (id_col, n_tokens, logweight_micro) for every raw document.

    ``logweight_micro`` is the integer micro-nat log importance weight
    (positive = more target-like). The broadcast table is
    vocabulary-sized; above ``driver_limit`` distinct tokens the count
    merge falls back to the distributed fastagg tier.

    Pass EITHER ``target`` (a separate Dataset — two counting passes) or
    ``target_mask`` (a ``batch -> bool array`` row predicate over the raw
    corpus — raw and target tallies count in ONE corpus pass, the 100-TB
    shape when the target is a subset of the raw corpus). Results are
    identical for ``target == raw.filter(mask)``.
    """
    if (target is None) == (target_mask is None):
        raise ValueError("pass exactly one of target / target_mask")
    if target_mask is not None:
        merged = merge_partials(
            _dual_count_partials(
                raw, text_col=text_col, lower=lower, target_mask=target_mask
            ),
            keys=["token"],
            agg={"n_raw": "sum", "n_t": "sum"},
            driver_limit=driver_limit,
        )
        both = pl.from_arrow(
            pa.Table.from_pandas(merged.to_pandas(), preserve_index=False)
        )
    else:
        c_raw = _count_table(
            raw, text_col=text_col, lower=lower, driver_limit=driver_limit
        )
        c_t = _count_table(
            target, text_col=text_col, lower=lower, driver_limit=driver_limit
        )
        both = c_raw.rename({"n": "n_raw"}).join(
            c_t.rename({"n": "n_t"}), on="token", how="full", coalesce=True
        ).with_columns(
            pl.col("n_raw").fill_null(0), pl.col("n_t").fill_null(0)
        )
    v = both.height  # shared vocabulary size (union)
    total_raw = float(int(both["n_raw"].sum() or 0)) + float(v)
    total_t = float(int(both["n_t"].sum() or 0)) + float(v)
    delta = both.with_columns(
        q_raw=_q_series(both["n_raw"], total_raw),
        q_target=_q_series(both["n_t"], total_t),
    ).select("token", "q_raw", "q_target")
    ref = ray.put(delta)
    # a token in neither corpus can only appear if the scored dataset is
    # not the training raw corpus; give it the count-0 surprisals
    oov_raw = math.floor((-math.log(1.0 / total_raw)) * 1000000.0)
    oov_target = math.floor((-math.log(1.0 / total_t)) * 1000000.0)

    class _WeighBlock:
        """Instance-passed broadcast lookup (task pool, no actor state)."""

        def __init__(self, ref):
            self.ref = ref
            self._m = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self._m is None:
                self._m = ray.get(self.ref)
            s = pl.from_arrow(batch[text_col]).rename("t")
            if lower:
                s = s.str.to_lowercase()
            ex = (
                pl.DataFrame(
                    {
                        "__i": pl.int_range(0, len(s), eager=True),
                        "tok": s.str.extract_all(TOKEN_RE),
                    }
                )
                .explode("tok")
                .drop_nulls("tok")
            )
            ex = ex.join(self._m, left_on="tok", right_on="token", how="left")
            ex = ex.with_columns(
                pl.col("q_raw").fill_null(oov_raw),
                pl.col("q_target").fill_null(oov_target),
            )
            agg = ex.group_by("__i").agg(
                n_tokens=pl.len().cast(pl.Int64),
                logweight_micro=(pl.col("q_raw") - pl.col("q_target"))
                .sum()
                .cast(pl.Int64),
            )
            base = pl.DataFrame({"__i": pl.int_range(0, len(s), eager=True)})
            out = (
                base.join(agg, on="__i", how="left")
                .sort("__i")
                .with_columns(
                    pl.col("n_tokens").fill_null(0),
                    pl.col("logweight_micro").fill_null(0),
                )
            )
            return pa.table(
                {
                    id_col: batch[id_col],
                    "n_tokens": out["n_tokens"].to_arrow(),
                    "logweight_micro": out["logweight_micro"].to_arrow(),
                }
            )

    return raw.map_batches(
        _WeighBlock(ref), batch_format="pyarrow", zero_copy_batch=True
    )


def dsir_select(
    raw: ray.data.Dataset,
    target: ray.data.Dataset | None = None,
    k: int = 1000,
    *,
    target_mask=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    lower: bool = True,
) -> ray.data.Dataset:
    """Top-k most target-like raw documents (weights attached), ties
    broken by id for determinism — a distributed sort+limit, never a
    driver-side ranking."""
    w = dsir_weights(
        raw, target, target_mask=target_mask, id_col=id_col,
        text_col=text_col, lower=lower,
    )
    return w.sort(["logweight_micro", id_col], descending=[True, False]).limit(k)


def dsir_oracle_sql(
    *,
    table: str = "documents",
    target_where: str = "doc_id % 10 = 0",
    id_col: str = "doc_id",
    lower: bool = True,
) -> str:
    """DuckDB twin of :func:`dsir_weights` with the identical smoothing,
    quantization and expression trees (see module docstring)."""
    expr = "lower(text)" if lower else "text"
    return f"""
WITH tok_raw AS (
  SELECT {id_col}, unnest(regexp_extract_all({expr}, '{TOKEN_RE}')) AS token
  FROM {table}
),
tok_t AS (
  SELECT {id_col}, unnest(regexp_extract_all({expr}, '{TOKEN_RE}')) AS token
  FROM {table} WHERE {target_where}
),
counts AS (
  SELECT r.token, r.c AS n_raw, COALESCE(t.c, 0) AS n_t
  FROM (SELECT token, count(*) AS c FROM tok_raw GROUP BY token) r
  LEFT JOIN (SELECT token, count(*) AS c FROM tok_t GROUP BY token) t
    USING (token)
),
denoms AS (
  SELECT CAST(sum(n_raw) AS DOUBLE) + count(*) AS d_raw,
         CAST(sum(n_t) AS DOUBLE) + count(*) AS d_t
  FROM counts
),
q AS (
  SELECT token,
         CAST(floor((-ln((n_raw + 1) / (SELECT d_raw FROM denoms))) * 1000000.0) AS BIGINT) AS q_raw,
         CAST(floor((-ln((n_t + 1) / (SELECT d_t FROM denoms))) * 1000000.0) AS BIGINT) AS q_target
  FROM counts
),
scored AS (
  SELECT t.{id_col}, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(q.q_raw - q.q_target) AS BIGINT) AS logweight_micro
  FROM tok_raw t JOIN q USING (token)
  GROUP BY t.{id_col}
)
SELECT d.{id_col},
       COALESCE(s.n_tokens, 0) AS n_tokens,
       COALESCE(s.logweight_micro, 0) AS logweight_micro
FROM {table} d LEFT JOIN scored s USING ({id_col})
""".strip()
