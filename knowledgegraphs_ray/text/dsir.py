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


def _gram_frame(
    batch: pa.Table, *, text_col: str, lower: bool, flags
) -> pl.DataFrame:
    """-> (__i row index, __t flag, gram) — unigrams + space-joined bigrams
    per row, vectorized (the DSIR paper's hashed uni+bigram feature set).
    Each input row is one document, so the bigram shift never crosses a
    row boundary (``.over("__i")``)."""
    s = pl.from_arrow(batch[text_col]).rename("t")
    if lower:
        s = s.str.to_lowercase()
    ex = (
        pl.DataFrame(
            {
                "__i": pl.int_range(0, len(s), eager=True),
                "__t": pl.Series(flags),
                "tok": s.str.extract_all(TOKEN_RE),
            }
        )
        .explode("tok")
        .drop_nulls("tok")
        .with_columns(
            big=pl.col("tok") + " " + pl.col("tok").shift(-1).over("__i")
        )
    )
    uni = ex.select("__i", "__t", gram=pl.col("tok"))
    bi = ex.drop_nulls("big").select("__i", "__t", gram=pl.col("big"))
    return pl.concat([uni, bi])


def _gram_buckets(grams: pl.Series, *, n_buckets: int, hash_fn: str):
    """gram strings -> int64 bucket ids. ``hash_fn="md5"`` is the
    DuckDB-reproducible path (('0x'||substr(md5(g),1,16))::UBIGINT %
    n_buckets), hashed once per UNIQUE gram; "polars" is the seeded fast
    path for production runs that don't need SQL parity."""
    import numpy as np

    if hash_fn == "md5":
        from knowledgegraphs_ray.dedup.simhash import _md5_token_hashes

        h = _md5_token_hashes(grams.to_numpy())
    else:
        h = grams.hash(seed=7).to_numpy().astype("uint64")
    return (h % np.uint64(n_buckets)).astype("int64")


def dsir_hashed_weights(
    raw: ray.data.Dataset,
    *,
    target_mask,
    id_col: str = "doc_id",
    text_col: str = "text",
    lower: bool = True,
    n_buckets: int = 8192,
    hash_fn: str = "md5",
    driver_limit: int = 5_000_000,
) -> ray.data.Dataset:
    """Hashed n-gram DSIR tier (the paper's estimator): features are
    unigrams + bigrams hashed into a FIXED ``n_buckets`` bucket space, so
    the broadcast model is two int64 arrays of ``n_buckets`` entries no
    matter how large the vocabulary grows — the open-vocabulary 100-TB
    shape. Smoothing uses the fixed bucket count as the vocabulary size
    (``p(b) = (count_b + 1) / (total + n_buckets)``), which keeps the
    model parallelism- and corpus-partitioning-invariant.

    -> (id_col, n_grams, logweight_micro); micro-nat integer quantization
    as in :func:`dsir_weights`.
    """
    import numpy as np

    def count_block(batch: pa.Table) -> pa.Table:
        flags = np.asarray(target_mask(batch), dtype=bool)
        g = _gram_frame(batch, text_col=text_col, lower=lower, flags=flags)
        if g.height == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "n_raw": pa.array([], pa.int64()),
                    "n_t": pa.array([], pa.int64()),
                }
            )
        g = g.with_columns(
            bucket=pl.Series(
                _gram_buckets(g["gram"], n_buckets=n_buckets, hash_fn=hash_fn)
            )
        )
        agg = g.group_by("bucket").agg(
            n_raw=pl.len().cast(pl.Int64),
            n_t=pl.col("__t").cast(pl.Int64).sum(),
        )
        return agg.to_arrow()

    merged = merge_partials(
        raw.map_batches(count_block, batch_format="pyarrow", zero_copy_batch=True),
        keys=["bucket"],
        agg={"n_raw": "sum", "n_t": "sum"},
        driver_limit=driver_limit,
    ).to_pandas()

    d_raw = float(int(merged["n_raw"].sum())) + float(n_buckets)
    d_t = float(int(merged["n_t"].sum())) + float(n_buckets)
    q_raw = np.full(
        n_buckets, math.floor((-math.log(1.0 / d_raw)) * 1000000.0), dtype=np.int64
    )
    q_t = np.full(
        n_buckets, math.floor((-math.log(1.0 / d_t)) * 1000000.0), dtype=np.int64
    )
    # libm per nonzero bucket (bounded by n_buckets) — the _q_series contract
    for b, nr, nt in zip(merged["bucket"], merged["n_raw"], merged["n_t"]):
        q_raw[int(b)] = math.floor((-math.log((int(nr) + 1) / d_raw)) * 1000000.0)
        q_t[int(b)] = math.floor((-math.log((int(nt) + 1) / d_t)) * 1000000.0)
    ref = ray.put((q_raw, q_t))

    class _WeighHashed:
        """Instance-passed broadcast gather (task pool, no actor state)."""

        def __init__(self, ref):
            self.ref = ref
            self._m = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            if self._m is None:
                self._m = ray.get(self.ref)
            qr, qt = self._m
            n = batch.num_rows
            g = _gram_frame(
                batch, text_col=text_col, lower=lower, flags=np.zeros(n, bool)
            )
            n_grams = np.zeros(n, dtype=np.int64)
            weight = np.zeros(n, dtype=np.int64)
            if g.height:
                buckets = _gram_buckets(
                    g["gram"], n_buckets=n_buckets, hash_fn=hash_fn
                )
                rows = g["__i"].to_numpy()
                np.add.at(n_grams, rows, 1)
                np.add.at(weight, rows, qr[buckets] - qt[buckets])
            return pa.table(
                {
                    id_col: batch[id_col],
                    "n_grams": n_grams,
                    "logweight_micro": weight,
                }
            )

    return raw.map_batches(
        _WeighHashed(ref), batch_format="pyarrow", zero_copy_batch=True
    )


def dsir_hashed_oracle_sql(
    *,
    table: str = "documents",
    target_where: str = "doc_id % 10 = 0",
    id_col: str = "doc_id",
    lower: bool = True,
    n_buckets: int = 8192,
) -> str:
    """DuckDB twin of :func:`dsir_hashed_weights` (md5 bucket hash)."""
    expr = "lower(text)" if lower else "text"
    return f"""
WITH toks AS (
  SELECT {id_col},
         unnest(regexp_extract_all({expr}, '{TOKEN_RE}')) AS g,
         unnest(generate_series(1, len(regexp_extract_all({expr}, '{TOKEN_RE}')))) AS pos
  FROM {table}
),
grams AS (
  SELECT {id_col}, g AS gram FROM toks
  UNION ALL
  SELECT {id_col}, gram FROM (
    SELECT {id_col},
           g || ' ' || lead(g) OVER (PARTITION BY {id_col} ORDER BY pos) AS gram
    FROM toks
  ) WHERE gram IS NOT NULL
),
b AS (
  SELECT {id_col},
         CAST(('0x' || substr(md5(gram), 1, 16))::UBIGINT % {n_buckets} AS BIGINT) AS bucket
  FROM grams
),
counts AS (
  SELECT bucket, count(*) AS n_raw,
         count(*) FILTER (WHERE {target_where}) AS n_t
  FROM b GROUP BY bucket
),
denoms AS (
  SELECT CAST(sum(n_raw) AS DOUBLE) + {n_buckets} AS d_raw,
         CAST(sum(n_t) AS DOUBLE) + {n_buckets} AS d_t
  FROM counts
),
q AS (
  SELECT bucket,
         CAST(floor((-ln((n_raw + 1) / (SELECT d_raw FROM denoms))) * 1000000.0) AS BIGINT) AS q_raw,
         CAST(floor((-ln((n_t + 1) / (SELECT d_t FROM denoms))) * 1000000.0) AS BIGINT) AS q_target
  FROM counts
),
scored AS (
  SELECT b.{id_col}, CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum(q.q_raw - q.q_target) AS BIGINT) AS logweight_micro
  FROM b JOIN q USING (bucket)
  GROUP BY b.{id_col}
)
SELECT d.{id_col},
       COALESCE(s.n_grams, 0) AS n_grams,
       COALESCE(s.logweight_micro, 0) AS logweight_micro
FROM {table} d LEFT JOIN scored s USING ({id_col})
""".strip()


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
