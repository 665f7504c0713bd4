"""Unigram language-model training + perplexity scoring — the CCNet-style
corpus-fluency filter (Wenzek et al., 2020: score web documents by LM
perplexity, keep the fluent head of the distribution).

Determinism contract with the DuckDB oracle: per-token surprisal is
quantized to INTEGER micro-nats once per distinct (count, total) pair —
``q(tok) = floor(-ln(c/total) * 1e6)`` with ``math.log``/``math.floor``
(libm ln is bit-identical to DuckDB ``ln``; numpy.log is not) — so per-doc
scores are integer sums, immune to float reassociation in either engine.
``ppl = exp(q_sum/1e6/n)`` is then one fixed expression tree over those
integers (``math.exp`` == DuckDB ``exp``), so even the double column
hash-matches exactly.

Scale shape: training is per-block ``value_counts`` partials merged via
``fastagg.merge_partials`` (combine-before-shuffle — token text never
shuffles row-per-occurrence); the model is vocabulary-sized, broadcast
ONCE via ``ray.put`` and read per task. ``vocab_limit`` pools the count
tail into a single OOV bucket when the corpus vocabulary outgrows a
broadcastable table (web-crawl vocabularies are ~1e8 tokens; the top 1e6
carry almost all mass). Scoring is one map over doc blocks: polars
explode -> hash-join against the broadcast vocab -> integer group sums;
the only per-row Python is one ``math.exp`` per DOCUMENT (libm
determinism), not per token.

Reference analogue: the reference ranks entity-match candidates with a
BERT LM (bert_classifier.py); this is the corpus-statistics LM tier a
curation pipeline runs long before any neural scorer.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from knowledgegraphs_ray.text.analysis import TOKEN_RE
from knowledgegraphs_ray.util.fastagg import merge_partials


@dataclass
class UnigramLM:
    """token -> integer micro-nat surprisal, plus the OOV surprisal used
    for tokens outside the (possibly capped) vocabulary."""

    vocab: pl.DataFrame  # columns: token (str), q (int64)
    total_tokens: int
    oov_q: int

    @staticmethod
    def _q(count: int, total: float) -> int:
        # the quantization both engines evaluate identically (module docstring)
        return math.floor((-math.log(count / total)) * 1000000.0)


def _token_count_partials(
    docs: ray.data.Dataset, *, text_col: str, lower: bool
) -> ray.data.Dataset:
    def block(batch: pa.Table) -> pa.Table:
        s = pl.from_arrow(batch[text_col]).rename("t")
        if lower:
            s = s.str.to_lowercase()
        counts = s.str.extract_all(TOKEN_RE).explode().drop_nulls().value_counts()
        df = counts.struct.unnest() if hasattr(counts, "struct") else counts
        return (
            df.rename({"t": "token", "count": "n"})
            .select(pl.col("token"), pl.col("n").cast(pl.Int64))
            .to_arrow()
        )

    return docs.map_batches(block, batch_format="pyarrow", zero_copy_batch=True)


def train_unigram_lm(
    docs: ray.data.Dataset,
    *,
    text_col: str = "text",
    lower: bool = True,
    vocab_limit: int | None = None,
    driver_limit: int = 5_000_000,
) -> UnigramLM:
    """One streaming pass -> a broadcastable :class:`UnigramLM`.

    ``vocab_limit``: keep only the ``vocab_limit`` most frequent tokens
    (ties broken by token for determinism) and pool the tail count into the
    OOV bucket — the bounded-memory tier for open vocabularies.
    """
    merged = merge_partials(
        _token_count_partials(docs, text_col=text_col, lower=lower),
        keys=["token"],
        agg={"n": "sum"},
        driver_limit=driver_limit,
    )
    if vocab_limit is None:
        pdf = pl.from_arrow(
            pa.Table.from_pandas(merged.to_pandas(), preserve_index=False)
        )
        total = int(pdf["n"].sum() or 0)
        tail = 0
    else:
        # bounded-vocab tier: total from a tiny per-block aggregate over the
        # (already merged, one-row-per-token) table; only the top-V rows ever
        # reach the driver — a distributed sort+limit, not a full collect
        mat = merged.materialize()
        total = int(
            mat.map_batches(_block_n_sum, batch_format="pyarrow")
            .to_pandas()["n"]
            .sum()
        )
        top = mat.sort(["n", "token"], descending=[True, False]).limit(vocab_limit)
        pdf = pl.from_arrow(
            pa.Table.from_pandas(top.to_pandas(), preserve_index=False)
        )
        tail = total - int(pdf["n"].sum() or 0)
    totalf = float(total) if total else 1.0
    q = pl.Series(
        "q",
        [UnigramLM._q(int(c), totalf) for c in pdf["n"]],
        dtype=pl.Int64,
    )
    vocab = pl.DataFrame({"token": pdf["token"], "q": q})
    oov_q = UnigramLM._q(max(tail, 1), totalf)
    return UnigramLM(vocab=vocab, total_tokens=total, oov_q=oov_q)


def _block_n_sum(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    return pa.table({"n": pa.array([int(pc.sum(batch["n"]).as_py() or 0)], pa.int64())})


class _ScoreBlock:
    """Instance-passed (task pool — broadcast lookup, no per-actor state
    beyond the one ``ray.get``)."""

    def __init__(self, ref, *, id_col, text_col, lower, oov_q):
        self.ref = ref
        self.id_col = id_col
        self.text_col = text_col
        self.lower = lower
        self.oov_q = oov_q
        self._m = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._m is None:
            self._m = ray.get(self.ref)
        ids = batch[self.id_col]
        s = pl.from_arrow(batch[self.text_col]).rename("t")
        if self.lower:
            s = s.str.to_lowercase()
        toks = s.str.extract_all(TOKEN_RE)
        ex = (
            pl.DataFrame(
                {"__i": pl.int_range(0, len(s), eager=True), "tok": toks}
            )
            .explode("tok")
            .drop_nulls("tok")  # explode of an EMPTY list yields a null row
        )
        ex = ex.join(
            self._m, left_on="tok", right_on="token", how="left"
        ).with_columns(pl.col("q").fill_null(self.oov_q))
        agg = ex.group_by("__i").agg(
            n_tokens=pl.len().cast(pl.Int64), surprisal_micro=pl.col("q").sum()
        )
        base = pl.DataFrame({"__i": pl.int_range(0, len(s), eager=True)})
        out = (
            base.join(agg, on="__i", how="left")
            .sort("__i")
            .with_columns(
                pl.col("n_tokens").fill_null(0),
                pl.col("surprisal_micro").fill_null(0),
            )
        )
        n = out["n_tokens"].to_numpy()
        sm = out["surprisal_micro"].to_numpy()
        # one libm exp per DOCUMENT (not per token): bit-identical to the
        # oracle's exp(); np.exp can differ in the last ulp
        ppl = np.fromiter(
            (math.exp(s_ / 1000000.0 / max(int(n_), 1)) for s_, n_ in zip(sm, n)),
            dtype=np.float64,
            count=len(n),
        )
        return pa.table(
            {
                self.id_col: ids,
                "n_tokens": pa.array(n, pa.int64()),
                "surprisal_micro": pa.array(sm, pa.int64()),
                "ppl": pa.array(ppl, pa.float64()),
            }
        )


def perplexity(
    docs: ray.data.Dataset,
    model: UnigramLM | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lower: bool = True,
    vocab_limit: int | None = None,
) -> ray.data.Dataset:
    """-> (id_col, n_tokens, surprisal_micro, ppl) per document.

    Trains on the corpus itself when ``model`` is None (the CCNet pattern
    scores against a REFERENCE corpus LM — pass one trained elsewhere).
    """
    if model is None:
        model = train_unigram_lm(
            docs, text_col=text_col, lower=lower, vocab_limit=vocab_limit
        )
    ref = ray.put(model.vocab)
    return docs.map_batches(
        _ScoreBlock(
            ref, id_col=id_col, text_col=text_col, lower=lower, oov_q=model.oov_q
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def perplexity_filter(
    docs: ray.data.Dataset,
    model: UnigramLM | None = None,
    *,
    keep_quantile: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "text",
    lower: bool = True,
    vocab_limit: int | None = None,
    clip_max_centi: int = 100_000,
) -> ray.data.Dataset:
    """CCNet head selection: keep the ``keep_quantile`` least-perplexed
    fraction of the corpus (ppl <= the corpus ppl quantile).

    The threshold comes from :func:`histogram_quantiles` over ppl quantized
    to centi-units (0.01-ppl bins; the histogram partial is a dense array
    of length clip_max, so the quantization also bounds partial size) —
    exact discrete quantiles from mergeable partials, the driver never sees
    per-doc scores. Returns the input columns + ``ppl`` for the survivors.
    """
    from knowledgegraphs_ray.text.quantiles import histogram_quantiles

    scored = perplexity(
        docs, model, id_col=id_col, text_col=text_col, lower=lower,
        vocab_limit=vocab_limit,
    ).map_batches(
        lambda t: t.append_column(
            "ppl_centi",
            pa.array(
                np.minimum(
                    (t["ppl"].to_numpy() * 100.0).astype(np.int64), clip_max_centi
                ),
                pa.int64(),
            ),
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()  # scored twice (threshold + filter); score once
    thresh = int(
        histogram_quantiles(scored, "ppl_centi", [keep_quantile], clip_max=clip_max_centi)
        .set_index("q")["value"]
        .iloc[0]
    )
    kept_ids = scored.map_batches(
        lambda t: t.filter(pc.less_equal(t["ppl_centi"], thresh)).select(
            [id_col, "ppl"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    from knowledgegraphs_ray.extract.joins import broadcast_join, native_join

    # reattach full doc rows: ids+ppl are 16 B/doc — broadcast when small,
    # hash join when the corpus id set outgrows a broadcast table
    if kept_ids.count() <= 2_000_000:
        return broadcast_join(
            docs, kept_ids, left_on=id_col, right_on=id_col, how="inner"
        )
    return native_join(docs, kept_ids, left_on=id_col, right_on=id_col, how="inner")


def perplexity_oracle_sql(
    *, table: str = "documents", id_col: str = "doc_id", lower: bool = True
) -> str:
    """DuckDB twin with the identical quantization + expression trees."""
    expr = "lower(text)" if lower else "text"
    return f"""
WITH tok AS (
  SELECT {id_col}, unnest(regexp_extract_all({expr}, '{TOKEN_RE}')) AS token
  FROM {table}
),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM tok),
q AS (
  SELECT token,
         CAST(floor((-ln(count(*) / (SELECT total FROM tot))) * 1000000.0) AS BIGINT) AS q
  FROM tok GROUP BY token
),
scored AS (
  SELECT t.{id_col}, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(q.q) AS BIGINT) AS surprisal_micro
  FROM tok t JOIN q USING (token) GROUP BY t.{id_col}
)
SELECT d.{id_col},
       COALESCE(s.n_tokens, 0) AS n_tokens,
       COALESCE(s.surprisal_micro, 0) AS surprisal_micro,
       exp(COALESCE(s.surprisal_micro, 0) / 1000000.0
           / greatest(COALESCE(s.n_tokens, 0), 1)) AS ppl
FROM {table} d LEFT JOIN scored s USING ({id_col})
""".strip()


# ---------------------------------------------------------------------------
# Bigram LM with interpolated unigram backoff (pruned-KenLM direction)
# ---------------------------------------------------------------------------

_LAM = 0.75  # bigram weight; 1-_LAM = 0.25 — both exactly representable


def _bigram_count_partials(
    docs: ray.data.Dataset, *, text_col: str, lower: bool
) -> ray.data.Dataset:
    """Per-block (w1, w2, n) adjacent-pair counts — pairs never cross
    document boundaries (shift is per-document)."""

    def block(batch: pa.Table) -> pa.Table:
        s = pl.from_arrow(batch[text_col]).rename("t")
        if lower:
            s = s.str.to_lowercase()
        toks = s.str.extract_all(TOKEN_RE)
        ex = (
            pl.DataFrame(
                {"__i": pl.int_range(0, len(s), eager=True), "tok": toks}
            )
            .explode("tok")
            .drop_nulls("tok")
        )
        ex = ex.with_columns(prev=pl.col("tok").shift(1).over("__i"))
        big = (
            ex.drop_nulls("prev")
            .group_by(["prev", "tok"])
            .agg(n=pl.len().cast(pl.Int64))
            .rename({"prev": "w1", "tok": "w2"})
        )
        return big.to_arrow()

    return docs.map_batches(block, batch_format="pyarrow", zero_copy_batch=True)


@dataclass
class BigramLM:
    """Interpolated bigram model, all surprisals pre-quantized to integer
    micro-nats with the oracle's exact expression trees:

    * first token of a document:       q1(w)      = floor(-ln(cu/total)*1e6)
    * seen bigram (w1 in vocab):       q2(w1, w2) = floor(-ln(0.75*(c2/c1)
                                                    + 0.25*(cu2/total))*1e6)
    * unseen/pruned bigram (backoff):  q_bo(w2)   = floor(-ln(0.25*
                                                    (cu2/total))*1e6)

    ``uni`` columns: token, q1, q_bo; ``big`` columns: w1, w2, q2. OOV
    tokens (bounded-vocab tier) use the pooled-tail count like UnigramLM.
    """

    uni: pl.DataFrame
    big: pl.DataFrame
    total_tokens: int
    oov_q1: int
    oov_qbo: int


def _q1(cu: int, total: float) -> int:
    return math.floor((-math.log(cu / total)) * 1000000.0)


def _qbo(cu: int, total: float) -> int:
    return math.floor((-math.log(0.25 * (cu / total))) * 1000000.0)


def _q2(c2: int, c1: int, cu2: int, total: float) -> int:
    return math.floor(
        (-math.log(0.75 * (c2 / c1) + 0.25 * (cu2 / total))) * 1000000.0
    )


def train_bigram_lm(
    docs: ray.data.Dataset,
    *,
    text_col: str = "text",
    lower: bool = True,
    vocab_limit: int | None = None,
    bigram_limit: int | None = None,
    driver_limit: int = 5_000_000,
) -> BigramLM:
    """Two streaming count passes (token partials + adjacent-pair partials,
    both combine-before-shuffle) -> a broadcastable :class:`BigramLM`.

    ``bigram_limit`` keeps only the most frequent bigrams (ties by pair) —
    the bounded tier for web-scale pair vocabularies; pruned pairs score
    through the backoff branch, exactly like unseen pairs (pruned KenLM
    semantics). ``vocab_limit`` pools tail unigrams into OOV as in
    :func:`train_unigram_lm`.
    """
    merged = merge_partials(
        _token_count_partials(docs, text_col=text_col, lower=lower),
        keys=["token"],
        agg={"n": "sum"},
        driver_limit=driver_limit,
    )
    if vocab_limit is None:
        updf = pl.from_arrow(
            pa.Table.from_pandas(merged.to_pandas(), preserve_index=False)
        )
        total = int(updf["n"].sum() or 0)
        tail = 0
    else:
        mat = merged.materialize()
        total = int(
            mat.map_batches(_block_n_sum, batch_format="pyarrow")
            .to_pandas()["n"]
            .sum()
        )
        top = mat.sort(["n", "token"], descending=[True, False]).limit(vocab_limit)
        updf = pl.from_arrow(
            pa.Table.from_pandas(top.to_pandas(), preserve_index=False)
        )
        tail = total - int(updf["n"].sum() or 0)
    totalf = float(total) if total else 1.0
    cu = {t: int(c) for t, c in zip(updf["token"], updf["n"])}

    bmerged = merge_partials(
        _bigram_count_partials(docs, text_col=text_col, lower=lower),
        keys=["w1", "w2"],
        agg={"n": "sum"},
        driver_limit=driver_limit,
    )
    if bigram_limit is None:
        bpdf = pl.from_arrow(
            pa.Table.from_pandas(bmerged.to_pandas(), preserve_index=False)
        )
    else:
        bpdf = pl.from_arrow(
            pa.Table.from_pandas(
                bmerged.materialize()
                .sort(["n", "w1", "w2"], descending=[True, False, False])
                .limit(bigram_limit)
                .to_pandas(),
                preserve_index=False,
            )
        )

    uni = pl.DataFrame(
        {
            "token": updf["token"],
            "q1": pl.Series(
                [_q1(int(c), totalf) for c in updf["n"]], dtype=pl.Int64
            ),
            "q_bo": pl.Series(
                [_qbo(int(c), totalf) for c in updf["n"]], dtype=pl.Int64
            ),
        }
    )
    # a bigram whose w1 or w2 fell out of a capped vocab scores via backoff
    keep = [
        (w1 in cu and w2 in cu)
        for w1, w2 in zip(bpdf["w1"], bpdf["w2"])
    ]
    bpdf = bpdf.filter(pl.Series(keep)) if len(bpdf) else bpdf
    q2 = pl.Series(
        [
            _q2(int(n), cu[w1], cu[w2], totalf)
            for w1, w2, n in zip(bpdf["w1"], bpdf["w2"], bpdf["n"])
        ],
        dtype=pl.Int64,
    )
    big = pl.DataFrame({"w1": bpdf["w1"], "w2": bpdf["w2"], "q2": q2})
    oov_cu = max(tail, 1)
    return BigramLM(
        uni=uni,
        big=big,
        total_tokens=total,
        oov_q1=_q1(oov_cu, totalf),
        oov_qbo=_qbo(oov_cu, totalf),
    )


class _BigramScoreBlock:
    """Instance-passed broadcast-lookup scorer: explode with per-doc shift,
    one join against the unigram table, one against the bigram table,
    branch select, integer group sums. One libm exp per document."""

    def __init__(self, uref, bref, *, id_col, text_col, lower, oov_q1, oov_qbo):
        self.uref, self.bref = uref, bref
        self.id_col, self.text_col = id_col, text_col
        self.lower = lower
        self.oov_q1, self.oov_qbo = oov_q1, oov_qbo
        self._u = None
        self._b = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._u is None:
            self._u = ray.get(self.uref)
            self._b = ray.get(self.bref)
        ids = batch[self.id_col]
        s = pl.from_arrow(batch[self.text_col]).rename("t")
        if self.lower:
            s = s.str.to_lowercase()
        toks = s.str.extract_all(TOKEN_RE)
        ex = (
            pl.DataFrame(
                {"__i": pl.int_range(0, len(s), eager=True), "tok": toks}
            )
            .explode("tok")
            .drop_nulls("tok")
        )
        ex = ex.with_columns(prev=pl.col("tok").shift(1).over("__i"))
        ex = ex.join(self._u, left_on="tok", right_on="token", how="left")
        ex = ex.join(
            self._b, left_on=["prev", "tok"], right_on=["w1", "w2"], how="left"
        )
        q = (
            pl.when(pl.col("prev").is_null())
            .then(pl.col("q1").fill_null(self.oov_q1))
            .otherwise(
                pl.col("q2").fill_null(pl.col("q_bo").fill_null(self.oov_qbo))
            )
        )
        ex = ex.with_columns(q=q)
        agg = ex.group_by("__i").agg(
            n_tokens=pl.len().cast(pl.Int64), surprisal_micro=pl.col("q").sum()
        )
        base = pl.DataFrame({"__i": pl.int_range(0, len(s), eager=True)})
        out = (
            base.join(agg, on="__i", how="left")
            .sort("__i")
            .with_columns(
                pl.col("n_tokens").fill_null(0),
                pl.col("surprisal_micro").fill_null(0),
            )
        )
        n = out["n_tokens"].to_numpy()
        sm = out["surprisal_micro"].to_numpy()
        ppl = np.fromiter(
            (math.exp(s_ / 1000000.0 / max(int(n_), 1)) for s_, n_ in zip(sm, n)),
            dtype=np.float64,
            count=len(n),
        )
        return pa.table(
            {
                self.id_col: ids,
                "n_tokens": pa.array(n, pa.int64()),
                "surprisal_micro": pa.array(sm, pa.int64()),
                "ppl": pa.array(ppl, pa.float64()),
            }
        )


def bigram_perplexity(
    docs: ray.data.Dataset,
    model: BigramLM | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lower: bool = True,
    vocab_limit: int | None = None,
    bigram_limit: int | None = None,
) -> ray.data.Dataset:
    """-> (id_col, n_tokens, surprisal_micro, ppl) under the interpolated
    bigram model (trains on the corpus itself when ``model`` is None)."""
    if model is None:
        model = train_bigram_lm(
            docs,
            text_col=text_col,
            lower=lower,
            vocab_limit=vocab_limit,
            bigram_limit=bigram_limit,
        )
    uref = ray.put(model.uni)
    bref = ray.put(model.big)
    return docs.map_batches(
        _BigramScoreBlock(
            uref,
            bref,
            id_col=id_col,
            text_col=text_col,
            lower=lower,
            oov_q1=model.oov_q1,
            oov_qbo=model.oov_qbo,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def bigram_perplexity_oracle_sql(
    *, table: str = "documents", id_col: str = "doc_id", lower: bool = True
) -> str:
    """DuckDB twin (full vocabulary, no pruning): identical quantization
    and interpolation expression trees; multiple unnests zip positionally,
    lag() orders bigrams within each document."""
    expr = "lower(text)" if lower else "text"
    return f"""
WITH tok AS (
  SELECT {id_col},
    unnest(regexp_extract_all({expr}, '{TOKEN_RE}')) AS token,
    unnest(range(1, len(regexp_extract_all({expr}, '{TOKEN_RE}')) + 1)) AS pos
  FROM {table}
),
seq AS (
  SELECT {id_col}, pos, token,
         lag(token) OVER (PARTITION BY {id_col} ORDER BY pos) AS prev
  FROM tok
),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM tok),
uni AS (SELECT token, CAST(count(*) AS BIGINT) AS cu FROM tok GROUP BY token),
big AS (
  SELECT prev AS w1, token AS w2, CAST(count(*) AS BIGINT) AS c2
  FROM seq WHERE prev IS NOT NULL GROUP BY prev, token
),
q AS (
  SELECT s.{id_col},
    CASE WHEN s.prev IS NULL THEN
      CAST(floor((-ln(CAST(u.cu AS DOUBLE) / (SELECT total FROM tot)))
           * 1000000.0) AS BIGINT)
    ELSE
      CAST(floor((-ln(0.75 * (CAST(b.c2 AS DOUBLE) / CAST(u1.cu AS DOUBLE))
           + 0.25 * (CAST(u.cu AS DOUBLE) / (SELECT total FROM tot))))
           * 1000000.0) AS BIGINT)
    END AS q
  FROM seq s
  JOIN uni u ON u.token = s.token
  LEFT JOIN uni u1 ON u1.token = s.prev
  LEFT JOIN big b ON b.w1 = s.prev AND b.w2 = s.token
),
scored AS (
  SELECT {id_col}, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(q) AS BIGINT) AS surprisal_micro
  FROM q GROUP BY {id_col}
)
SELECT d.{id_col},
       COALESCE(s.n_tokens, 0) AS n_tokens,
       COALESCE(s.surprisal_micro, 0) AS surprisal_micro,
       exp(COALESCE(s.surprisal_micro, 0) / 1000000.0
           / greatest(COALESCE(s.n_tokens, 0), 1)) AS ppl
FROM {table} d LEFT JOIN scored s USING ({id_col})
""".strip()
