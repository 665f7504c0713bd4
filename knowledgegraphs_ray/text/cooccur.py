"""Token co-occurrence counting over a document corpus — the integer
inputs to PMI / association-rule / word-embedding-style analyses: for every
pair of top-``vocab_size`` tokens, the number of documents containing BOTH
(distinct-per-document semantics), plus each token's document frequency.

Scores like PMI = ln(N·c_xy / (c_x·c_y)) are float-reassociation hazards
(see sim/pca.py's integer discipline) — this operator deliberately emits
the exact integer counts and leaves the log to the caller, so the DuckDB
twin (:func:`cooccurrence_oracle_sql`) is bit-exact.

Scale shape:
* Document frequencies come from per-block distinct (doc, token) partials
  merged by token — the corpus text never shuffles.
* The vocabulary (top-V by df, ties broken by token) broadcasts ONCE as a
  token->code map; out-of-vocabulary tokens are dropped map-side, so the
  single hash exchange carries only slim (doc-bucket, code) int rows.
* Within each bucket, per-document pairs pack into one int64 key
  (x·V + y) and aggregate with a SPARSE bincount (np.unique on packed
  keys), so each bucket's partial is bounded by its OBSERVED pairs and
  the global merge by min(Σ observed, V²/2) rows. Keep V ≤ ~30k so the
  pair key space stays driver-mergeable; raise ``sum_partials``'
  fallback does the right thing beyond that.
* Pair canonicalization is by token STRING order (matching the SQL twin's
  ``a.t < b.t``), applied at decode time on the V²-bounded result.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from knowledgegraphs_ray.util.blocks import compact_nonempty
from knowledgegraphs_ray.util.fastagg import sum_partials


def _nparts() -> int:
    return max(2, min(32, int(ray.cluster_resources().get("CPU", 8))))


def _doc_tokens(df: pd.DataFrame, text_col: str, id_col: str) -> pd.DataFrame:
    """Distinct (doc, token) rows of a text block — single-space split,
    empties dropped (string_split(text, ' ') parity)."""
    toks = df[text_col].str.split(" ")
    out = df[[id_col]].copy()
    out["t"] = toks
    out = out.explode("t", ignore_index=True)
    out = out[(out["t"].notna()) & (out["t"] != "")]
    return out.drop_duplicates([id_col, "t"])


def token_cooccurrence(
    docs: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 200,
    min_pair_count: int = 2,
) -> ray.data.Dataset:
    """-> (x, y, pair_count, x_df, y_df) for every top-``vocab_size`` token
    pair co-occurring in ≥ ``min_pair_count`` documents, x < y by string
    order. ``*_df`` are document frequencies over the whole corpus."""
    nparts = _nparts()

    tok_parts = docs.map_batches(
        lambda df: _doc_tokens(df, text_col, id_col)
        .groupby("t", as_index=False)
        .size()
        .rename(columns={"size": "df"}),
        batch_format="pandas",
    )
    dfreq = sum_partials(tok_parts, keys=["t"], sum_cols=["df"]).to_pandas()
    if dfreq.empty:
        return ray.data.from_arrow(
            pa.schema(
                [
                    ("x", pa.string()),
                    ("y", pa.string()),
                    ("pair_count", pa.int64()),
                    ("x_df", pa.int64()),
                    ("y_df", pa.int64()),
                ]
            ).empty_table()
        )
    vocab = (
        dfreq.sort_values(["df", "t"], ascending=[False, True], kind="mergesort")
        .head(vocab_size)
        .reset_index(drop=True)
    )
    v = len(vocab)
    v64 = np.int64(v)
    code_ref = ray.put(
        pd.Series(np.arange(v, dtype=np.int64), index=vocab["t"].to_numpy())
    )

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        dt = _doc_tokens(df, text_col, id_col)
        lut = ray.get(code_ref)
        code = dt["t"].map(lut)
        m = code.notna().to_numpy()
        ids = dt[id_col].to_numpy()[m]
        h = pd.util.hash_array(ids) % np.uint64(nparts)
        return pd.DataFrame(
            {
                "doc": ids,
                "code": code.to_numpy()[m].astype(np.int64),
                "__b": h.astype(np.int64),
            }
        )

    bucketed = docs.map_batches(encode, batch_format="pandas")

    def pair_partials(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc", "code"], kind="mergesort")
        did, _ = pd.factorize(g["doc"], sort=False)
        codes = g["code"].to_numpy()
        # within-doc ascending-code pairs, packed into one int64 key
        from knowledgegraphs_ray.graph.triangles import (
            _pairs_within_sorted_groups,
        )

        a, b = _pairs_within_sorted_groups(did)
        packed = codes[a] * v64 + codes[b]
        keys, cnt = np.unique(packed, return_counts=True)
        return pd.DataFrame({"k": keys, "pair_count": cnt.astype(np.int64)})

    parts = compact_nonempty(
        bucketed.groupby("__b").map_groups(pair_partials, batch_format="pandas"),
        pa.schema([("k", pa.int64()), ("pair_count", pa.int64())]),
    )
    merged = sum_partials(parts, keys=["k"], sum_cols=["pair_count"])
    mdf = merged.to_pandas() if merged.count() else pd.DataFrame()
    if mdf.empty:
        mdf = pd.DataFrame(
            {"k": np.empty(0, np.int64), "pair_count": np.empty(0, np.int64)}
        )
    mdf = mdf[mdf["pair_count"] >= min_pair_count]
    cx = (mdf["k"].to_numpy() // v64).astype(np.int64)
    cy = (mdf["k"].to_numpy() % v64).astype(np.int64)
    toks = vocab["t"].to_numpy()
    dfs = vocab["df"].to_numpy().astype(np.int64)
    tx, ty = toks[cx], toks[cy]
    # canonicalize by token string order (SQL twin: a.t < b.t)
    swap = tx > ty
    out = pd.DataFrame(
        {
            "x": np.where(swap, ty, tx),
            "y": np.where(swap, tx, ty),
            "pair_count": mdf["pair_count"].to_numpy(),
            "x_df": np.where(swap, dfs[cy], dfs[cx]),
            "y_df": np.where(swap, dfs[cx], dfs[cy]),
        }
    ).sort_values(["x", "y"], kind="mergesort")
    return ray.data.from_pandas(out.reset_index(drop=True))


def cooccurrence_oracle_sql(
    *,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 200,
    min_pair_count: int = 2,
) -> str:
    """DuckDB twin: distinct-per-doc tokens, top-V vocabulary (df DESC,
    token ASC), self-join pair counts, marginal dfs attached."""
    return f"""
WITH toks AS (
  SELECT DISTINCT {id_col} AS doc, t FROM (
    SELECT {id_col}, UNNEST(string_split({text_col}, ' ')) AS t FROM {table})
  WHERE t <> ''
),
vocab AS (
  SELECT t, COUNT(*)::BIGINT AS df FROM toks GROUP BY t
  ORDER BY df DESC, t LIMIT {vocab_size}
),
vt AS (SELECT toks.doc, toks.t FROM toks JOIN vocab ON toks.t = vocab.t),
pairs AS (
  SELECT a.t AS x, b.t AS y, COUNT(*)::BIGINT AS pair_count
  FROM vt a JOIN vt b ON a.doc = b.doc AND a.t < b.t
  GROUP BY 1, 2
)
SELECT p.x, p.y, p.pair_count, va.df AS x_df, vb.df AS y_df
FROM pairs p
JOIN vocab va ON va.t = p.x
JOIN vocab vb ON vb.t = p.y
WHERE p.pair_count >= {min_pair_count}
ORDER BY p.x, p.y
"""


def pmi_collocations(
    docs: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 200,
    min_pair_count: int = 2,
) -> ray.data.Dataset:
    """Pointwise-mutual-information collocation scores over the top-V
    token pairs: pmi_micro = floor(1e6 · ln((N·c_xy) / (c_x·c_y))) with
    N = document count, c_* = document frequencies / pair counts from
    :func:`token_cooccurrence`.

    Float discipline (the aa_micro pattern, graph/linkpred.py:149): both
    operands of the division are exact int64 products cast to double, so
    the ratio, the single libm ``ln`` call, and the floor are bit-identical
    to the DuckDB twin.  N·c_xy stays exact in a double while
    N·max(c) < 2^53 — at larger corpora switch the caller to df-fraction
    micro units first.

    Adds ONE scalar (the document count — a streaming count, no
    materialization) on top of the co-occurrence plan; scoring is a
    map-only pass over the V²-bounded pair table.
    """
    n_docs = np.int64(docs.count())
    pairs = token_cooccurrence(
        docs,
        text_col=text_col,
        id_col=id_col,
        vocab_size=vocab_size,
        min_pair_count=min_pair_count,
    )

    def score(t: pa.Table) -> pa.Table:
        cxy = t["pair_count"].to_numpy().astype(np.int64)
        num = (n_docs * cxy).astype(np.float64)
        den = (
            t["x_df"].to_numpy().astype(np.int64)
            * t["y_df"].to_numpy().astype(np.int64)
        ).astype(np.float64)
        pmi = np.floor(1_000_000.0 * np.log(num / den)).astype(np.int64)
        return t.append_column("pmi_micro", pa.array(pmi, pa.int64()))

    return pairs.map_batches(score, batch_format="pyarrow")


def pmi_oracle_sql(
    *,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 200,
    min_pair_count: int = 2,
) -> str:
    """DuckDB twin of :func:`pmi_collocations` — the co-occurrence twin
    plus the identical int64-product → double → ln → floor pipeline."""
    inner = cooccurrence_oracle_sql(
        table=table,
        text_col=text_col,
        id_col=id_col,
        vocab_size=vocab_size,
        min_pair_count=min_pair_count,
    )
    return f"""
WITH co AS ({inner}),
n AS (SELECT COUNT(*)::BIGINT AS n_docs FROM {table})
SELECT co.*,
       CAST(floor(1000000.0 * ln(
         CAST(n.n_docs * co.pair_count AS DOUBLE)
         / CAST(co.x_df * co.y_df AS DOUBLE))) AS BIGINT) AS pmi_micro
FROM co, n
"""
