"""Training-data curation pipeline — the composition every large-scale
corpus build runs: language filter -> quality filter -> length filter ->
exact dedup -> cleaned corpus.

All filters are vectorized pyarrow expressions sharing their regexes with
the DuckDB oracle; dedup keeps min(doc_id) per distinct text. The output is
the "keep list" (doc ids) plus the per-stage survival counts for lineage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from knowledgegraphs_ray.dedup.exact import dedup_exact
from knowledgegraphs_ray.text.analysis import STOP_RE, TOKEN_RE


def clean_corpus(
    ds: ray.data.Dataset,
    *,
    lang: str | None = "en",
    lang_col: str = "lang",
    min_tokens: int = 20,
    max_punct_ratio: float = 0.2,
    min_stop_ratio: float = 0.0,
) -> ray.data.Dataset:
    """-> (doc_id, text, n_tokens) of surviving, deduplicated documents."""

    def filt(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks()
        keep = pc.is_valid(text)
        if lang is not None:
            keep = pc.and_(keep, pc.equal(batch[lang_col].combine_chunks(), lang))
        n_tok = pc.count_substring_regex(text, TOKEN_RE)
        keep = pc.and_(keep, pc.greater_equal(n_tok, min_tokens))
        n_chars = pc.cast(pc.utf8_length(text), pa.float64())
        n_punct = pc.cast(pc.count_substring_regex(text, "[.,;:!?]"), pa.float64())
        punct_ratio = pc.if_else(
            pc.greater(n_chars, 0.0), pc.divide(n_punct, n_chars), pa.scalar(0.0)
        )
        keep = pc.and_(keep, pc.less_equal(punct_ratio, max_punct_ratio))
        if min_stop_ratio > 0:
            n_stop = pc.cast(
                pc.count_substring_regex(pc.utf8_lower(text), STOP_RE), pa.float64()
            )
            stop_ratio = pc.divide(n_stop, pc.cast(pc.max_element_wise(n_tok, 1), pa.float64()))
            keep = pc.and_(keep, pc.greater_equal(stop_ratio, min_stop_ratio))
        out = batch.filter(keep)
        return out.append_column(
            "n_tokens",
            pc.cast(pc.count_substring_regex(out["text"].combine_chunks(), TOKEN_RE), pa.int64()),
        )

    filtered = ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)
    deduped = dedup_exact(filtered.select_columns(["doc_id", "text"]), column="text", id_column="doc_id")
    # re-attach token counts after dedup (cheap recompute beats carrying the
    # column through the shuffle)
    def retok(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "n_tokens",
            pc.cast(
                pc.count_substring_regex(batch["text"].combine_chunks(), TOKEN_RE),
                pa.int64(),
            ),
        )

    return deduped.map_batches(retok, batch_format="pyarrow").select_columns(
        ["doc_id", "n_copies", "n_tokens"]
    )


def clean_corpus_oracle_sql(
    *, lang: str = "en", min_tokens: int = 20, max_punct_ratio: float = 0.2
) -> str:
    return f"""
WITH f AS (
  SELECT doc_id, text FROM documents
  WHERE text IS NOT NULL AND lang = '{lang}'
    AND len(regexp_extract_all(text, '{TOKEN_RE}')) >= {min_tokens}
    AND (CASE WHEN length(text) > 0
         THEN len(regexp_extract_all(text, '[.,;:!?]')) / CAST(length(text) AS DOUBLE)
         ELSE 0.0 END) <= {max_punct_ratio}
)
SELECT min(doc_id) AS doc_id, count(*) AS n_copies,
       CAST(len(regexp_extract_all(min(text), '{TOKEN_RE}')) AS BIGINT) AS n_tokens
FROM f GROUP BY text
"""


def _u64_threshold(rate: float) -> int:
    """Exact integer sampling threshold: floor(clamp(rate) * 2^64)."""
    r = min(max(rate, 0.0), 1.0)
    return int(r * (1 << 64)) if r < 1.0 else (1 << 64)


def stratified_sample(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    stratum_col: str = "lang",
    rates: dict[str, float],
    default_rate: float = 0.0,
    hash_fn: str = "md5",
) -> ray.data.Dataset:
    """Deterministic per-stratum sampling for corpus mixing: a row survives
    iff hash_u64(id) < floor(rate(stratum) * 2^64) — an EXACT integer
    compare. Map-only, seedless and reproducible at any parallelism.

    hash_fn="md5" (default): bit-for-bit reproducible in SQL
    (('0x' || substr(md5(id), 1, 16))::UBIGINT against the same integer
    threshold) — the value-oracle tier; md5 costs ~1µs/row.
    hash_fn="splitmix": fully vectorized splitmix64 over INTEGER ids — the
    100-TB tier (no SQL twin; parallelism-invariance tested instead)."""
    import hashlib

    import numpy as np
    import pandas as pd

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        if hash_fn == "splitmix":
            from knowledgegraphs_ray.pipelines.transcripts import _splitmix64

            h = _splitmix64(df[id_col].to_numpy().astype(np.uint64))
        else:
            ids = df[id_col].astype(str).to_numpy()
            h = np.fromiter(
                (
                    int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
                    for s in ids
                ),
                dtype=np.uint64,
                count=len(ids),
            )
        strata = df[stratum_col].astype(str).to_numpy()
        keep = np.zeros(len(df), dtype=bool)
        for stratum in pd.unique(strata):
            t = _u64_threshold(rates.get(stratum, default_rate))
            mask = strata == stratum
            if t >= (1 << 64):
                keep[mask] = True
            else:
                keep[mask] = h[mask] < np.uint64(t)
        return df[keep]

    return ds.map_batches(pick, batch_format="pandas")


def stratified_sample_oracle_sql(
    *,
    id_col: str = "doc_id",
    stratum_col: str = "lang",
    rates: dict[str, float],
    default_rate: float = 0.0,
    table: str = "documents",
    out_cols: str = "doc_id, lang",
) -> str:
    """SQL twin: HUGEINT compare against the SAME integer thresholds (the
    UBIGINT hash promotes to HUGEINT — exact, no float rounding)."""
    case = " ".join(
        f"WHEN '{s}' THEN {_u64_threshold(r)}" for s, r in sorted(rates.items())
    )
    return (
        f"SELECT {out_cols} FROM {table} WHERE "
        f"CAST(('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 16))::UBIGINT AS HUGEINT) "
        f"< CAST(CASE {stratum_col} {case} ELSE {_u64_threshold(default_rate)} END AS HUGEINT)"
    )


def pack_sequences(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    budget: int = 2048,
    strategy: str = "bfd",
) -> ray.data.Dataset:
    """Sequence packing for training batches: assign documents to packs so
    each pack's token sum stays <= ``budget`` (sorted-decreasing per
    block — packing is a block-local decision, so the operator is map-only
    and scales embarrassingly; cross-block packing would buy ~nothing and
    cost a shuffle). Documents longer than the budget become single-doc
    packs flagged ``oversize``.

    ``strategy="bfd"`` (default): best-fit-decreasing over a bisect-sorted
    free list — O(rows x log packs), the production-block-size path (FFD's
    linear scan over open packs is O(rows x packs), quadratic when most
    items open their own pack). ``strategy="ffd"``: exact first-fit-
    decreasing (reference behavior for comparison). Both carry the same
    11/9-OPT worst-case bound; pack counts on real length distributions
    differ by <2%.

    -> (id, n_tokens, pack_id, pack_slot, oversize); ``pack_id`` is the
    pack's first (largest) document id — globally unique and deterministic
    at any parallelism given the same blocks."""
    import numpy as np
    import pandas as pd

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    token_col: pd.Series([], dtype="int64"),
                    "pack_id": pd.Series([], dtype="int64"),
                    "pack_slot": pd.Series([], dtype="int64"),
                    "oversize": pd.Series([], dtype="bool"),
                }
            )
        d = df[[id_col, token_col]].sort_values(
            [token_col, id_col], ascending=[False, True], kind="mergesort"
        )
        ids = d[id_col].to_numpy()
        toks = d[token_col].to_numpy().astype(np.int64)
        pack_first: list[int] = []  # first doc id per open pack
        pack_free: list[int] = []  # remaining budget per open pack
        assign = np.empty(len(d), dtype=np.int64)
        slot = np.empty(len(d), dtype=np.int64)
        if strategy == "bfd":
            import bisect

            free_sorted: list[tuple[int, int]] = []  # (free, pack_idx), sorted
            for i in range(len(d)):
                t = int(toks[i])
                placed = False
                if t <= budget:
                    # tightest pack with free >= t; tuple order breaks free
                    # ties on the smaller pack idx (deterministic)
                    j = bisect.bisect_left(free_sorted, (t, -1))
                    if j < len(free_sorted):
                        free, p = free_sorted.pop(j)
                        bisect.insort(free_sorted, (free - t, p))
                        assign[i] = p
                        placed = True
                if not placed:
                    pack_first.append(int(ids[i]))
                    p = len(pack_first) - 1
                    bisect.insort(free_sorted, (max(budget - t, 0), p))
                    assign[i] = p
        elif strategy == "ffd":
            for i in range(len(d)):  # FFD: first open pack that fits
                t = int(toks[i])
                placed = False
                if t <= budget:
                    for p, free in enumerate(pack_free):
                        if t <= free:
                            pack_free[p] = free - t
                            assign[i] = p
                            placed = True
                            break
                if not placed:
                    pack_first.append(int(ids[i]))
                    pack_free.append(max(budget - t, 0))
                    assign[i] = len(pack_first) - 1
        else:
            raise ValueError(f"unknown packing strategy: {strategy!r}")
        counts = np.zeros(len(pack_first), dtype=np.int64)
        for i in range(len(d)):
            slot[i] = counts[assign[i]]
            counts[assign[i]] += 1
        first = np.array(pack_first, dtype=np.int64)
        return pd.DataFrame(
            {
                id_col: ids,
                token_col: toks,
                "pack_id": first[assign],
                "pack_slot": slot,
                "oversize": toks > budget,
            }
        )

    return ds.map_batches(pack, batch_format="pandas")


def seeded_shuffle(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    seed: int = 0,
    hash_fn: str = "md5",
    pos_col: str = "pos",
) -> ray.data.Dataset:
    """Deterministic global shuffle for training-order randomization:
    ``pos`` = the row's 0-based position under ``ORDER BY h(seed:id), id``.

    Unlike ``Dataset.random_shuffle`` (seeded but parallelism-dependent),
    the permutation here is a pure function of (seed, id) — identical at any
    block count, resumable, and value-oracle-checkable. The sort is the one
    all-to-all exchange; the rank is the segrank block scan (no extra
    shuffle). hash_fn="md5" is the SQL-twin tier; "splitmix" the vectorized
    100-TB tier (same splitmix64 as stratified_sample).
    """
    import hashlib

    def key(df: pd.DataFrame) -> pd.DataFrame:
        if hash_fn == "splitmix":
            from knowledgegraphs_ray.pipelines.transcripts import _splitmix64

            ids = df[id_col].to_numpy().astype(np.uint64)
            h = _splitmix64(ids + np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15))
        else:
            keys = (f"{seed}:{i}" for i in df[id_col].astype(str))
            h = np.fromiter(
                (
                    int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
                    for s in keys
                ),
                dtype=np.uint64,
                count=len(df),
            )
        return df.assign(__shuffle_key=h)

    from knowledgegraphs_ray.util.segrank import sorted_segment_rank

    keyed = ds.map_batches(key, batch_format="pandas").add_column(
        "__seg", lambda df: pd.Series(np.zeros(len(df), dtype=np.int8), index=df.index)
    )
    ranked = sorted_segment_rank(
        keyed,
        key_cols=["__seg"],
        order_cols=["__shuffle_key", id_col],
        rank_col=pos_col,
        dtype="int64",
    )
    return ranked.drop_columns(["__seg", "__shuffle_key"])


def seeded_shuffle_oracle_sql(
    *, table: str = "documents", id_col: str = "doc_id", seed: int = 0
) -> str:
    """DuckDB twin of ``seeded_shuffle(hash_fn="md5")``."""
    h = (
        f"('0x' || substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1, 16))::UBIGINT"
    )
    return (
        f"SELECT {id_col}, CAST(row_number() OVER (ORDER BY {h}, {id_col}) - 1 "
        f"AS BIGINT) AS pos FROM {table}"
    )


def _md5_u64(keys) -> np.ndarray:
    """uint64 from the first 8 md5 bytes of each string — the SQL-twin hash
    (('0x' || substr(md5(k),1,16))::UBIGINT in DuckDB)."""
    import hashlib

    return np.fromiter(
        (int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big") for s in keys),
        dtype=np.uint64,
    )


def mixture_budget(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    stratum_col: str = "lang",
    token_col: str = "n_tokens",
    budgets: dict[str, int],
    default_budget: int = 0,
    seed: int = 0,
    hash_fn: str = "md5",
) -> ray.data.Dataset:
    """Token-BUDGET source mixing — the counterpart of ``stratified_sample``
    when the mixture recipe is stated in tokens per source, not rates
    ("1B tokens of en, 200M of de"): within each stratum take documents in
    seeded-hash priority order until the stratum's token budget is filled.
    A document is kept iff its INCLUSIVE running token sum under
    ``ORDER BY h(seed:id), id`` stays <= budget — so the boundary document
    that would overflow the budget is dropped, making the selection a pure
    function of (seed, budgets, corpus) at any parallelism.

    One range-partitioned sort on (stratum, hash) is the only exchange; the
    running sum is the :func:`sorted_segment_cumsum` block scan (O(num_blocks)
    driver metadata) and the budget cut is a map-only filter. hash_fn="md5"
    is the SQL-twin tier; "splitmix" the vectorized integer-id 100-TB tier.

    -> (id, stratum, token, cum_tokens) of selected rows."""

    def key(df: pd.DataFrame) -> pd.DataFrame:
        if hash_fn == "splitmix":
            from knowledgegraphs_ray.pipelines.transcripts import _splitmix64

            ids = df[id_col].to_numpy().astype(np.uint64)
            h = _splitmix64(ids + np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15))
        else:
            h = _md5_u64(f"{seed}:{i}" for i in df[id_col].astype(str))
        return df.assign(__mix_h=h)

    from knowledgegraphs_ray.util.segrank import sorted_segment_cumsum

    cum = sorted_segment_cumsum(
        ds.map_batches(key, batch_format="pandas"),
        key_cols=[stratum_col],
        order_cols=["__mix_h", id_col],
        val_col=token_col,
        out_col="cum_tokens",
    )

    def cut(batch: pa.Table) -> pa.Table:
        strata = batch[stratum_col].combine_chunks().cast(pa.string())
        lim = np.full(batch.num_rows, default_budget, dtype=np.int64)
        sv = strata.to_numpy(zero_copy_only=False)
        for s, b in budgets.items():
            lim[sv == s] = b
        keep = pc.less_equal(batch["cum_tokens"], pa.array(lim, pa.int64()))
        return batch.filter(keep).drop_columns(["__mix_h"])

    return cum.map_batches(cut, batch_format="pyarrow")


def mixture_budget_oracle_sql(
    *,
    budgets: dict[str, int],
    default_budget: int = 0,
    seed: int = 0,
    table: str = "documents",
    id_col: str = "doc_id",
    stratum_col: str = "lang",
) -> str:
    """DuckDB twin of ``mixture_budget(hash_fn="md5")`` over raw document
    text (n_tokens = TOKEN_RE match count, same expression as the Ray path)."""
    case = " ".join(f"WHEN '{s}' THEN {int(b)}" for s, b in sorted(budgets.items()))
    return f"""
WITH t AS (
  SELECT {id_col}, {stratum_col},
         CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS BIGINT) AS n_tokens,
         ('0x' || substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1, 16))::UBIGINT AS h
  FROM {table} WHERE text IS NOT NULL
), c AS (
  SELECT {id_col}, {stratum_col}, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY {stratum_col} ORDER BY h, {id_col}
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT {id_col}, {stratum_col}, n_tokens, CAST(cum AS BIGINT) AS cum_tokens
FROM c
WHERE cum <= CASE {stratum_col} {case} ELSE {int(default_budget)} END
"""


def chunk_sequences(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    chunk_size: int = 128,
    stride: int = 96,
) -> ray.data.Dataset:
    """Document -> training-sequence chunking with overlap: a document of
    ``n`` tokens yields chunks covering token spans
    ``[i*stride, min(i*stride + chunk_size, n))`` for
    ``i in 0..n_chunks-1`` with
    ``n_chunks = 1 if n <= chunk_size else ceil((n - chunk_size)/stride) + 1``
    (the sliding-window convention: the last window is the first one whose
    end reaches ``n``; ``stride < chunk_size`` gives ``chunk_size - stride``
    tokens of overlap for context continuity).

    Map-only row expansion — each batch emits its own chunks via np.repeat
    and an arange-minus-offsets index, no shuffle, no Python per row.

    -> (id, chunk_idx, tok_start, tok_end, chunk_tokens), all int64."""
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")

    def expand(batch: pa.Table) -> pa.Table:
        n = batch[token_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n_chunks = np.where(
            n <= 0,
            0,
            np.where(n <= chunk_size, 1, (n - chunk_size + stride - 1) // stride + 1),
        ).astype(np.int64)
        total = int(n_chunks.sum())
        offsets = np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks)
        idx = np.arange(total, dtype=np.int64) - offsets
        rep_n = np.repeat(n, n_chunks)
        start = idx * stride
        end = np.minimum(start + chunk_size, rep_n)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, n_chunks)),
                "chunk_idx": pa.array(idx, pa.int64()),
                "tok_start": pa.array(start, pa.int64()),
                "tok_end": pa.array(end, pa.int64()),
                "chunk_tokens": pa.array(end - start, pa.int64()),
            }
        )

    return ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)


def chunk_sequences_oracle_sql(
    *,
    chunk_size: int = 128,
    stride: int = 96,
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of ``chunk_sequences`` over raw document text
    (n_tokens = TOKEN_RE match count); generate_series is the lateral
    row-expansion twin of the arange-minus-offsets kernel."""
    return f"""
WITH t AS (
  SELECT {id_col},
         CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS BIGINT) AS n
  FROM {table} WHERE text IS NOT NULL
), k AS (
  SELECT {id_col}, n,
         CASE WHEN n <= 0 THEN 0
              WHEN n <= {chunk_size} THEN 1
              ELSE (n - {chunk_size} + {stride} - 1) // {stride} + 1 END AS n_chunks
  FROM t
), e AS (
  SELECT {id_col}, n,
         UNNEST(generate_series(0, CAST(n_chunks - 1 AS BIGINT))) AS i
  FROM k WHERE n_chunks > 0
)
SELECT {id_col},
       CAST(i AS BIGINT) AS chunk_idx,
       CAST(i * {stride} AS BIGINT) AS tok_start,
       CAST(least(i * {stride} + {chunk_size}, n) AS BIGINT) AS tok_end,
       CAST(least(i * {stride} + {chunk_size}, n) - i * {stride} AS BIGINT)
         AS chunk_tokens
FROM e
"""


def weighted_sample(
    ds: ray.data.Dataset,
    *,
    k: int = 100,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
    seed: int = 7,
) -> ray.data.Dataset:
    """Exact weighted sample WITHOUT replacement (Efraimidis–Spirakis A-ES):
    per row draw u = (md5(seed:id)[:8] + 1) / 2^64 and keep the k rows with
    the SMALLEST -ln(u) / w — each row's inclusion probability is
    proportional to its weight, and the selection is a pure function of
    (seed, ids, weights): identical at any parallelism, resumable, and
    value-oracle-checkable.

    Map-only at corpus scale: every block prunes to its local k before the
    tiny (num_blocks × k)-row final sort — the corpus never shuffles.

    Float discipline for the SQL twin: -ln(u) is quantized to integer
    micro-nats with Arrow's round (half-away, same as DuckDB's), absorbing
    the 1-2 ulp libm spread between numpy and DuckDB ln; the rank key is
    then CAST(L AS DOUBLE) / w — a correctly-rounded division of exactly
    represented operands, bitwise identical on both sides. Ties (same
    quantized key) break by id. Zero/negative weights are clamped to 1.
    """
    import hashlib

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        h = np.fromiter(
            (
                int.from_bytes(hashlib.md5(f"{seed}:{i}".encode()).digest()[:8], "big")
                for i in df[id_col].astype(str)
            ),
            dtype=np.uint64,
            count=len(df),
        )
        # +1 in the INTEGER domain, matching the twin's UBIGINT (h + 1)
        # before the cast — double(h) + 1.0 differs by 1 ulp from
        # double(h + 1) for ~1/4096 of hashes (h near 2^64 where the
        # float grid is coarser than 1), so the parity would otherwise
        # rest on the micro-nat quantization absorbing the spread.
        # uint64 wraparound at h == 2^64-1 has probability 2^-64 — the
        # twin would overflow-error there first; acceptable.
        u = (h + np.uint64(1)).astype(np.float64) / 18446744073709551616.0
        nats = pa.array(-np.log(u), type=pa.float64())
        L = pc.cast(pc.round(pc.multiply(nats, 1_000_000.0)), pa.int64())
        w = np.maximum(df[weight_col].to_numpy().astype(np.float64), 1.0)
        skey = L.to_numpy(zero_copy_only=False).astype(np.float64) / w
        out = df.assign(__wskey=skey)
        # local prune: only this block's k best survive the exchange
        return out.nsmallest(min(k, len(out)), ["__wskey", id_col]).reset_index(
            drop=True
        )

    pruned = ds.map_batches(keyed, batch_format="pandas")
    return (
        pruned.sort(["__wskey", id_col])
        .limit(k)
        .drop_columns(["__wskey"])
    )


def weighted_sample_oracle_sql(
    *,
    table: str = "documents",
    k: int = 100,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
    seed: int = 7,
    out_cols: str = "doc_id, n_chars",
) -> str:
    """DuckDB twin of ``weighted_sample`` — same md5 uniform, same micro-nat
    quantization, same exact division and tie-break."""
    h = (
        f"('0x' || substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1, 16))::UBIGINT"
    )
    return (
        f"SELECT {out_cols} FROM ("
        f"SELECT *, CAST(round(-ln(({h} + 1) / 18446744073709551616.0) "
        f"* 1000000.0) AS BIGINT) AS L FROM {table}) "
        f"ORDER BY CAST(L AS DOUBLE) / greatest({weight_col}, 1), {id_col} "
        f"LIMIT {k}"
    )


def temperature_sample(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    stratum_col: str = "lang",
    tau: float = 0.5,
    total_k: int = 1000,
) -> ray.data.Dataset:
    """Temperature-flattened source mixing (the mT5/XLM-R recipe): resample
    strata so stratum i's share of the output follows q_i = n_i^tau / sum_j
    n_j^tau — tau=1 keeps natural proportions, tau->0 flattens to uniform,
    lifting low-resource sources. The per-stratum keep RATE is derived from
    the data itself (r_i = total_k * q_i / n_i, capped at 1), unlike
    :func:`stratified_sample` where the caller states the rates.

    Two passes, both 100-TB shapes: (1) per-stratum counts via per-block
    ``value_counts`` partials -> ``merge_partials`` — only (stratum, n) rows
    ever move; (2) map-only seeded-hash threshold filter with the tiny
    threshold dict captured in the closure (strata are vocabulary-sized).

    Float discipline for the SQL twin: the only float op is the temperature
    weight mw_i = floor(pow(n_i, tau) * 1e6) computed with libm ``math.pow``
    (bit-equal to DuckDB's ``pow`` — verified over 3000 random (n, tau)); the
    keep threshold is then PURE INTEGER: t_i = min(2^64, (total_k * mw_i *
    2^64) // (sum_mw * n_i)), Python bigints here, HUGEINT ``//`` in the
    twin. The twin saturates HUGEINT only when total_k * mw_i >= 2^63
    (i.e. total_k * n_i^tau >= ~9.2e12) — the engine itself never overflows.

    A row whose stratum is NULL is dropped (both sides). Output keeps all
    input columns; selection is a pure function of (corpus, tau, total_k) at
    any parallelism — counts are exact integers, the filter is map-only.
    """
    import math

    from knowledgegraphs_ray.util.fastagg import merge_partials

    def part(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[stratum_col].dropna().astype(str).value_counts()
        return pd.DataFrame(
            {stratum_col: vc.index, "n": vc.to_numpy().astype("int64")}
        )

    counts_df = merge_partials(
        ds.map_batches(part, batch_format="pandas"),
        keys=[stratum_col],
        agg={"n": "sum"},
    ).to_pandas()
    counts = dict(zip(counts_df[stratum_col], counts_df["n"].astype(int)))
    mw = {s: math.floor(math.pow(float(n), tau) * 1e6) for s, n in counts.items()}
    s_mw = sum(mw.values())
    thr = {
        s: min(1 << 64, (int(total_k) * mw[s] * (1 << 64)) // (s_mw * counts[s]))
        for s in counts
    }

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[stratum_col].notna()]
        if df.empty:
            return df
        h = _md5_u64(df[id_col].astype(str))
        strata = df[stratum_col].astype(str).to_numpy()
        keep = np.zeros(len(df), dtype=bool)
        for stratum in pd.unique(strata):
            t = thr.get(stratum, 0)
            mask = strata == stratum
            if t >= (1 << 64):
                keep[mask] = True
            else:
                keep[mask] = h[mask] < np.uint64(t)
        return df[keep]

    return ds.map_batches(pick, batch_format="pandas")


def temperature_sample_oracle_sql(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    stratum_col: str = "lang",
    tau: float = 0.5,
    total_k: int = 1000,
    out_cols: str = "doc_id, lang",
) -> str:
    """DuckDB twin of ``temperature_sample`` — identical libm pow, identical
    integer threshold arithmetic in HUGEINT (2^64 fits: HUGEINT is 128-bit)."""
    two64 = "CAST('18446744073709551616' AS HUGEINT)"
    return f"""
WITH counts AS (
  SELECT {stratum_col} AS stratum, CAST(COUNT(*) AS HUGEINT) AS n
  FROM {table} WHERE {stratum_col} IS NOT NULL GROUP BY 1
), w AS (
  SELECT stratum, n,
         CAST(floor(pow(CAST(n AS DOUBLE), {tau!r}) * 1000000) AS HUGEINT) AS mw
  FROM counts
), tot AS (SELECT SUM(mw) AS s_mw FROM w),
thr AS (
  SELECT stratum,
         LEAST({two64},
               (CAST({int(total_k)} AS HUGEINT) * mw * {two64}) // (s_mw * n)) AS t
  FROM w, tot
)
SELECT {out_cols} FROM {table} d JOIN thr ON thr.stratum = d.{stratum_col}
WHERE CAST(('0x' || substr(md5(CAST(d.{id_col} AS VARCHAR)), 1, 16))::UBIGINT AS HUGEINT)
      < thr.t
"""


def assign_splits(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    splits: dict[str, float] | None = None,
    seed: int = 17,
) -> ray.data.Dataset:
    """Deterministic train/val/test assignment — the split every training
    corpus needs, as a pure function of (seed, id) so it is reproducible at
    any parallelism, stable under re-runs, and new rows never reshuffle old
    assignments. A row's bucket is the first split whose CUMULATIVE integer
    threshold (floor(cum_fraction * 2^64)) exceeds hash_u64(seed:id).
    Map-only; the SQL twin is a CASE over the same integer thresholds.

    ``splits`` insertion order defines the bucket order (default
    train 0.9 / val 0.05 / test 0.05); fractions must sum to <= 1, any
    remainder falls into the LAST bucket (so defaults cover every row).
    """
    splits = splits or {"train": 0.9, "val": 0.05, "test": 0.05}
    names = list(splits)
    cum, bounds = 0.0, []
    for name in names:
        cum += splits[name]
        bounds.append(_u64_threshold(cum))
    bounds[-1] = 1 << 64  # remainder -> last bucket

    def label(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df.assign(split=pd.Series([], dtype="object"))
        h = _md5_u64(f"{seed}:{i}" for i in df[id_col].astype(str))
        lab = np.full(len(df), names[-1], dtype=object)
        done = np.zeros(len(df), dtype=bool)
        for name, t in zip(names, bounds):
            hit = ~done if t >= (1 << 64) else ~done & (h < np.uint64(t))
            lab[hit] = name
            done |= hit
        return df.assign(split=lab)

    return ds.map_batches(label, batch_format="pandas")


def assign_splits_oracle_sql(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    splits: dict[str, float] | None = None,
    seed: int = 17,
    out_cols: str = "doc_id",
) -> str:
    """DuckDB twin: the same md5 hash against the same cumulative integer
    thresholds (HUGEINT compare — exact)."""
    splits = splits or {"train": 0.9, "val": 0.05, "test": 0.05}
    names = list(splits)
    cum, whens = 0.0, []
    h = f"CAST(('0x' || substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1, 16))::UBIGINT AS HUGEINT)"
    for name in names[:-1]:
        cum += splits[name]
        whens.append(f"WHEN {h} < CAST({_u64_threshold(cum)} AS HUGEINT) THEN '{name}'")
    case = "CASE " + " ".join(whens) + f" ELSE '{names[-1]}' END"
    return f"SELECT {out_cols}, {case} AS split FROM {table}"


def leakage_safe_splits(
    ds: ray.data.Dataset,
    components,
    *,
    id_col: str = "doc_id",
    splits: dict[str, float] | None = None,
    seed: int = 17,
    broadcast_limit: int = 50_000_000,
) -> ray.data.Dataset:
    """Train/val/test assignment at near-dup-COMPONENT granularity —
    the leakage-safe split: every member of a near-duplicate family lands
    in the SAME bucket, so a train document's near-copy can never appear
    in val/test. ``components`` is the (doc_id, component) output of
    ``components_from_pairs`` / ``components_by_propagation``; documents
    outside every component are their own representative.

    The hash is over the REPRESENTATIVE (``rep``), then the identical
    cumulative-threshold labeling as :func:`assign_splits` — so singleton
    docs get exactly the assign_splits bucket and families move as a unit.

    Scale shape: the component table is bounded by near-dup MEMBERSHIP
    (pairs-verified docs only), so it broadcasts (one ``ray.put``, pandas
    merge per block — map-only) up to ``broadcast_limit`` rows; above that
    the corpus LEFT-joins it with Ray's hash-partitioned join. The corpus
    text never moves in either tier. -> (id_col, rep, split)
    """
    import ray

    comp = (
        components
        if isinstance(components, ray.data.Dataset)
        else ray.data.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": components["doc_id"].astype("int64"),
                    "component": components["component"].astype("int64"),
                }
            )
        )
    )
    n_members = comp.count()
    ids = ds.select_columns([id_col])
    if n_members == 0:
        with_rep = ids.map_batches(
            lambda df: df.assign(rep=df[id_col].astype("int64")),
            batch_format="pandas",
        )
    elif n_members <= broadcast_limit:
        cdf = comp.to_pandas().rename(columns={"doc_id": id_col})
        ref = ray.put(cdf)

        class AttachRep:
            def __init__(self, ref):
                self.ref = ref
                self._c = None

            def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
                if self._c is None:
                    self._c = ray.get(self.ref)
                m = df.merge(self._c, how="left", on=id_col)
                rep = m["component"].fillna(m[id_col]).astype("int64")
                return pd.DataFrame({id_col: m[id_col], "rep": rep})

        with_rep = ids.map_batches(AttachRep(ref), batch_format="pandas")
    else:
        from knowledgegraphs_ray.extract.joins import native_join

        joined = native_join(
            ids, comp, left_on=id_col, right_on="doc_id", how="left_outer"
        )
        with_rep = joined.map_batches(
            lambda df: pd.DataFrame(
                {
                    id_col: df[id_col],
                    "rep": df["component"].fillna(df[id_col]).astype("int64"),
                }
            ),
            batch_format="pandas",
        )
    labeled = assign_splits(with_rep, id_col="rep", splits=splits, seed=seed)
    return labeled.select_columns([id_col, "rep", "split"])


def leakage_safe_splits_oracle_sql(
    components_sql: str,
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    splits: dict[str, float] | None = None,
    seed: int = 17,
) -> str:
    """DuckDB twin: COALESCE(component, id) as the hashed representative,
    then the assign_splits CASE over the same integer thresholds."""
    inner = (
        f"(SELECT d.{id_col}, CAST(COALESCE(c.component, d.{id_col}) AS BIGINT)"
        f" AS rep FROM {table} d LEFT JOIN ({components_sql}) c"
        f" ON c.doc_id = d.{id_col})"
    )
    return assign_splits_oracle_sql(
        table=inner, id_col="rep", splits=splits, seed=seed,
        out_cols=f"{id_col}, rep",
    )


def quota_cap(
    ds: ray.data.Dataset,
    *,
    key_col: str = "source",
    id_col: str = "doc_id",
    cap: int = 100,
    seed: int = 11,
) -> ray.data.Dataset:
    """Per-key document quota — the web-curation "at most N pages per
    domain" cap: within each ``key_col`` group keep the ``cap`` rows with
    the smallest seeded hash of their id. Hash order (not arrival or score
    order) makes the survivor set a uniform random-but-deterministic sample
    of each group, stable under re-runs and parallelism.

    Built on :func:`~knowledgegraphs_ray.util.topk.topk_per_group` —
    per-block prune to ``cap`` first, so the exchange carries at most
    ``cap × blocks`` rows per key, never the full group.
    -> (key_col, id_col, hkey, rank); hkey is the signed-shifted u64 hash
    (order-preserving int64 view, exact in the SQL twin as HUGEINT - 2^63).
    """
    from knowledgegraphs_ray.util.topk import topk_per_group

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df.assign(hkey=pd.Series([], dtype="int64"))
        h = _md5_u64(f"{seed}:{i}" for i in df[id_col].astype(str))
        return df.assign(hkey=(h ^ np.uint64(1 << 63)).view(np.int64))

    keyed = ds.select_columns([key_col, id_col]).map_batches(
        attach, batch_format="pandas"
    )
    return topk_per_group(
        keyed,
        key_cols=[key_col],
        score_col="hkey",
        id_col=id_col,
        k=cap,
        descending=False,
    )


def quota_cap_oracle_sql(
    *,
    table: str = "documents",
    key_col: str = "source",
    id_col: str = "doc_id",
    cap: int = 100,
    seed: int = 11,
) -> str:
    """DuckDB twin: row_number over the identical signed-shifted hash."""
    from knowledgegraphs_ray.util.topk import topk_per_group_oracle_sql

    h = (
        f"CAST(CAST(('0x' || substr(md5('{seed}:' || CAST({id_col} AS"
        f" VARCHAR)), 1, 16))::UBIGINT AS HUGEINT)"
        f" - 9223372036854775808 AS BIGINT)"
    )
    inner = topk_per_group_oracle_sql(
        key_cols=[key_col],
        score_expr=h,
        id_col=id_col,
        k=cap,
        table=table,
        descending=False,
    )
    return (
        f"SELECT {key_col}, {id_col}, score AS hkey, rank FROM ({inner})"
    )
