"""Cross-document duplicated n-gram spans — the scalable approximation of
exact-substring dedup (Lee et al. 2022, "Deduplicating Training Data Makes
Language Models Better"): a w-token window whose text occurs >= 2 times
anywhere in the corpus marks a duplicated span; spans are reported
(:func:`duplicated_window_stats`) or cut (:func:`remove_duplicated_spans`).

Scale shape (the reason this is windows+hashes, not suffix arrays):

* Window hashing is block-local — token 64-bit hashes (polars ``hash``,
  fixed seed, process-deterministic) rolled into a w-token Horner
  polynomial mod 2^64 with numpy, so DOCUMENT TEXT NEVER SHUFFLES.
* Pass 1 counts window hashes: per-block ``value_counts`` partials ->
  ``fastagg.merge_partials`` (combine-before-shuffle); only (hash, n)
  rows move.
* Pass 2 marks occurrences: below ``broadcast_limit`` duplicated hashes
  the dup set ships once via ``ray.put`` and every block resolves its own
  documents locally (zero shuffle — the common case after paragraph
  dedup has removed boilerplate). Above it, windows flow as 16-byte
  (doc_id, whash) rows through one ``bucket_join`` against the dup table
  — O(windows x 16 B), bounded by ``stride``.
* ``stride`` is the documented scale knob: stride s emits windows at every
  s-th token, cutting the window stream s-fold; detection then catches
  duplicated runs of >= w + s - 1 tokens instead of >= w (the standard
  sampling trade — suffix-array exactness needs machinery Ray Data
  cannot express as a batch transform).

Determinism contract with the DuckDB oracle: the oracle counts windows by
their literal TEXT; the engine counts by 64-bit hash. Equal up to hash
collisions (~1e-13 per window pair at test scale; a collision only ever
OVER-counts a dup). Output columns are integers — exact hash compare.

Reference analogue: the reference dedups full annotation/triple sets
(D1/D5); this is the sub-document generalization a pre-training corpus
needs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import polars as pl
import pyarrow as pa
import ray
import ray.data

from knowledgegraphs_ray.text.analysis import TOKEN_RE
from knowledgegraphs_ray.util.fastagg import merge_partials

_B = np.uint64(0x100000001B3)  # FNV-ish odd multiplier for the Horner roll


def _doc_windows(
    batch: pa.Table, *, id_col: str, text_col: str, w: int, stride: int, lower: bool
):
    """-> (doc_row_idx, start, whash, lens, toks_flat_original) numpy views
    for one block; windows never cross document boundaries."""
    df = pl.from_arrow(batch.select([id_col, text_col]))
    orig = df[text_col].str.extract_all(TOKEN_RE)
    toks = orig.list.eval(pl.element().str.to_lowercase()) if lower else orig
    lens = toks.list.len().to_numpy().astype(np.int64)
    flat = toks.explode().drop_nulls()  # empty lists explode to null rows
    th = flat.hash(seed=0).to_numpy().astype(np.uint64, copy=False)
    T = len(th)
    n_win_total = T - w + 1
    if n_win_total <= 0:
        empty = np.empty(0, dtype=np.int64)
        return empty, empty, empty, lens, orig
    # Horner roll, vectorized over all start positions at once (w passes)
    W = np.zeros(n_win_total, dtype=np.uint64)
    for k in range(w):
        W = W * _B + th[k : k + n_win_total]
    did = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    starts_per_doc = np.concatenate(([0], np.cumsum(lens)[:-1]))
    valid = did[: n_win_total] == did[w - 1 :]
    if stride > 1:
        offset = np.arange(n_win_total, dtype=np.int64) - starts_per_doc[
            did[:n_win_total]
        ]
        valid &= offset % stride == 0
    j = np.nonzero(valid)[0]
    return (
        did[j],
        (j - starts_per_doc[did[j]]).astype(np.int64),
        W[j].view(np.int64),
        lens,
        orig,
    )


def _dup_hash_table(
    docs: ray.data.Dataset,
    *,
    id_col: str,
    text_col: str,
    w: int,
    stride: int,
    lower: bool,
    driver_limit: int,
) -> ray.data.Dataset:
    """Pass 1: (whash,) rows for every window hash with corpus count >= 2."""

    def block(batch: pa.Table) -> pa.Table:
        _, _, wh, _, _ = _doc_windows(
            batch, id_col=id_col, text_col=text_col, w=w, stride=stride, lower=lower
        )
        u, c = np.unique(wh, return_counts=True)
        return pa.table(
            {"whash": pa.array(u, pa.int64()), "n": pa.array(c, pa.int64())}
        )

    partials = docs.map_batches(block, batch_format="pyarrow", zero_copy_batch=True)
    merged = merge_partials(
        partials, keys=["whash"], agg={"n": "sum"}, driver_limit=driver_limit
    )
    return merged.map_batches(
        lambda df: df[df["n"] >= 2][["whash"]], batch_format="pandas"
    )


def _dup_array(dup: ray.data.Dataset) -> np.ndarray:
    """collect the (small) dup-hash table; an EMPTY merged Dataset loses its
    column schema entirely, so 0 rows short-circuits to an empty array."""
    if dup.count() == 0:
        return np.empty(0, dtype=np.int64)
    return dup.to_pandas()["whash"].to_numpy()


def _member(wh: np.ndarray, sorted_dup: np.ndarray) -> np.ndarray:
    """membership of wh in the sorted dup-hash array (empty-safe)."""
    if len(sorted_dup) == 0 or len(wh) == 0:
        return np.zeros(len(wh), dtype=bool)
    pos = np.searchsorted(sorted_dup, wh)
    inb = pos < len(sorted_dup)
    out = np.zeros(len(wh), dtype=bool)
    out[inb] = sorted_dup[pos[inb]] == wh[inb]
    return out


class _StatsBroadcast:
    """Tier A: dup-hash set broadcast once; every block doc-local."""

    def __init__(self, ref, *, id_col, text_col, w, stride, lower):
        self.ref, self.id_col, self.text_col = ref, id_col, text_col
        self.w, self.stride, self.lower = w, stride, lower
        self._d = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._d is None:
            self._d = np.sort(ray.get(self.ref))
        did, _, wh, lens, _ = _doc_windows(
            batch,
            id_col=self.id_col,
            text_col=self.text_col,
            w=self.w,
            stride=self.stride,
            lower=self.lower,
        )
        n_docs = len(lens)
        n_win = np.bincount(did, minlength=n_docs).astype(np.int64)
        isdup = _member(wh, self._d)
        n_dup = np.bincount(did[isdup], minlength=n_docs).astype(np.int64)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "n_windows": pa.array(n_win, pa.int64()),
                "n_dup_windows": pa.array(n_dup, pa.int64()),
            }
        )


def duplicated_window_stats(
    docs: ray.data.Dataset,
    *,
    w: int = 8,
    stride: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    lower: bool = True,
    broadcast_limit: int = 2_000_000,
    driver_limit: int = 5_000_000,
) -> ray.data.Dataset:
    """-> (id_col, n_windows, n_dup_windows) per document: how many of its
    w-token windows (at ``stride``) are duplicated anywhere in the corpus."""
    dup = _dup_hash_table(
        docs,
        id_col=id_col,
        text_col=text_col,
        w=w,
        stride=stride,
        lower=lower,
        driver_limit=driver_limit,
    ).materialize()
    if dup.count() <= broadcast_limit:
        ref = ray.put(_dup_array(dup))
        return docs.map_batches(
            _StatsBroadcast(
                ref, id_col=id_col, text_col=text_col, w=w, stride=stride, lower=lower
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    # Tier B: dup set itself is corpus-scale — windows flow as 16-byte rows
    # through one partitioned hash join; doc text still never shuffles.
    from knowledgegraphs_ray.extract.joins import bucket_join, native_join

    def emit(batch: pa.Table) -> pa.Table:
        did, _, wh, _, _ = _doc_windows(
            batch, id_col=id_col, text_col=text_col, w=w, stride=stride, lower=lower
        )
        ids = batch[id_col].take(pa.array(did, pa.int64()))
        return pa.table({id_col: ids, "whash": pa.array(wh, pa.int64())})

    win = docs.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)
    hits = bucket_join(win, dup, left_on="whash", right_on="whash", how="inner")
    dup_counts = merge_partials(
        hits.map_batches(
            lambda df: df.groupby(id_col, as_index=False).size().rename(
                columns={"size": "n_dup_windows"}
            ),
            batch_format="pandas",
        ),
        keys=[id_col],
        agg={"n_dup_windows": "sum"},
        driver_limit=driver_limit,
    ).map_batches(
        # empty partial blocks float-poison the key dtype; pin it for the join
        lambda df: df.astype({id_col: "int64", "n_dup_windows": "int64"}),
        batch_format="pandas",
    )

    def nwin(batch: pa.Table) -> pa.Table:
        did, _, _, lens, _ = _doc_windows(
            batch, id_col=id_col, text_col=text_col, w=w, stride=stride, lower=lower
        )
        n_win = np.bincount(did, minlength=len(lens)).astype(np.int64)
        return pa.table(
            {id_col: batch[id_col], "n_windows": pa.array(n_win, pa.int64())}
        )

    base = docs.map_batches(nwin, batch_format="pyarrow", zero_copy_batch=True)
    joined = native_join(
        base, dup_counts, left_on=id_col, right_on=id_col, how="left_outer"
    )
    return joined.map_batches(
        lambda df: df.assign(
            n_dup_windows=df["n_dup_windows"].fillna(0).astype("int64")
        )[[id_col, "n_windows", "n_dup_windows"]],
        batch_format="pandas",
    )


def duplicated_window_stats_oracle_sql(
    *,
    w: int = 8,
    stride: int = 1,
    table: str = "documents",
    id_col: str = "doc_id",
    lower: bool = True,
) -> str:
    """DuckDB twin counting windows by literal text (the semantic truth the
    hash-based engine approximates collision-free)."""
    expr = "lower(text)" if lower else "text"
    step = f", {stride}" if stride > 1 else ""
    return f"""
WITH tok AS (
  SELECT {id_col}, regexp_extract_all({expr}, '{TOKEN_RE}') AS toks FROM {table}
),
win AS (
  SELECT {id_col}, array_to_string(toks[i:i+{w - 1}], ' ') AS wtext
  FROM tok, unnest(range(1, len(toks) - {w} + 2{step})) AS r(i)
  WHERE len(toks) >= {w}
),
cnt AS (SELECT wtext, count(*) AS c FROM win GROUP BY wtext),
stats AS (
  SELECT w.{id_col},
         CAST(count(*) AS BIGINT) AS n_windows,
         CAST(count(*) FILTER (WHERE c >= 2) AS BIGINT) AS n_dup_windows
  FROM win w JOIN cnt USING (wtext) GROUP BY w.{id_col}
)
SELECT d.{id_col},
       COALESCE(s.n_windows, 0) AS n_windows,
       COALESCE(s.n_dup_windows, 0) AS n_dup_windows
FROM {table} d LEFT JOIN stats s USING ({id_col})
""".strip()


class _RemoveBroadcast:
    """Cut every token covered by a duplicated window; rebuild the text of
    AFFECTED docs as space-joined surviving tokens (token-normalized —
    byte-exact cuts need match offsets Arrow/polars don't expose);
    untouched docs keep their original text byte-for-byte."""

    def __init__(self, ref, *, id_col, text_col, w, stride, lower, keep_empty):
        self.ref, self.id_col, self.text_col = ref, id_col, text_col
        self.w, self.stride, self.lower = w, stride, lower
        self.keep_empty = keep_empty
        self._d = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._d is None:
            self._d = np.sort(ray.get(self.ref))
        did, starts, wh, lens, orig = _doc_windows(
            batch,
            id_col=self.id_col,
            text_col=self.text_col,
            w=self.w,
            stride=self.stride,
            lower=self.lower,
        )
        isdup = _member(wh, self._d)
        n_docs = len(lens)
        doc_starts = np.concatenate(([0], np.cumsum(lens)))
        T = int(doc_starts[-1])
        # scatter-diff coverage over the flat token axis
        diff = np.zeros(T + 1, dtype=np.int64)
        gs = doc_starts[did[isdup]] + starts[isdup]
        np.add.at(diff, gs, 1)
        np.add.at(diff, gs + self.w, -1)
        covered = np.cumsum(diff[:T]) > 0
        n_removed = np.zeros(n_docs, dtype=np.int64)
        if covered.any():
            seg = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
            n_removed = np.bincount(seg[covered], minlength=n_docs).astype(np.int64)
        texts = batch[self.text_col].to_pandas().to_numpy(dtype=object)
        touched = np.nonzero(n_removed > 0)[0]
        if len(touched):
            flat_orig = orig.explode().drop_nulls().to_numpy()
            for i in touched:  # touched docs only — dup spans are the rare case
                lo, hi = doc_starts[i], doc_starts[i + 1]
                keep = ~covered[lo:hi]
                texts[i] = " ".join(flat_orig[lo:hi][keep])
        out = batch.set_column(
            batch.schema.get_field_index(self.text_col),
            self.text_col,
            pa.array(texts, pa.string()),
        ).append_column("n_removed_tokens", pa.array(n_removed, pa.int64()))
        if not self.keep_empty:
            import pyarrow.compute as pc

            out = out.filter(pc.not_equal(out[self.text_col], ""))
        return out


def remove_duplicated_spans(
    docs: ray.data.Dataset,
    *,
    w: int = 8,
    stride: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    lower: bool = True,
    keep_empty: bool = False,
    broadcast_limit: int = 2_000_000,
    driver_limit: int = 5_000_000,
) -> ray.data.Dataset:
    """-> the input columns (text rewritten) + ``n_removed_tokens``; every
    token covered by a corpus-duplicated w-token window is cut. Docs whose
    whole text was duplicated are dropped unless ``keep_empty``.

    Two tiers: below ``broadcast_limit`` duplicated hashes the dup set
    ships once and every block cuts locally (text never shuffles); above
    it, (doc_id, start, whash) window rows flow through one hash join
    against the dup table and the per-doc cut positions come back as a
    (doc_id, starts) table joined onto the corpus — text shuffles exactly
    once, windows as 24-byte rows.
    """
    dup = _dup_hash_table(
        docs,
        id_col=id_col,
        text_col=text_col,
        w=w,
        stride=stride,
        lower=lower,
        driver_limit=driver_limit,
    ).materialize()
    n_dup = dup.count()
    if n_dup > broadcast_limit:
        return _remove_join_tier(
            docs, dup, id_col=id_col, text_col=text_col, w=w, stride=stride,
            lower=lower, keep_empty=keep_empty,
        )
    ref = ray.put(_dup_array(dup))
    return docs.map_batches(
        _RemoveBroadcast(
            ref,
            id_col=id_col,
            text_col=text_col,
            w=w,
            stride=stride,
            lower=lower,
            keep_empty=keep_empty,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _remove_join_tier(
    docs: ray.data.Dataset,
    dup: ray.data.Dataset,
    *,
    id_col: str,
    text_col: str,
    w: int,
    stride: int,
    lower: bool,
    keep_empty: bool,
) -> ray.data.Dataset:
    """Scale tier: dup-hash set too large to broadcast. Window rows hash-
    join the dup table; per-doc cut starts aggregate as per-block string
    partials (a doc's windows scatter across whash buckets, so fragments
    merge per doc afterwards — the merge table is affected-doc-sized)."""
    import pandas as pd

    from knowledgegraphs_ray.extract.joins import bucket_join, native_join

    def wins(batch: pa.Table) -> pa.Table:
        did, starts, wh, _, _ = _doc_windows(
            batch, id_col=id_col, text_col=text_col, w=w, stride=stride,
            lower=lower,
        )
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids[did], pa.int64()),
                "start": pa.array(starts, pa.int64()),
                "whash": pa.array(wh, pa.int64()),
            }
        )

    windows = docs.map_batches(wins, batch_format="pyarrow", zero_copy_batch=True)
    hits = bucket_join(
        windows, dup, left_on="whash", right_on="whash", how="inner"
    )

    # co-locate each doc's hit rows in one bucket (hash of doc id), then
    # aggregate starts per doc with ONE vectorized polars group_by per
    # bucket — no per-doc Python, docs never straddle buckets
    def add_bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # bucket_join's per-bucket pandas merge can float-upcast int columns
        # in buckets where one side was empty; restore exact int64 here
        batch = pa.table(
            {
                id_col: pc.cast(batch[id_col], pa.int64()),
                "start": pc.cast(batch["start"], pa.int64()),
            }
        )
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            b = (ids * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(58)
        return batch.append_column("__b", pa.array(b.astype(np.int64), pa.int64()))

    def bucket_agg(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group.select([id_col, "start"]))
        agg = df.group_by(id_col).agg(
            dup_starts=pl.col("start").cast(pl.Utf8).str.join(",")
        )
        return agg.to_arrow().cast(
            pa.schema([(id_col, pa.int64()), ("dup_starts", pa.string())])
        )

    _starts_schema = pa.schema([(id_col, pa.int64()), ("dup_starts", pa.string())])

    def fix_schema(t: pa.Table) -> pa.Table:
        # empty groupby partitions arrive column-less (Ray empty-block
        # quirk); the downstream hash join needs one constant schema
        if t.num_columns == 0:
            return _starts_schema.empty_table()
        return t.cast(_starts_schema)

    starts_tbl = (
        hits.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__b")
        .map_groups(bucket_agg, batch_format="pyarrow")
        .map_batches(fix_schema, batch_format="pyarrow", zero_copy_batch=True)
    )
    # bucket_join, not Dataset.join: Ray's hash-join finalize builds
    # column-less right tables for partitions with no right rows (sparse
    # affected-doc tables guarantee some), which Acero rejects
    joined = bucket_join(
        docs, starts_tbl, left_on=id_col, right_on=id_col, how="left",
        right_cols=[id_col, "dup_starts"],
    )
    return joined.map_batches(
        _CutWithStarts(
            id_col=id_col, text_col=text_col, w=w, lower=lower,
            keep_empty=keep_empty,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


class _CutWithStarts:
    """Cut tokens covered by the per-doc dup-window starts carried in the
    ``dup_starts`` column (comma-joined, unordered — sorted after parse);
    same coverage/rebuild semantics as the broadcast kernel."""

    def __init__(self, *, id_col, text_col, w, lower, keep_empty):
        self.id_col, self.text_col = id_col, text_col
        self.w, self.lower, self.keep_empty = w, lower, keep_empty

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        starts_col = batch["dup_starts"].to_pylist()
        batch = batch.drop_columns(["dup_starts"])
        texts = batch[self.text_col].to_pandas().to_numpy(dtype=object)
        n_docs = len(texts)
        n_removed = np.zeros(n_docs, dtype=np.int64)
        df = pl.from_arrow(batch.select([self.text_col]))
        toks = df[self.text_col].str.extract_all(TOKEN_RE)
        for i, raw in enumerate(starts_col):
            if not raw:
                continue
            starts = np.unique(np.array(raw.split(","), dtype=np.int64))
            t = toks[i].to_numpy()
            covered = np.zeros(len(t) + 1, dtype=np.int64)
            np.add.at(covered, np.minimum(starts, len(t)), 1)
            np.add.at(covered, np.minimum(starts + self.w, len(t)), -1)
            mask = np.cumsum(covered[: len(t)]) > 0
            n_removed[i] = int(mask.sum())
            texts[i] = " ".join(t[~mask])
        out = batch.set_column(
            batch.schema.get_field_index(self.text_col),
            self.text_col,
            pa.array(texts, pa.string()),
        ).append_column("n_removed_tokens", pa.array(n_removed, pa.int64()))
        if not self.keep_empty:
            out = out.filter(pc.not_equal(out[self.text_col], ""))
        return out
