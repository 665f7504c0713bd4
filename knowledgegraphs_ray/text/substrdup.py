"""Repeated-substring span detection — character-window exact substring
dedup in the style of "Deduplicating Training Data Makes Language Models
Better" (Lee et al., 2022): find every maximal character range of every
document whose fixed-length windows also occur elsewhere in the corpus
(any other position, any document), i.e. the actionable removal list for
substring-level dedup. Complements the token-shingle family
(``dedup/minhash.py`` probabilistic, ``dedup/setjoin.py`` exact-Jaccard,
``text/decontam.py`` cross-corpus): those answer document-level
questions; this one is span-level WITHIN the corpus. Relative to the
token-window family in ``dedup/spans.py`` (per-doc dup-window STATS and
token-level span REMOVAL): this module emits the maximal duplicated span
INVENTORY in character coordinates — the (doc_id, start, end) removal
list itself — and groups on a 128-bit composite key instead of a single
64-bit hash (collisions move from ~1e-13/pair to ~1e-32/pair, so the
span list is exact at any realistic corpus size, not just in
expectation).

Semantics (all 1-based, character positions — matching SQL ``substr``):
a window is every ``length``-char gram starting at positions 1, 1+stride,
1+2*stride, … with the last partial window dropped. A window is DUPLICATED
when its gram occurs ``min_count``+ times corpus-wide (self-repeats within
one document count — Lee et al.'s "other occurrence anywhere" rule).
Overlapping/adjacent duplicated windows of one document merge into maximal
spans (gaps-and-islands with gap = ``length``): output
``(doc_id, span_start, span_end, n_windows)`` with ``span_end`` exclusive.

Distributed plan (three bounded exchanges, windows never materialize):

1. **Count pass** — map-only window emission per block (vectorized byte
   gather + two independent Horner folds over the gram bytes = a 128-bit
   composite key; ASCII fast path reads the Arrow values buffer directly,
   non-ASCII docs take a per-doc char-exact fallback), ``np.unique`` down
   to per-block (key, count) partials, ``fastagg.merge_partials`` on the
   key. Only DISTINCT-gram partials move — never the windows.
2. **Dup filter** — keys with count >= min_count form the dup set:
   broadcast tier (``ray.put`` a sorted 128-bit array + ``searchsorted``
   membership inside a second map-only emission pass) below
   ``broadcast_limit`` dup keys, ``native_join`` on the (h1, h2)
   composite above it. The window stream is RECOMPUTED from the pruned
   parquet read, not cached — at 100 TB the re-scan is cheaper than
   holding O(chars/stride) rows in the object store.
3. **Span merge** — one sort of the SURVIVING windows by (doc, pos)
   (typically a small fraction of the corpus), then
   ``segrank.sorted_session_index`` (gap = length) and min/max/count
   partials per (doc, island) through ``merge_partials``.

Key-collision note: grams are grouped by the 128-bit (h1, h2) double
Horner fold, the same exactness class as the engine's md5-keyed joins
(``state/diff.py``) — expected collisions ≈ W^2 / 2^129 for W windows,
zero at any realistic corpus size.

Reference anchor: the reference dedups at whole-value granularity
(ElectricalTransformersDataset.java preprocessing, POextractor duplicate
row elimination); span-level substring dedup is part of this repo's
training-data extension surface (SURVEY.md §2 D-family).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from knowledgegraphs_ray.util.fastagg import merge_partials

# FNV-1a prime (shared with the minhash family) and an independent odd
# multiplier (golden-ratio constant) — two Horner folds over the same gram
# bytes give 128 independent key bits.
_C1 = np.uint64(1099511628211)
_C2 = np.uint64(0x9E3779B97F4A7C15) | np.uint64(1)

_SPAN_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("span_start", pa.int64()),
        ("span_end", pa.int64()),
        ("n_windows", pa.int64()),
    ]
)


def _fold_pair(mat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two Horner folds over the columns of an (n_windows, length) uint8
    gram matrix — O(length) python iterations of O(n_windows) numpy work,
    uint64 wrap-around IS the modulus."""
    h1 = np.zeros(mat.shape[0], dtype=np.uint64)
    h2 = np.zeros(mat.shape[0], dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(mat.shape[1]):
            col = mat[:, j].astype(np.uint64)
            h1 *= _C1
            h1 += col
            h2 *= _C2
            h2 += col
    return h1, h2


def _fold_bytes(b: bytes) -> tuple[int, int]:
    """Scalar twin of ``_fold_pair`` for the non-ASCII fallback."""
    h1 = np.uint64(0)
    h2 = np.uint64(0)
    with np.errstate(over="ignore"):
        for x in b:
            h1 = h1 * _C1 + np.uint64(x)
            h2 = h2 * _C2 + np.uint64(x)
    return int(h1.view(np.int64)), int(h2.view(np.int64))


def _window_arrays(
    block: pa.Table, *, id_col: str, text_col: str, length: int, stride: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """-> (h1, h2, doc_id, pos) int64 arrays for every full window in the
    block. ASCII docs go through the vectorized byte-gather path (one
    gather per gram byte from the Arrow values buffer); docs with
    multi-byte codepoints fall back to per-doc ``str`` slicing so POSITIONS
    AND GRAMS stay character-exact (hash = fold of the gram's UTF-8 bytes
    in both paths)."""
    arr = block[text_col].combine_chunks()
    n = len(arr)
    ids = block[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    if n == 0:
        z = np.empty(0, np.int64)
        return z, z, z, z
    # large_string blocks (>2 GiB of text) carry int64 offsets — read them
    # directly instead of casting down to string, which raises ArrowInvalid
    # past int32 offsets
    off_t = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offsets = np.frombuffer(arr.buffers()[1], dtype=off_t)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    buf = arr.buffers()[2]
    data = np.frombuffer(buf, dtype=np.uint8) if buf else np.empty(0, np.uint8)
    blens = np.diff(offsets)
    clens = pc.utf8_length(arr).fill_null(0).to_numpy(zero_copy_only=False)
    clens = clens.astype(np.int64)
    is_ascii = blens == clens  # byte offset == char position

    # --- vectorized ASCII path -------------------------------------------
    cnt = np.where(is_ascii & (blens >= length), (blens - length) // stride + 1, 0)
    total = int(cnt.sum())
    if total:
        doc_rep = np.repeat(np.arange(n), cnt)
        cum = np.concatenate([[0], np.cumsum(cnt)])
        within = np.arange(total) - cum[doc_rep]
        pos0 = within * stride  # 0-based char == byte offset
        abs_start = offsets[:-1][doc_rep] + pos0
        mat = data[abs_start[:, None] + np.arange(length)]
        h1, h2 = _fold_pair(mat)
        h1 = h1.view(np.int64)
        h2 = h2.view(np.int64)
        did = ids[doc_rep]
        pos = pos0 + 1  # 1-based, matching SQL substr
    else:
        h1 = h2 = did = pos = np.empty(0, np.int64)

    # --- char-exact fallback for multi-byte docs (rare path) -------------
    fb = np.flatnonzero(~is_ascii & (clens >= length))
    if len(fb):
        f_h1: list[int] = []
        f_h2: list[int] = []
        f_id: list[int] = []
        f_pos: list[int] = []
        for i in fb:
            s = arr[int(i)].as_py()
            for p in range(0, len(s) - length + 1, stride):
                a, b = _fold_bytes(s[p : p + length].encode("utf-8"))
                f_h1.append(a)
                f_h2.append(b)
                f_id.append(int(ids[i]))
                f_pos.append(p + 1)
        h1 = np.concatenate([h1, np.array(f_h1, np.int64)])
        h2 = np.concatenate([h2, np.array(f_h2, np.int64)])
        did = np.concatenate([did, np.array(f_id, np.int64)])
        pos = np.concatenate([pos, np.array(f_pos, np.int64)])
    return h1, h2, did, pos


def repeated_substring_spans(
    docs: ray.data.Dataset,
    *,
    length: int = 25,
    stride: int = 5,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_limit: int = 2_000_000,
    driver_limit: int = 5_000_000,
) -> ray.data.Dataset:
    """Maximal duplicated character spans per document — see module doc.
    Output: (doc_id, span_start, span_end, n_windows), span_end exclusive,
    sorted by (doc_id, span_start)."""
    assert length >= 1 and stride >= 1 and min_count >= 2

    def count_partials(block: pa.Table) -> pd.DataFrame:
        h1, h2, _, _ = _window_arrays(
            block, id_col=id_col, text_col=text_col, length=length, stride=stride
        )
        pair = np.ascontiguousarray(np.column_stack((h1, h2)))
        v = pair.view([("a", "<i8"), ("b", "<i8")]).ravel()
        uq, c = np.unique(v, return_counts=True)
        return pd.DataFrame(
            {"h1": uq["a"], "h2": uq["b"], "c": c.astype(np.int64)}
        )

    counts = merge_partials(
        docs.map_batches(count_partials, batch_format="pyarrow"),
        keys=["h1", "h2"],
        agg={"c": "sum"},
        driver_limit=driver_limit,
    )
    dup = counts.filter(expr=f"c >= {min_count}").materialize()
    n_dup = dup.count()
    if n_dup == 0:
        return ray.data.from_arrow(_SPAN_SCHEMA.empty_table())

    if n_dup <= broadcast_limit:
        # broadcast tier: sorted 128-bit key array, searchsorted membership
        # inside a second map-only emission pass — NO window shuffle at all
        dup_tbl = pa.concat_tables(ray.get(dup.to_arrow_refs()))
        keys = np.ascontiguousarray(
            np.column_stack(
                (
                    dup_tbl["h1"].to_numpy(zero_copy_only=False),
                    dup_tbl["h2"].to_numpy(zero_copy_only=False),
                )
            )
        ).view([("a", "<i8"), ("b", "<i8")]).ravel()
        order = np.argsort(keys)
        keys_ref = ray.put(keys[order])

        def emit_dup_windows(block: pa.Table) -> pa.Table:
            h1, h2, did, pos = _window_arrays(
                block, id_col=id_col, text_col=text_col, length=length, stride=stride
            )
            k = np.ascontiguousarray(np.column_stack((h1, h2))).view(
                [("a", "<i8"), ("b", "<i8")]
            ).ravel()
            ks = ray.get(keys_ref)
            loc = np.searchsorted(ks, k)
            loc[loc == len(ks)] = 0
            hit = ks[loc] == k
            return pa.table(
                {"doc_id": did[hit], "pos": pos[hit]},
                schema=pa.schema([("doc_id", pa.int64()), ("pos", pa.int64())]),
            )

        survivors = docs.map_batches(emit_dup_windows, batch_format="pyarrow")
    else:
        # join tier: hash-partitioned join on the 128-bit composite key —
        # the one regime where the windows themselves must move
        from knowledgegraphs_ray.extract.joins import native_join

        def emit_windows(block: pa.Table) -> pa.Table:
            h1, h2, did, pos = _window_arrays(
                block, id_col=id_col, text_col=text_col, length=length, stride=stride
            )
            return pa.table(
                {"h1": h1, "h2": h2, "doc_id": did, "pos": pos},
                schema=pa.schema(
                    [(c, pa.int64()) for c in ("h1", "h2", "doc_id", "pos")]
                ),
            )

        joined = native_join(
            docs.map_batches(emit_windows, batch_format="pyarrow"),
            dup.drop_columns(["c"]),
            left_on=("h1", "h2"),
            right_on=("h1", "h2"),
            num_partitions=max(8, int(ray.cluster_resources().get("CPU", 8))),
        )
        survivors = joined.select_columns(["doc_id", "pos"])

    survivors = survivors.materialize()
    if survivors.count() == 0:
        return ray.data.from_arrow(_SPAN_SCHEMA.empty_table())

    # span merge: gaps-and-islands over the surviving windows only
    from knowledgegraphs_ray.util.segrank import sorted_session_index

    islands = sorted_session_index(
        survivors,
        key_cols=["doc_id"],
        order_cols=["pos"],
        ts_col="pos",
        gap_us=length,
        idx_col="isl",
    )

    def island_partials(block: pa.Table) -> pd.DataFrame:
        import polars as pl

        return (
            pl.from_arrow(block)
            .group_by(["doc_id", "isl"])
            .agg(
                pl.col("pos").min().alias("span_start"),
                pl.col("pos").max().alias("last_pos"),
                pl.len().cast(pl.Int64).alias("n_windows"),
            )
            .to_pandas()
        )

    merged = merge_partials(
        islands.map_batches(island_partials, batch_format="pyarrow"),
        keys=["doc_id", "isl"],
        agg={"span_start": "min", "last_pos": "max", "n_windows": "sum"},
        driver_limit=driver_limit,
    )

    def finish(block: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": block["doc_id"].cast(pa.int64()),
                "span_start": block["span_start"].cast(pa.int64()),
                "span_end": pc.add(block["last_pos"].cast(pa.int64()), length),
                "n_windows": block["n_windows"].cast(pa.int64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow").sort(
        ["doc_id", "span_start"]
    )


def repeated_spans_oracle_sql(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    length: int = 25,
    stride: int = 5,
    min_count: int = 2,
) -> str:
    """DuckDB twin: scalar range()+unnest window generation (lateral range
    is unsupported), HAVING-count dup filter on the gram STRING (the engine
    groups by the 128-bit fold of the same bytes), lag/sum gaps-and-islands
    with the identical gap-= -length rule."""
    L, S = length, stride
    return f"""
WITH e AS (
  SELECT {id_col} AS doc_id, {text_col} AS txt,
         unnest(range(1, len({text_col}) - {L} + 2, {S})) AS n
  FROM {table}
), w AS (
  SELECT doc_id, CAST(n AS BIGINT) AS pos,
         substr(txt, CAST(n AS INTEGER), {L}) AS g
  FROM e
), c AS (
  SELECT g FROM w GROUP BY g HAVING count(*) >= {min_count}
), d AS (
  SELECT w.doc_id, w.pos FROM w JOIN c USING (g)
), s AS (
  SELECT doc_id, pos,
    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= {L}
         THEN 0 ELSE 1 END AS brk
  FROM d
), i AS (
  SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS isl
  FROM s
)
SELECT doc_id, min(pos) AS span_start, max(pos) + {L} AS span_end,
       count(*) AS n_windows
FROM i GROUP BY doc_id, isl ORDER BY doc_id, span_start
"""
