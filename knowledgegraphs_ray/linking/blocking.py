"""Sorted-neighborhood blocking — the classic record-linkage candidate
generator (Hernandez & Stolfo 1995): sort all records by a blocking key,
then every pair of records within a sliding window of ``window`` positions
becomes a comparison candidate. Linear candidate count (n * (window-1)
pairs) instead of the quadratic all-pairs join — the standard cheap
complement to the engine's similarity-driven candidate tiers
(``linking/index.py`` IDF candidates, ``dedup/setjoin.py`` prefix
filtering, ``dedup/minhash.py`` LSH): SNM catches near-duplicates whose
lexical prefix agrees even when token sets diverge.

Distributed shape: ONE sort (by key + id — a total order, so the window is
deterministic), then a slim positional halo: each block ships only the
(window-1)-row head of its id column to its predecessor — O(window) values
per block boundary, never the payload — and emits its pairs with
``window-1`` vectorized shifted-slice zips. No groupby, no join, no
driver data path; the sort is the only exchange, exactly the SNM promise.

Output: (id_a, id_b) with id_a the positionally-EARLIER record (global
sort rank r pairs with ranks r+1 … r+window-1), sorted by (id_a, id_b).

Reference anchor: the reference generates comparison candidates per
annotation via exact/IDF lookup (AnnotationIndex / CandidateGenerator
paths); windowed blocking is this repo's scale-path extension for the
record-linkage family (SURVEY.md §2 J/A-family).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

_PAIR_SCHEMA = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())])


@ray.remote
def _id_head(block: pa.Table, id_col: str, k: int) -> pa.Array:
    """First k ids of a block — the only halo a predecessor needs."""
    return block[id_col].combine_chunks().slice(0, min(k, block.num_rows))


@ray.remote
def _pair_block(block: pa.Table, id_col: str, window: int, *next_heads) -> pa.Table:
    """Pairs (row r, row r+d) for d in 1..window-1, with the tail rows
    completing their windows from the successor blocks' id heads."""
    ids = block[id_col].combine_chunks().to_numpy(zero_copy_only=False)
    ids = ids.astype(np.int64)
    n = len(ids)
    if n == 0:
        return _PAIR_SCHEMA.empty_table()
    halo = [h.to_numpy(zero_copy_only=False).astype(np.int64) for h in next_heads]
    ext = np.concatenate([ids, *halo]) if halo else ids
    w = window
    outs_a: list[np.ndarray] = []
    outs_b: list[np.ndarray] = []
    for d in range(1, w):
        m = min(n, len(ext) - d)  # rows whose rank+d partner exists
        if m <= 0:
            break
        outs_a.append(ids[:m])
        outs_b.append(ext[d : d + m])
    if not outs_a:
        return _PAIR_SCHEMA.empty_table()
    return pa.table(
        {"id_a": np.concatenate(outs_a), "id_b": np.concatenate(outs_b)},
        schema=_PAIR_SCHEMA,
    )


def sorted_neighborhood_pairs(
    ds: ray.data.Dataset,
    *,
    key_cols: list[str],
    id_col: str,
    window: int = 4,
    assume_sorted: bool = False,
) -> ray.data.Dataset:
    """Candidate pairs of records within ``window`` positions of the
    (key_cols + id_col) sort order — see module doc."""
    assert window >= 2
    sorted_ds = ds if assume_sorted else ds.sort(key_cols + [id_col])
    refs = sorted_ds.to_arrow_refs()
    k = window - 1
    heads = [_id_head.remote(r, id_col, k) for r in refs]
    from knowledgegraphs_ray.util.blocks import _num_rows

    counts = ray.get([_num_rows.remote(r) for r in refs])
    if sum(counts) < 2:  # no pair exists; keep a typed empty result
        return ray.data.from_arrow(_PAIR_SCHEMA.empty_table())

    out = []
    for i, r in enumerate(refs):
        need, nxt = k, []
        j = i + 1
        while j < len(refs) and need > 0:
            nxt.append(heads[j])
            need -= min(counts[j], k)
            j += 1
        out.append(_pair_block.remote(r, id_col, window, *nxt))
    return ray.data.from_arrow_refs(out).sort(["id_a", "id_b"])


def snm_oracle_sql(
    *,
    table: str,
    id_expr: str,
    key_exprs: list[str],
    window: int = 4,
) -> str:
    """DuckDB twin: row_number over the identical total order, self-join
    on a rank gap in [1, window-1]."""
    order = ", ".join([*key_exprs, id_expr])
    return f"""
WITH r AS (
  SELECT {id_expr} AS id,
         row_number() OVER (ORDER BY {order}) AS rn
  FROM {table}
)
SELECT a.id AS id_a, b.id AS id_b
FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + {window - 1}
ORDER BY id_a, id_b
"""
