"""Global distinct over slim near-duplicate pair rows.

Shared by the multi-band sketch dedups (simhash, embedding-LSH): in their
``dedup="exchange"`` tier every band/table whose bucket retains BOTH members
emits the pair, so a pair that collides in k bands appears up to k times and
needs one global distinct. Pair rows are slim (two int64 ids + one numeric),
and near-duplicate pairs are rare relative to the corpus, so the exchange
moves orders of magnitude less data than the text/vector shuffle that
produced the buckets.

No per-group Python: per-block ``drop_duplicates`` partials
(combine-before-shuffle), then ONE native hash aggregate — ``Min`` over the
carried columns, which is semantics-preserving because every duplicate
emission of a pair carries the same distance (integers) or the same cosine
up to BLAS last-ulp (Min picks a partitioning-independent representative).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data
from ray.data.aggregate import Min

from knowledgegraphs_ray.util.blocks import compact_nonempty


def distinct_pairs(
    ds: ray.data.Dataset,
    *,
    keys: tuple[str, ...] = ("doc_a", "doc_b"),
    carry: tuple[str, ...],
    schema: pa.Schema,
) -> ray.data.Dataset:
    """Distinct ``keys`` rows, keeping the min of each ``carry`` column."""
    local = ds.map_batches(
        lambda df: df.drop_duplicates(list(keys)), batch_format="pandas"
    )
    local = compact_nonempty(local, schema)
    if local.count() == 0:
        return local
    return local.groupby(list(keys)).aggregate(
        *[Min(on=c, alias_name=c) for c in carry]
    )
