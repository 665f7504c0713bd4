"""SimHash near-duplicate detection.

64-bit SimHash per document: each token hash votes ±1 on every bit, the sign
of the per-bit sum is the fingerprint. Near-dups = small Hamming distance.
Candidate generation by band-exact match (pigeonhole: distance <= d ⇒ at
least one of d+1 bands equal). Vectorized: bit-unpack token hashes with
numpy, per-doc sums via ``np.add.reduceat``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import polars as pl
import pyarrow as pa
import ray.data

_SEED = 7


def _md5_token_hashes(tokens: np.ndarray) -> np.ndarray:
    """uint64 token hashes = first 8 bytes of md5 (big-endian) — the
    DuckDB-reproducible hash ('0x' || substr(md5(t),1,16))::UBIGINT. Hash
    cost is paid per UNIQUE token, not per occurrence."""
    import hashlib

    uniq, inv = np.unique(tokens, return_inverse=True)
    hu = np.fromiter(
        (
            int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
            for t in uniq
        ),
        dtype=np.uint64,
        count=len(uniq),
    )
    return hu[inv]


def simhash_batch(
    batch: pa.Table,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "polars",
) -> pd.DataFrame:
    """hash_fn="polars" (default): seeded polars hash — the fast scale path.
    hash_fn="md5": md5-derived token hashes, bit-for-bit reproducible in
    DuckDB SQL (the value-oracle path; ~unique-token md5 cost per batch)."""
    df = pl.from_arrow(batch.select([id_col, text_col]))
    toks = df.select(
        pl.col(id_col),
        pl.col(text_col).str.to_lowercase().str.extract_all("[a-z0-9_]+").alias("t"),
    )
    lens = toks["t"].list.len().to_numpy().astype(np.int64)
    # drop_nulls: exploding an empty list yields one null row (offset desync)
    flat = toks.explode("t").drop_nulls("t")
    if hash_fn == "md5":
        h = _md5_token_hashes(flat["t"].to_numpy())
    else:
        h = (
            flat.select(pl.col("t").hash(seed=_SEED).alias("h"))["h"]
            .to_numpy()
            .astype(np.uint64)
        )
    ids = df[id_col].to_numpy()
    n = len(ids)
    # (n_tokens, 64) ±1 votes
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    ) * 2 - 1
    offsets = np.concatenate([[0], np.cumsum(lens)])[:-1]
    sums = np.full((n, 64), -1, dtype=np.int64)  # empty doc -> fingerprint 0
    nonempty = lens > 0
    if len(h) and nonempty.any():
        # reduceat over non-empty docs only (empty docs share start indices
        # with their neighbours and would corrupt the segments)
        sums[nonempty] = np.add.reduceat(bits, offsets[nonempty], axis=0)
    fp = ((sums > 0).astype(np.uint64) * (np.uint64(1) << np.arange(64, dtype=np.uint64))).sum(
        axis=1
    )
    return pd.DataFrame({id_col: ids, "simhash": fp.astype(np.uint64)})


def simhash_bands(
    batch: pa.Table, *, id_col: str = "doc_id", n_bands: int = 4
) -> pd.DataFrame:
    """fingerprint rows -> (doc_id, band_id, band_bits) for pigeonhole LSH
    (catches every pair within Hamming distance n_bands - 1)."""
    df = batch.to_pandas()
    fp = df["simhash"].to_numpy().astype(np.uint64)
    width = 64 // n_bands
    mask = np.uint64((1 << width) - 1)
    out = []
    for b in range(n_bands):
        out.append(
            pd.DataFrame(
                {
                    id_col: df[id_col],
                    "band_id": b,
                    "band_bits": (fp >> np.uint64(b * width)) & mask,
                    "simhash": fp,  # carried for in-bucket Hamming verification
                }
            )
        )
    return pd.concat(out, ignore_index=True)


def hamming(a: np.ndarray, b: np.ndarray | np.uint64) -> np.ndarray:
    x = np.bitwise_xor(a, b)
    # popcount via bit tricks (vectorized, no Python loop)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    with np.errstate(over="ignore"):
        return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


def simhash_pairs_from_fingerprints(
    fps: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    max_distance: int = 3,
    max_bucket: int = 500,
    dedup: str = "exchange",
) -> ray.data.Dataset:
    """(id, simhash) rows -> (doc_a, doc_b, distance) near-dup pairs.

    ``dedup="exchange"`` (default): every band whose bucket retains BOTH
    members (after the deterministic sort-by-id ``max_bucket`` truncation)
    emits the pair, then one global distinct over the slim pair rows
    (``_pairs.distinct_pairs`` — per-block partials + a native hash
    aggregate). Pigeonhole exactness then holds whenever ANY of a pair's
    colliding buckets stays under the cap — strictly stronger than the old
    first-collision rule, which permanently dropped a pair whose FIRST
    colliding bucket was truncated (r3 verdict wart #2).

    ``dedup="local"``: the shuffle-free first-collision rule (emit only
    where the pair's first colliding band is this bucket — decidable
    locally since both fingerprints are in hand). Exact only while no
    colliding bucket exceeds ``max_bucket``."""
    n_bands = max_distance + 1
    banded = fps.map_batches(
        lambda b: simhash_bands(b, id_col=id_col, n_bands=n_bands),
        batch_format="pyarrow",
    )

    width = 64 // n_bands
    mask = np.uint64((1 << width) - 1)
    empty = pd.DataFrame(
        {
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
            "distance": pd.Series([], dtype="int64"),
        }
    )
    local_dedup = dedup == "local"

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(id_col).sort_values(id_col).head(max_bucket)
        ids = g[id_col].to_numpy()
        if len(ids) < 2:
            return empty
        fp = g["simhash"].to_numpy().astype(np.uint64)
        iu, ju = np.triu_indices(len(ids), k=1)
        d = hamming(fp[iu], fp[ju])
        keep = d <= max_distance
        iu, ju, d = iu[keep], ju[keep], d[keep]
        if not len(iu):
            return empty
        if local_dedup:
            band_id = int(g["band_id"].iloc[0])
            shifts = (np.arange(n_bands, dtype=np.uint64) * np.uint64(width))[None, :]
            ba = (fp[iu][:, None] >> shifts) & mask
            bb = (fp[ju][:, None] >> shifts) & mask
            first = (ba == bb).argmax(axis=1)  # this bucket guarantees >= 1 hit
            keep2 = first == band_id
            iu, ju, d = iu[keep2], ju[keep2], d[keep2]
        return pd.DataFrame(
            {
                "doc_a": ids[iu].astype("int64"),
                "doc_b": ids[ju].astype("int64"),
                "distance": d.astype("int64"),
            }
        )

    emitted = banded.groupby(["band_id", "band_bits"]).map_groups(
        pairs, batch_format="pandas"
    )
    if local_dedup:
        return emitted
    from knowledgegraphs_ray.dedup._pairs import distinct_pairs

    schema = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("distance", pa.int64())]
    )
    return distinct_pairs(emitted, carry=("distance",), schema=schema)


def simhash_near_dup_pairs(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_distance: int = 3,
    max_bucket: int = 500,
    hash_fn: str = "polars",
    dedup: str = "exchange",
) -> ray.data.Dataset:
    """-> (doc_a, doc_b, distance) pairs with Hamming distance <= max_distance.

    n_bands = max_distance + 1 guarantees no false negatives (pigeonhole);
    see ``simhash_pairs_from_fingerprints`` for the truncation/dedup tiers."""
    fps = ds.map_batches(
        lambda b: simhash_batch(b, id_col=id_col, text_col=text_col, hash_fn=hash_fn),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return simhash_pairs_from_fingerprints(
        fps,
        id_col=id_col,
        max_distance=max_distance,
        max_bucket=max_bucket,
        dedup=dedup,
    )
