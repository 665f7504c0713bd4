"""Incremental cross-corpus NEAR-duplicate detection: MinHash-LSH probe of
an arriving shard against a PERSISTED band index of everything ingested so
far.

``dedup/incremental.py`` answers "has this EXACT text been seen before?"
(Bloom + verify join over content hashes). This module answers the fuzzy
version — "is this new document a near-duplicate of ANY historical
document?" — the stage a continuously-crawled corpus needs so boilerplate
re-crawls never re-enter the training set. Reference analogue: the
reference dedups full annotation/triple sets within one run (D1/D5
``AnnotationsDictionary.java``); cross-RUN near-dedup is the pre-training
generalization.

Scale shape (why this is an index probe, not a re-run of
``minhash_candidate_pairs`` over history ∪ shard):

* The index is the HISTORY'S BAND TABLE — (band_id, band_hash, doc_id)
  rows, B×~24 bytes/doc — plus the signature table (P×8 bytes/doc), both
  written once as partitioned Parquet (``save_minhash_index``). History
  TEXT is never re-read, never re-hashed, never shuffled on later shards.
* Probing shuffles only the SHARD's band rows into a hash join against the
  index on (band_id, band_hash) — O(shard) exchange per ingest step, not
  O(history + shard). Candidate pairs are slim (two int64 ids), distinct'd
  with per-block partials, then verified by joining both signature tables
  on (slot-agreement >= threshold) — the same join-tier verify as
  ``minhash_candidate_pairs``, nothing corpus-sized on the driver.
* Hot buckets (boilerplate band_hash shared by thousands of history docs)
  inflate only the matching-pair output, which is bounded by TRUE near-dup
  volume after verification; the join itself is hash-partitioned so a hot
  key lands in one partition at worst. Upstream exact dedup (the curation
  chain runs it first) removes identical-text floods before they reach
  this stage.

Determinism: same seeded constants as ``MinHashKernel`` ⇒ identical pairs
at any parallelism, and the whole path admits an exact DuckDB oracle
(``incremental_minhash_oracle_sql`` — the shared CTE prefix of
``minhash_oracle_sql`` with the candidate join restricted to
history × shard).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from knowledgegraphs_ray.dedup._pairs import distinct_pairs
from knowledgegraphs_ray.dedup.minhash import (
    MinHashKernel,
    _oracle_cte_prefix,
    _sig_matrix,
)
from knowledgegraphs_ray.extract.joins import native_join
from knowledgegraphs_ray.util.blocks import compact_nonempty

_EMPTY_PROBED = pd.DataFrame(
    {
        "new_doc": np.empty(0, "int64"),
        "hist_doc": np.empty(0, "int64"),
        "est_jaccard": np.empty(0, "float64"),
    }
)


@dataclass
class MinHashIndex:
    """The persisted-index handle: two slim datasets + the sketch params.

    ``bands``: (doc_id int64, band_id int64, band_hash int64) — the LSH
    buckets. ``sigs``: (doc_id int64, sig fixed_size_binary(n_perm*8)) —
    for verification. Params must match between build and probe; the
    loader enforces it.
    """

    bands: ray.data.Dataset
    sigs: ray.data.Dataset
    id_col: str = "doc_id"
    text_col: str = "text"
    n_perm: int = 128
    n_bands: int = 16
    shingle_k: int = 3

    def params(self) -> dict:
        return {
            "id_col": self.id_col,
            "text_col": self.text_col,
            "n_perm": self.n_perm,
            "n_bands": self.n_bands,
            "shingle_k": self.shingle_k,
        }

    def kernel(self) -> MinHashKernel:
        return MinHashKernel(
            id_col=self.id_col,
            text_col=self.text_col,
            shingle_k=self.shingle_k,
            n_perm=self.n_perm,
            n_bands=self.n_bands,
        )


def build_minhash_index(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_perm: int = 128,
    n_bands: int = 16,
    shingle_k: int = 3,
) -> MinHashIndex:
    """Sketch a corpus into a probeable index. The text is tokenized and
    shingled EXACTLY ONCE (the dominant sketch cost): the signature table is
    materialized (sig = n_perm*8 B/doc; the object store spills past memory)
    and the band rows are derived from it map-only — not recomputed from
    text. No shuffle anywhere; the text never leaves its block."""
    kern = MinHashKernel(
        id_col=id_col,
        text_col=text_col,
        shingle_k=shingle_k,
        n_perm=n_perm,
        n_bands=n_bands,
    )
    sigs = ds.map_batches(
        kern.signature_table, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    bands = sigs.map_batches(kern.bands_from_sig_table, batch_format="pyarrow")
    return MinHashIndex(
        bands=bands,
        sigs=sigs,
        id_col=id_col,
        text_col=text_col,
        n_perm=n_perm,
        n_bands=n_bands,
        shingle_k=shingle_k,
    )


def save_minhash_index(index: MinHashIndex, root: str) -> None:
    """Persist as partitioned Parquet + a params manifest. Appending a new
    shard to the index later = write its band/sig blocks into the same
    directories (Parquet directories are unioned on read)."""
    index.bands.write_parquet(os.path.join(root, "bands"))
    index.sigs.write_parquet(os.path.join(root, "sigs"))
    with open(os.path.join(root, "params.json"), "w") as f:
        json.dump(index.params(), f)


def load_minhash_index(root: str) -> MinHashIndex:
    with open(os.path.join(root, "params.json")) as f:
        params = json.load(f)
    return MinHashIndex(
        bands=ray.data.read_parquet(os.path.join(root, "bands")),
        sigs=ray.data.read_parquet(os.path.join(root, "sigs")),
        **params,
    )


def _rename(mapping: dict[str, str]):
    def _r(b: pa.Table) -> pa.Table:
        return b.rename_columns([mapping.get(c, c) for c in b.schema.names])

    return _r


def _band_key_filter(sets_ref):
    """Map-only semi-filter: keep band rows whose (band_id, band_hash) is in
    the broadcast per-band key sets. Instance-passed (task pool) — the
    broadcast ships once via ray.put, not per batch."""

    def filt(t: pa.Table) -> pa.Table:
        import ray as _ray

        sets = _ray.get(sets_ref)
        if t.num_rows == 0:
            return t
        bid = t["band_id"].to_numpy(zero_copy_only=False)
        bh = t["band_hash"].to_numpy(zero_copy_only=False)
        keep = np.zeros(len(bid), dtype=bool)
        for b, arr in sets.items():
            m = bid == b
            if m.any() and len(arr):
                keep[m] = np.isin(bh[m], arr)
        return t.filter(pa.array(keep))

    return filt


def _id_filter(ids_ref, col: str):
    def filt(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import ray as _ray

        if t.num_rows == 0 or col not in t.schema.names:
            return t
        return t.filter(pc.is_in(t[col], value_set=_ray.get(ids_ref)))

    return filt


def probe_minhash_index(
    index: MinHashIndex,
    new_ds: ray.data.Dataset,
    *,
    threshold: float = 0.7,
    num_partitions: int | None = None,
    band_broadcast_limit: int = 8_000_000,
    id_broadcast_limit: int = 5_000_000,
    hist_collision_limit: int = 2_000_000,
    verify_broadcast_limit: int = 50_000,
) -> ray.data.Dataset:
    """-> (new_doc, hist_doc, est_jaccard) rows: every shard document whose
    estimated Jaccard against some indexed document reaches ``threshold``.

    Exchange discipline — the reason this beats re-running the pair kernel
    over history ∪ shard: while the shard's band-row count stays below
    ``band_broadcast_limit`` (16 B/row; a 500k-doc shard at 16 bands ≈
    8M rows ≈ 64 MB — the normal streaming-ingest regime), the shard's
    band KEYS broadcast once via ``ray.put`` and the history band table is
    SEMI-FILTERED MAP-ONLY: history rows are scanned where they live and
    never hash-partitioned. When the surviving collision set is itself
    small (``hist_collision_limit`` rows) candidate generation is a DRIVER
    pandas merge, and below ``verify_broadcast_limit`` pairs verification
    gathers just the pair ids' signatures (map-only semi-filters, ~n_perm*8
    bytes each) for one vectorized slot-agreement pass — the whole probe
    then runs ZERO shuffle joins, the normal streaming-ingest regime.
    Past those limits the probe escalates tier by tier: hash join on the
    LSH key (collision-bounded when the key-set filter applied), slim
    distinct, signature semi-filter (``id_broadcast_limit``) + two hash
    joins for verify — correct at any size, and the O(history + shard)
    worst case is the signal to shard the ingest smaller or pre-partition
    the saved index by hash(band_hash).

    Shard docs are NOT compared to each other — run
    ``minhash_candidate_pairs`` on the shard for that; composition =
    within-shard pairs ∪ this probe, exactly the split a streaming ingest
    wants (the history side never recomputes).
    """
    import ray

    kern = index.kernel()
    cpu_parts = max(2, min(16, int(ray.cluster_resources().get("CPU", 8)) // 2))

    def _join_parts(total_rows: int) -> int:
        # hash-shuffle joins pay per-partition aggregator-actor setup; size
        # the partition count to the data (~64k rows/partition) so small
        # probes don't spin up CPU-many aggregators for kilobyte inputs
        if num_partitions:
            return num_partitions
        return max(2, min(cpu_parts, total_rows // 65_536 + 1))

    # shard text is shingled ONCE: signatures materialize (shard-sized — the
    # streaming-ingest unit), bands derive from them map-only
    new_sigs = new_ds.map_batches(
        kern.signature_table, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    BAND_N = pa.schema(
        [("new_doc", pa.int64()), ("band_id", pa.int64()),
         ("band_hash", pa.int64())]
    )
    BAND_H = pa.schema(
        [("hist_doc", pa.int64()), ("band_id", pa.int64()),
         ("band_hash", pa.int64())]
    )
    # every native_join input goes through compact_nonempty: upstream
    # filters (doc-id splits, the semi-filters below) leave 0-row blocks,
    # and Ray 2.49's hash-shuffle join raises ArrowInvalid on them
    new_bands = compact_nonempty(
        new_sigs.map_batches(
            kern.bands_from_sig_table, batch_format="pyarrow"
        ).map_batches(_rename({"doc_id": "new_doc"}), batch_format="pyarrow"),
        BAND_N,
    )

    hist_bands = index.bands.map_batches(
        _rename({"doc_id": "hist_doc"}), batch_format="pyarrow"
    )
    n_new_bands = new_bands.count()
    nb = None
    if n_new_bands <= band_broadcast_limit:
        nb = new_bands.to_pandas()
        sets = {
            int(b): np.unique(g["band_hash"].to_numpy())
            for b, g in nb.groupby("band_id")
        }
        hist_bands = hist_bands.map_batches(
            _band_key_filter(ray.put(sets)), batch_format="pyarrow"
        )
    hist_bands = compact_nonempty(hist_bands, BAND_H)
    n_hist_bands = hist_bands.count()
    if n_hist_bands == 0 or n_new_bands == 0:
        return ray.data.from_pandas(_EMPTY_PROBED.copy())

    pairs = None
    pairs_df = None
    if nb is not None and n_hist_bands <= hist_collision_limit:
        # DRIVER TIER — the normal streaming-probe regime: the shard's band
        # table is already on the driver (the key-set broadcast above) and
        # the history side is semi-filtered down to collision-bounded rows,
        # so candidate generation is one pandas hash merge — no shuffle-join
        # actors spin up for kilobyte collision sets.
        hb = hist_bands.to_pandas()
        pairs_df = nb.merge(hb, on=["band_id", "band_hash"])[
            ["new_doc", "hist_doc"]
        ].drop_duplicates()
        if pairs_df.empty:
            return ray.data.from_pandas(_EMPTY_PROBED.copy())
        if len(pairs_df) > verify_broadcast_limit:
            pairs = ray.data.from_pandas(pairs_df.reset_index(drop=True))
            pairs_df = None
    if pairs is None and pairs_df is None:
        # JOIN TIER — shard or collision set past the broadcast limits:
        # hash join on the composite LSH key, collision-bounded on the
        # history side when the key-set semi-filter applied above.
        cand = native_join(
            new_bands,
            hist_bands,
            left_on=("band_id", "band_hash"),
            right_on=("band_id", "band_hash"),
            num_partitions=_join_parts(n_new_bands + n_hist_bands),
        ).select_columns(["new_doc", "hist_doc", "band_id"])

        PAIR_SCHEMA = pa.schema(
            [("new_doc", pa.int64()), ("hist_doc", pa.int64()),
             ("band_id", pa.int64())]
        )
        cand = compact_nonempty(cand, PAIR_SCHEMA)
        if cand.count() == 0:
            return ray.data.from_pandas(_EMPTY_PROBED.copy())

        # A pair colliding in k bands appears k times; one slim distinct.
        pairs = distinct_pairs(
            cand, keys=("new_doc", "hist_doc"), carry=("band_id",),
            schema=PAIR_SCHEMA,
        ).drop_columns(["band_id"])

    n_perm = kern.n_perm
    if pairs_df is not None:
        # driver verify: semi-filter both signature tables map-only to the
        # pair ids (<= 2 x verify_broadcast_limit sigs ~ n_perm*8 B each),
        # gather, one vectorized slot-agreement pass
        new_ids = pa.array(
            np.unique(pairs_df["new_doc"].to_numpy()), type=pa.int64()
        )
        hist_ids = pa.array(
            np.unique(pairs_df["hist_doc"].to_numpy()), type=pa.int64()
        )
        sn = (
            new_sigs.map_batches(
                _id_filter(ray.put(new_ids), "doc_id"), batch_format="pyarrow"
            )
            .to_pandas()
            .set_index("doc_id")["sig"]
        )
        sh = (
            index.sigs.map_batches(
                _id_filter(ray.put(hist_ids), "doc_id"), batch_format="pyarrow"
            )
            .to_pandas()
            .set_index("doc_id")["sig"]
        )
        sa = _sig_matrix(
            pa.array(sn.loc[pairs_df["new_doc"]].to_numpy(), pa.binary(n_perm * 8)),
            n_perm,
        )
        sb = _sig_matrix(
            pa.array(sh.loc[pairs_df["hist_doc"]].to_numpy(), pa.binary(n_perm * 8)),
            n_perm,
        )
        est = (sa == sb).mean(axis=1)
        keep = est >= threshold
        return ray.data.from_pandas(
            pd.DataFrame(
                {
                    "new_doc": pairs_df["new_doc"].to_numpy()[keep],
                    "hist_doc": pairs_df["hist_doc"].to_numpy()[keep],
                    "est_jaccard": est[keep].astype("float64"),
                }
            )
        )

    # Verify: join both signature tables on, agreement >= threshold. The
    # shard's signatures are reused from the materialized sketch above; the
    # history's come from the index — its text is never touched.
    SIG_N = pa.schema(
        [("new_doc", pa.int64()), ("sig_n", pa.binary(kern.n_perm * 8))]
    )
    SIG_H = pa.schema(
        [("hist_doc", pa.int64()), ("sig_h", pa.binary(kern.n_perm * 8))]
    )
    sig_n = compact_nonempty(
        new_sigs.map_batches(
            _rename({"doc_id": "new_doc", "sig": "sig_n"}), batch_format="pyarrow"
        ),
        SIG_N,
    )
    sig_h = index.sigs.map_batches(
        _rename({"doc_id": "hist_doc", "sig": "sig_h"}), batch_format="pyarrow"
    )
    pairs = compact_nonempty(
        pairs, pa.schema([("new_doc", pa.int64()), ("hist_doc", pa.int64())])
    )
    n_pairs = pairs.count()
    if n_pairs <= id_broadcast_limit:
        hist_ids = pa.array(
            np.unique(pairs.to_pandas()["hist_doc"].to_numpy()), type=pa.int64()
        )
        sig_h = sig_h.map_batches(
            _id_filter(ray.put(hist_ids), "hist_doc"), batch_format="pyarrow"
        )
    sig_h = compact_nonempty(sig_h, SIG_H)
    j = native_join(
        pairs,
        sig_n,
        left_on="new_doc",
        right_on="new_doc",
        num_partitions=_join_parts(n_pairs + sig_n.count()),
    )
    j = compact_nonempty(  # sequential joins: 2x aggregator actors can starve
        j,                 # slots, and the second join needs nonempty inputs
        pa.schema(
            [("new_doc", pa.int64()), ("hist_doc", pa.int64()),
             ("sig_n", pa.binary(kern.n_perm * 8))]
        ),
    )
    j = native_join(
        j,
        sig_h,
        left_on="hist_doc",
        right_on="hist_doc",
        num_partitions=_join_parts(n_pairs + sig_h.count()),
    )

    def verify(batch: pa.Table) -> pd.DataFrame:
        if batch.num_rows == 0 or "new_doc" not in batch.schema.names:
            return _EMPTY_PROBED.copy()
        a = batch["new_doc"].to_numpy(zero_copy_only=False)
        b = batch["hist_doc"].to_numpy(zero_copy_only=False)
        sa = _sig_matrix(batch["sig_n"], n_perm)
        sb = _sig_matrix(batch["sig_h"], n_perm)
        est = (sa == sb).mean(axis=1)
        keep = est >= threshold
        return pd.DataFrame(
            {
                "new_doc": a[keep],
                "hist_doc": b[keep],
                "est_jaccard": est[keep].astype("float64"),
            }
        )

    return j.map_batches(verify, batch_format="pyarrow")


def incremental_minhash_oracle_sql(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    history_pred: str = "doc_id % 2 = 0",
    new_pred: str = "doc_id % 2 = 1",
    threshold: float = 0.7,
    n_perm: int = 128,
    n_bands: int = 16,
    shingle_k: int = 3,
) -> str:
    """Exact DuckDB oracle: the shared minhash CTE chain over the WHOLE
    table, candidate join restricted to history-side × new-side bucket
    collisions, verification = signature slot agreement >= threshold."""
    prefix = _oracle_cte_prefix(
        table=table,
        id_col=id_col,
        text_col=text_col,
        n_perm=n_perm,
        n_bands=n_bands,
        shingle_k=shingle_k,
    )
    return f"""
WITH {prefix}, cand AS (
  SELECT DISTINCT y.doc_id AS new_doc, x.doc_id AS hist_doc
  FROM bands x JOIN bands y
    ON x.band_id = y.band_id AND x.band_hash = y.band_hash
  WHERE x.doc_id IN (SELECT {id_col} FROM {table} WHERE {history_pred})
    AND y.doc_id IN (SELECT {id_col} FROM {table} WHERE {new_pred})
)
SELECT new_doc, hist_doc, est_jaccard FROM (
  SELECT c.new_doc, c.hist_doc,
    len(list_filter(range(1, {n_perm + 1}), i -> sn.sig[i] = sh2.sig[i]))
      / {float(n_perm)} AS est_jaccard
  FROM cand c
  JOIN sigs sn ON sn.doc_id = c.new_doc
  JOIN sigs sh2 ON sh2.doc_id = c.hist_doc
)
WHERE est_jaccard >= {threshold}
"""
