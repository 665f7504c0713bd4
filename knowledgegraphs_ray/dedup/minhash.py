"""MinHash + LSH near-duplicate detection.

Pipeline (the standard shingle -> minhash -> band -> bucket-groupby shape):

1. ``MinHashKernel`` (map-only, vectorized): token k-shingles hashed with a
   polynomial rolling combine over polars token hashes; P permutations via
   uint64 multiply-add; per-doc signature by ``np.minimum.reduceat``; bands of
   r rows hashed into (band_id, band_hash, doc_id) rows.
2. ``groupby(band_id, band_hash)`` co-locates LSH candidates; within each
   bucket all pairs are emitted (bucket size capped — a huge bucket means a
   hot shingle pattern, and pairs beyond the cap are from exact-dup
   clusters that the exact pass already handles).
3. Verification: estimated Jaccard = fraction of equal signature slots
   >= ``threshold`` keeps a pair.
4. Connected components -> canonical representative = min(doc_id): driver
   union-find below a size limit, else iterative min-label propagation
   (``components_by_propagation``) which is pure groupby rounds.

Everything is deterministic (fixed seed) ⇒ identical output at any
parallelism. At 100 TB only signatures (P×8 bytes/doc) and band rows
(B×~24 bytes/doc) shuffle — never the text.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import polars as pl
import pyarrow as pa
import ray.data

_SEED = 42
_MERSENNE = np.uint64(0xFFFFFFFFFFFFFFFF)


def _perm_params(n_perm: int, seed: int = _SEED) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 62, size=n_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, 1 << 62, size=n_perm, dtype=np.uint64)
    return a, b


def shingle_stream(
    batch: pa.Table, *, id_col: str, text_col: str, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (ids, flat uint64 shingle-hash stream, per-doc segment lengths).

    Token hash = the byte-level polynomial rolling hash
    (``text.analysis.rolling_hashes``); k-shingle = the FNV-multiplier
    Horner fold over token hashes — both SQL-expressible (the minhash /
    overlap oracles reproduce them in DuckDB HUGEINT). Docs with fewer
    than ``k`` tokens fall back to their raw token hashes."""
    from knowledgegraphs_ray.text.analysis import rolling_hashes

    df = pl.from_arrow(batch.select([id_col, text_col]))
    toks = df.select(
        pl.col(id_col),
        pl.col(text_col)
        .str.to_lowercase()
        .str.extract_all("[a-z0-9_]+")
        .alias("t"),
    )
    lens = toks["t"].list.len().to_numpy().astype(np.int64)
    # drop_nulls: exploding an EMPTY list yields one null row, which would
    # desynchronize the flat hash stream from the length offsets
    flat_tok = toks.explode("t").drop_nulls("t")["t"].to_arrow()
    if isinstance(flat_tok, pa.ChunkedArray):
        flat_tok = flat_tok.combine_chunks()
    # polars emits large_string (int64 offsets); rolling_hashes reads
    # int32-offset utf8 buffers
    h = rolling_hashes(flat_tok.cast(pa.string()))
    ids = df[id_col].to_numpy()
    n = len(ids)
    # k-shingle combine: s[i] = h[i]*C^2 + h[i+1]*C + h[i+2] (uint64 wrap)
    C = np.uint64(1099511628211)
    with np.errstate(over="ignore"):
        sh = np.zeros(max(len(h) - k + 1, 0), dtype=np.uint64)
        for j in range(k):
            sh = sh * C + h[j : len(h) - k + 1 + j]
    # one flat shingle stream with per-doc offsets: docs with >= k tokens
    # use their k-shingles; shorter docs fall back to raw tokens. Consumers
    # then run ONE vectorized pass per batch — no per-doc Python work.
    offsets = np.concatenate([[0], np.cumsum(lens)])
    segs: list[np.ndarray] = []
    seg_lens = np.empty(n, dtype=np.int64)
    for d in range(n):  # cheap slicing loop; heavy math is in the consumers
        s0, s1 = offsets[d], offsets[d + 1]
        seg = sh[s0 : s1 - k + 1] if s1 - s0 >= k else h[s0:s1]
        segs.append(seg)
        seg_lens[d] = len(seg)
    flat = np.concatenate(segs) if segs else np.empty(0, np.uint64)
    return ids, flat, seg_lens


class MinHashKernel:
    """Arrow batch (id, text) -> (doc_id, band_id, band_hash) rows."""

    def __init__(
        self,
        *,
        id_col: str = "doc_id",
        text_col: str = "text",
        shingle_k: int = 3,
        n_perm: int = 128,
        n_bands: int = 16,
    ):
        assert n_perm % n_bands == 0
        self.id_col, self.text_col = id_col, text_col
        self.k = shingle_k
        self.n_perm, self.n_bands = n_perm, n_bands
        self.rows_per_band = n_perm // n_bands
        self.a, self.b = _perm_params(n_perm)
        bp = np.random.default_rng(_SEED + 1)
        self.band_a = bp.integers(1, 1 << 62, size=self.rows_per_band, dtype=np.uint64) | np.uint64(1)

    def signatures(self, batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        """-> (ids, (n_docs, n_perm) uint64 signature matrix).

        Token hash = the byte-level polynomial rolling hash
        (``text.analysis.rolling_hashes``) rather than an engine-private
        hash: the identical fold is expressible in DuckDB (HUGEINT Horner,
        see ``doc_fingerprints``), which makes the WHOLE minhash pipeline
        SQL-oracle-checkable (``minhash_oracle_sql``)."""
        ids, flat, seg_lens = shingle_stream(
            batch, id_col=self.id_col, text_col=self.text_col, k=self.k
        )
        n = len(ids)
        sigs = np.full((n, self.n_perm), _MERSENNE, dtype=np.uint64)
        nonempty = seg_lens > 0
        if len(flat) and nonempty.any():
            # reduceat over non-empty segments only (empty segments share
            # their start with a neighbour and would corrupt its span)
            starts = np.concatenate([[0], np.cumsum(seg_lens)])[:-1][nonempty]
            # One permutation at a time: the (S, n_perm) outer-product
            # formulation writes+reads 8*n_perm bytes of DRAM per shingle
            # (~1 KB/shingle at n_perm=128 — gigabytes per large batch) and
            # its wall time swung 1-10x under host memory-bus contention.
            # Here `flat` and the permuted copy stay L3-resident across the
            # loop, only the (n_docs, n_perm) output touches DRAM, and the
            # kernel is ALU-bound. Values are bit-identical.
            col = np.empty(int(nonempty.sum()), dtype=np.uint64)
            with np.errstate(over="ignore"):
                m = np.empty_like(flat)
                for p in range(self.n_perm):
                    np.multiply(flat, self.a[p], out=m)
                    m += self.b[p]
                    np.minimum.reduceat(m, starts, out=col)
                    sigs[nonempty, p] = col
        return ids, sigs

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        """-> slim band rows (doc_id, band_id, band_hash) — signatures are NOT
        duplicated into band rows (16× shuffle amplification); verification
        reads them from the separate signature table."""
        ids, sigs = self.signatures(batch)
        n = len(ids)
        r = self.rows_per_band
        with np.errstate(over="ignore"):
            bands = (
                sigs.reshape(n, self.n_bands, r) * self.band_a[None, None, :]
            ).sum(axis=2)
        return pd.DataFrame(
            {
                "doc_id": np.repeat(ids, self.n_bands),
                "band_id": np.tile(np.arange(self.n_bands), n),
                # int64 bit-view: Ray's groupby coerces uint64 keys to float64
                # (precision loss on 64-bit hashes); int64 survives intact
                "band_hash": bands.reshape(-1).view(np.int64),
            }
        )

    def signature_table(self, batch: pa.Table) -> pa.Table:
        """(doc_id int64, sig fixed_size_binary(n_perm*8)) — the joinable
        signature representation (fixed-width binary hash-joins natively;
        a list<uint64> column would not)."""
        ids, sigs = self.signatures(batch)
        sig_arr = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(self.n_perm * 8), len(ids), [None, pa.py_buffer(sigs.tobytes())]
        )
        return pa.table(
            {"doc_id": pa.array(ids).cast(pa.int64()), "sig": sig_arr}
        )

    def bands_from_sig_table(self, batch: pa.Table) -> pd.DataFrame:
        """Band rows derived from an already-computed signature table —
        bands are a pure function of the signature, so a pipeline needing
        BOTH representations should shingle once (``signature_table``) and
        derive the bands from it, instead of paying the tokenize+shingle
        pass twice (it dominates the sketch cost)."""
        if batch.num_rows == 0:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "band_id": pd.Series([], dtype="int64"),
                 "band_hash": pd.Series([], dtype="int64")}
            )
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        sigs = _sig_matrix(batch["sig"], self.n_perm)
        n = len(ids)
        r = self.rows_per_band
        with np.errstate(over="ignore"):
            bands = (
                sigs.reshape(n, self.n_bands, r) * self.band_a[None, None, :]
            ).sum(axis=2)
        return pd.DataFrame(
            {
                "doc_id": np.repeat(ids, self.n_bands),
                "band_id": np.tile(np.arange(self.n_bands), n),
                "band_hash": bands.reshape(-1).view(np.int64),
            }
        )


def _sig_matrix(col: pa.ChunkedArray | pa.Array, n_perm: int) -> np.ndarray:
    """fixed_size_binary signature column -> (n, n_perm) uint64 matrix."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    buf = arr.buffers()[1]
    full = np.frombuffer(buf, dtype=np.uint64).reshape(-1, n_perm)
    return full[arr.offset : arr.offset + len(arr)]


def _verify_pairs(
    sa: np.ndarray,
    sb: np.ndarray,
    band: np.ndarray,
    *,
    band_a: np.ndarray,
    n_bands: int,
    rows_per_band: int,
    threshold: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Shared verify semantics for both tiers: keep a pair only in the row of
    its FIRST colliding band (recomputed from signatures — global pair dedup
    with no pair shuffle) and only if slot agreement >= threshold.
    -> (keep mask, est_jaccard)."""
    eq = sa == sb
    est = eq.mean(axis=1)
    with np.errstate(over="ignore"):
        ba = (sa.reshape(-1, n_bands, rows_per_band) * band_a).sum(axis=2).view(np.int64)
        bb = (sb.reshape(-1, n_bands, rows_per_band) * band_a).sum(axis=2).view(np.int64)
    collide = ba == bb  # (n_pairs, n_bands)
    first = collide.argmax(axis=1)  # first colliding band
    keep = (est >= threshold) & (first == band) & collide.any(axis=1)
    return keep, est


def minhash_candidate_pairs(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    n_perm: int = 128,
    n_bands: int = 16,
    shingle_k: int = 3,
    max_bucket: int = 200,
    pair_splits: int | None = None,
    verify_strategy: str = "auto",
    verify_driver_limit: int = 1_000_000,
) -> ray.data.Dataset:
    """-> verified pair rows (doc_a, doc_b, est_jaccard).

    ``pair_splits``: number of bounded shuffle keys the band rows group by
    for pair emission (power of two; ``None`` = derived from the band-row
    count so one group is ~64 MB). All members of an LSH bucket share
    ``band_hash``, so buckets never straddle splits at any value.

    ``verify_strategy``: how pair members get their signatures for the
    verification step.

    * ``"broadcast"`` — collect the candidate-pair id set on the driver,
      semi-filter a second signature pass, broadcast one id->sig dict.
      Memory ∝ near-dup documents — fine for moderate duplication, NOT for
      crawl-like duplication rates on a 100 TB corpus.
    * ``"join"`` — keep pairs distributed and hash-join the (doc_id, sig)
      table onto them twice (doc_a then doc_b); verify per joined batch.
      Nothing corpus-sized ever lands on one node.
    * ``"auto"`` (default) — broadcast while the candidate-pair count is
      ≤ ``verify_driver_limit``, else join.
    """
    import ray

    kern = MinHashKernel(
        id_col=id_col, text_col=text_col, shingle_k=shingle_k, n_perm=n_perm, n_bands=n_bands
    )
    banded = ds.map_batches(kern, batch_format="pyarrow", zero_copy_batch=True)

    empty = pd.DataFrame(
        {
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
            "band_id": pd.Series([], dtype="int64"),
        }
    )

    # ----- bucket co-location + vectorized pair emission --------------------
    # ONE bounded-key shuffle: band rows group by a power-of-two split of
    # band_hash and `pairs_block` emits every bucket's pairs vectorized
    # inside the group call. Two designs this replaces, and why:
    # * per-(band, hash) map_groups — ~1ms of Python per GROUP; most buckets
    #   are singletons, so that is n_docs × n_bands milliseconds.
    # * a hot-bucket pre-filter (count bucket sizes, broadcast keys with
    #   >= 2 members, shuffle only those) — the counting aggregate itself
    #   shuffles the per-block partials, which are ~as large as the band
    #   table (singleton buckets don't combine) but carry n_docs × n_bands
    #   DISTINCT group keys instead of `n_splits` bounded ones; measured on
    #   a 1M-doc corpus the aggregate alone out-costed this entire stage.
    # Singleton buckets cost nothing here: pairs_block size-classes buckets
    # and classes below 2 emit zero rows with zero per-bucket Python.
    # Split count bounds the bytes one map_groups call must hold (~64 MB of
    # 24 B band rows per group), growing with the corpus, never the driver.
    if pair_splits is None:
        banded = banded.materialize()  # two consumers: count() + the groupby
        n_band_rows = banded.count()
        pair_splits = 256
        while pair_splits < (1 << 20) and n_band_rows * 24 > pair_splits * (64 << 20):
            pair_splits *= 2
    mask = np.uint64(pair_splits - 1)
    assert pair_splits & (pair_splits - 1) == 0, "pair_splits must be a power of two"
    def pairs_block(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return empty
        g = g.drop_duplicates(["band_id", "band_hash", "doc_id"]).sort_values(
            ["band_id", "band_hash", "doc_id"], kind="mergesort"
        )
        bid = g["band_id"].to_numpy()
        bh = g["band_hash"].to_numpy()
        ids = g["doc_id"].to_numpy().astype(np.int64)
        new_grp = np.empty(len(g), dtype=bool)
        new_grp[0] = True
        new_grp[1:] = (bid[1:] != bid[:-1]) | (bh[1:] != bh[:-1])
        grp = np.cumsum(new_grp) - 1
        starts = np.flatnonzero(new_grp)
        sizes = np.diff(np.append(starts, len(g)))
        # cap each bucket at max_bucket members (same truncation as before:
        # buckets sorted by doc_id, keep the first max_bucket)
        pos = np.arange(len(g)) - starts[grp]
        keep = pos < max_bucket
        ids, grp, bid = ids[keep], grp[keep], bid[keep]
        sizes = np.minimum(sizes, max_bucket)
        outs: list[pd.DataFrame] = []
        for m in np.unique(sizes):
            if m < 2:
                continue
            sel = np.isin(grp, np.flatnonzero(sizes == m))
            mat = ids[sel].reshape(-1, m)
            bmat = bid[sel].reshape(-1, m)[:, 0]
            iu, ju = np.triu_indices(m, k=1)
            outs.append(
                pd.DataFrame(
                    {
                        "doc_a": mat[:, iu].ravel(),
                        "doc_b": mat[:, ju].ravel(),
                        "band_id": np.repeat(bmat, len(iu)),
                    }
                )
            )
        return pd.concat(outs, ignore_index=True) if outs else empty

    def add_pb(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            __pb=(df["band_hash"].to_numpy().astype(np.uint64) & mask).astype("int64")
        )

    cand = (
        banded.map_batches(add_pb, batch_format="pandas")
        .groupby("__pb")
        .map_groups(pairs_block, batch_format="pandas")
        .materialize()
    )

    use_join = verify_strategy == "join" or (
        verify_strategy == "auto" and cand.count() > verify_driver_limit
    )
    if use_join:
        return _verify_by_join(ds, cand, kern, threshold=threshold)
    return _verify_by_broadcast(ds, cand, kern, threshold=threshold)


def _verify_by_broadcast(
    ds: ray.data.Dataset,
    cand: ray.data.Dataset,
    kern: MinHashKernel,
    *,
    threshold: float,
) -> ray.data.Dataset:
    """Driver-bounded tier: signatures ONLY for candidate-pair members
    (broadcast id-set semi-filter over a second signature pass) broadcast as
    one id->sig dict. Memory ∝ pairs, never ∝ corpus — but pair members at
    crawl-like duplication ARE corpus-scale; ``_verify_by_join`` is the
    scale path."""
    import ray

    cdf = cand.to_pandas()
    needed = set(cdf["doc_a"]).union(cdf["doc_b"]) if len(cdf) else set()
    needed_ref = ray.put(needed)

    class SigFilter:
        """Arrow in, Arrow out (fixed_size_binary sig) — a pandas object-dtype
        sig column defeats Ray's block size accounting (vectorize-on-empty
        warnings) and flips the RefBundle schema on empty batches."""

        def __init__(self, ref):
            self.ref = ref
            self._ids = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            if self._ids is None:
                self._ids = pa.array(sorted(ray.get(self.ref)), type=pa.int64())
            st = kern.signature_table(batch)
            return st.filter(pc.is_in(st["doc_id"], value_set=self._ids))

    if needed:
        sig_df = ds.map_batches(
            SigFilter(needed_ref), batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()
        sig_map_ref = ray.put(
            {
                int(i): np.frombuffer(s, dtype=np.uint64)
                for i, s in zip(sig_df["doc_id"], sig_df["sig"])
            }
        )
    else:
        sig_map_ref = ray.put({})

    class Verify:
        def __init__(self, ref, band_a, n_bands, rows_per_band):
            self.ref = ref
            self.band_a = band_a
            self.n_bands = n_bands
            self.r = rows_per_band
            self._m = None

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            if batch.num_rows == 0 or "doc_a" not in batch.schema.names:
                return _EMPTY_VERIFIED.copy()
            if self._m is None:
                self._m = ray.get(self.ref)
            a = batch["doc_a"].to_numpy(zero_copy_only=False)
            b = batch["doc_b"].to_numpy(zero_copy_only=False)
            band = batch["band_id"].to_numpy(zero_copy_only=False)
            sa = np.stack([self._m[x] for x in a])
            sb = np.stack([self._m[x] for x in b])
            keep, est = _verify_pairs(
                sa,
                sb,
                band,
                band_a=self.band_a,
                n_bands=self.n_bands,
                rows_per_band=self.r,
                threshold=threshold,
            )
            return pd.DataFrame(
                {
                    "doc_a": a[keep],
                    "doc_b": b[keep],
                    "est_jaccard": est[keep].astype("float64"),
                }
            )

    return cand.map_batches(
        Verify(sig_map_ref, kern.band_a, kern.n_bands, kern.rows_per_band),
        batch_format="pyarrow",
    )


_EMPTY_VERIFIED = pd.DataFrame(
    {
        "doc_a": np.empty(0, "int64"),
        "doc_b": np.empty(0, "int64"),
        "est_jaccard": np.empty(0, "float64"),
    }
)


def _verify_by_join(
    ds: ray.data.Dataset,
    cand: ray.data.Dataset,
    kern: MinHashKernel,
    *,
    threshold: float,
) -> ray.data.Dataset:
    """Scale tier (no corpus-sized driver state): hash-join the distributed
    (doc_id, sig) table onto the distributed pair table twice — once per
    side — then verify per joined batch. Signatures travel as
    fixed_size_binary(n_perm*8), which Ray's hash join shuffles natively;
    the per-pair Python dict lookups of the broadcast tier disappear (the
    signature matrix is a zero-copy buffer view per batch)."""
    from knowledgegraphs_ray.extract.joins import native_join
    from knowledgegraphs_ray.util.blocks import compact_nonempty

    PAIR_SCHEMA = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("band_id", pa.int64())]
    )
    cand = compact_nonempty(cand, PAIR_SCHEMA)
    if cand.count() == 0:
        return ray.data.from_pandas(_EMPTY_VERIFIED.copy())

    sigs = ds.map_batches(
        kern.signature_table, batch_format="pyarrow", zero_copy_batch=True
    )

    def rename(col_from: str, col_to: dict[str, str]):
        def _r(b: pa.Table) -> pa.Table:
            return b.rename_columns([col_to.get(c, c) for c in b.schema.names])

        return _r

    sig_a = sigs.map_batches(
        rename("", {"doc_id": "doc_a", "sig": "sig_a"}), batch_format="pyarrow"
    )
    sig_b = sigs.map_batches(
        rename("", {"doc_id": "doc_b", "sig": "sig_b"}), batch_format="pyarrow"
    )
    # partition count scaled to the cluster, and the first join MATERIALIZED
    # before the second starts: each hash join spins up num_partitions
    # aggregator actors, and two concurrent joins' worth can starve a small
    # cluster's task slots (observed deadlock at 2×16 actors on 4 CPUs)
    import ray

    nparts = max(2, min(16, int(ray.cluster_resources().get("CPU", 8)) // 2))
    j = native_join(
        cand, sig_a, left_on="doc_a", right_on="doc_a", num_partitions=nparts
    ).materialize()
    j = native_join(j, sig_b, left_on="doc_b", right_on="doc_b", num_partitions=nparts)

    n_perm, band_a = kern.n_perm, kern.band_a
    n_bands, r = kern.n_bands, kern.rows_per_band

    def verify(batch: pa.Table) -> pd.DataFrame:
        if batch.num_rows == 0 or "doc_a" not in batch.schema.names:
            return _EMPTY_VERIFIED.copy()
        a = batch["doc_a"].to_numpy(zero_copy_only=False)
        b = batch["doc_b"].to_numpy(zero_copy_only=False)
        band = batch["band_id"].to_numpy(zero_copy_only=False)
        sa = _sig_matrix(batch["sig_a"], n_perm)
        sb = _sig_matrix(batch["sig_b"], n_perm)
        keep, est = _verify_pairs(
            sa, sb, band, band_a=band_a, n_bands=n_bands,
            rows_per_band=r, threshold=threshold,
        )
        return pd.DataFrame(
            {
                "doc_a": a[keep],
                "doc_b": b[keep],
                "est_jaccard": est[keep].astype("float64"),
            }
        )

    return j.map_batches(verify, batch_format="pyarrow")


def tok_sh_cte(*, table: str, id_col: str, text_col: str) -> str:
    """The tok/sh CTE pair — DuckDB HUGEINT twins of
    ``text.analysis.rolling_hashes`` (per-token byte Horner fold) and the
    ``shingle_stream`` 3-shingle combine, incl. the short-doc raw-token
    fallback. Shared by the minhash oracles and ``text/overlap.py``."""
    M = "18446744073709551616::HUGEINT"  # 2^64
    C = "1099511628211::HUGEINT"
    return f"""tok AS (
  SELECT {id_col} AS doc_id, list_transform(
    regexp_extract_all(lower(coalesce({text_col}, '')), '[a-z0-9_]+'),
    t -> list_reduce(list_concat([0::HUGEINT],
           list_transform(regexp_extract_all(t, '.', 0, 's'),
                          c -> unicode(c)::HUGEINT)),
         (acc, x) -> (acc * {C} + x) % {M})
  ) AS th
  FROM {table}
), sh AS (
  SELECT doc_id, CASE WHEN len(th) >= 3 THEN
    list_transform(range(1, len(th) - 1), i ->
      ((((th[i] * {C}) % {M} + th[i+1]) * {C}) % {M} + th[i+2]) % {M})
  ELSE th END AS s
  FROM tok
)"""


def _oracle_cte_prefix(
    *,
    table: str,
    id_col: str,
    text_col: str,
    n_perm: int,
    n_bands: int,
    shingle_k: int,
) -> str:
    """The shared tok/sh/sigs/bands CTE chain of the minhash oracles —
    generated with the kernel's IDENTICAL seeded constants so the SQL
    signatures and band hashes are bit-equal to the engine's."""
    assert shingle_k == 3, "oracle generated for the default shingle_k=3"
    a, b = _perm_params(n_perm)
    bp = np.random.default_rng(_SEED + 1)
    r = n_perm // n_bands
    band_a = bp.integers(1, 1 << 62, size=r, dtype=np.uint64) | np.uint64(1)

    M = "18446744073709551616::HUGEINT"  # 2^64
    M1 = "18446744073709551615::HUGEINT"  # 2^64 - 1 (empty-signature slot)
    C = "1099511628211::HUGEINT"

    sig_exprs = ", ".join(
        f"coalesce(list_min(list_transform(s, x -> ({int(a[j])}::HUGEINT * x "
        f"+ {int(b[j])}::HUGEINT) % {M})), {M1})"
        for j in range(n_perm)
    )
    band_terms = " + ".join(
        f"(sig[band_id*{r}+{j + 1}] * {int(band_a[j])}::HUGEINT) % {M}"
        for j in range(r)
    )
    return f"""{tok_sh_cte(table=table, id_col=id_col, text_col=text_col)}, sigs AS (
  SELECT doc_id, [{sig_exprs}] AS sig FROM sh
), bands AS (
  SELECT doc_id, band_id,
    CAST(CASE WHEN bh >= 9223372036854775808::HUGEINT
         THEN bh - {M} ELSE bh END AS BIGINT) AS band_hash
  FROM (
    SELECT doc_id, band_id, ({band_terms}) % {M} AS bh
    FROM sigs, range({n_bands}) t(band_id)
  )
)"""


def minhash_oracle_sql(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    n_perm: int = 128,
    n_bands: int = 16,
    shingle_k: int = 3,
) -> str:
    """Generate the exact DuckDB oracle for ``minhash_candidate_pairs``.

    Possible because every hash in the pipeline is SQL-expressible: token
    hash = the byte-polynomial Horner fold (HUGEINT mod 2^64 — same trick as
    the ``doc_fingerprints`` oracle), shingles = the same fold over token
    hashes, permutations = (a*x+b) mod 2^64 min-folds with the IDENTICAL
    seeded constants, band hashes = the same weighted sums viewed as int64.
    Pair set = DISTINCT bucket collisions with slot-agreement >= threshold —
    equal to the kernel's first-colliding-band emission whenever no bucket
    exceeds ``max_bucket`` (the cap binds only on pathological hot buckets;
    see the kernel docstring).
    """
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
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x JOIN bands y
    ON x.band_id = y.band_id AND x.band_hash = y.band_hash
   AND x.doc_id < y.doc_id
)
SELECT doc_a, doc_b, est_jaccard FROM (
  SELECT c.doc_a, c.doc_b,
    len(list_filter(range(1, {n_perm + 1}), i -> sa.sig[i] = sb.sig[i]))
      / {float(n_perm)} AS est_jaccard
  FROM cand c
  JOIN sigs sa ON sa.doc_id = c.doc_a
  JOIN sigs sb ON sb.doc_id = c.doc_b
)
WHERE est_jaccard >= {threshold}
"""


def minhash_components_oracle_sql(**kwargs) -> str:
    """DuckDB oracle for ``components_from_pairs`` over the minhash pairs:
    undirected reachability via a recursive CTE, component representative =
    min reachable doc_id (the UnionFind's smaller-value-becomes-root rule)."""
    pairs_sql = minhash_oracle_sql(**kwargs)
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
nodes AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_a AS doc_id FROM pairs
    UNION ALL SELECT doc_b FROM pairs
  )
), edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION ALL SELECT doc_b AS u, doc_a AS v FROM pairs
), walk(node, label) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT e.u, w.label FROM edges e JOIN walk w ON w.node = e.v
)
SELECT node AS doc_id, min(label) AS component FROM walk GROUP BY node
"""


def components_from_pairs(
    pairs: ray.data.Dataset, *, max_driver_edges: int = 1_000_000
) -> pd.DataFrame:
    """(doc_a, doc_b) edges -> (doc_id, component) via driver union-find.

    Edges after verification are tiny relative to the corpus (only near-dup
    pairs); above ``max_driver_edges`` use ``components_by_propagation``."""
    from knowledgegraphs_ray.canon.unionfind import UnionFind

    df = pairs.to_pandas()
    if len(df) == 0:
        # an empty Dataset loses its column schema entirely — return the
        # contract columns so downstream joins/filters stay typed
        return pd.DataFrame(
            {"doc_id": pd.Series(dtype="int64"), "component": pd.Series(dtype="int64")}
        )
    if len(df) > max_driver_edges:
        raise ValueError("edge set too large for driver union-find; use components_by_propagation")
    uf = UnionFind()
    for a, b in zip(df["doc_a"], df["doc_b"]):
        uf.union(a, b)
    items = sorted(uf.parent)
    return pd.DataFrame({"doc_id": items, "component": [uf.find(x) for x in items]})


def components_by_propagation(
    pairs: ray.data.Dataset, *, max_iter: int = 25
) -> ray.data.Dataset:
    """Distributed min-label propagation over the pair graph — the scale path
    for components when the edge set doesn't fit the driver.

    Every round is pure Dataset ops with NO driver collect: the label table
    is hash-joined onto the (node, peer) edges via ``Dataset.join``, the
    per-node minimum is taken with a per-batch partial min (combine) before
    the small groupby aggregate. Labels only ever decrease, so the
    (distributed) sum of labels is a monotone potential — an unchanged sum
    between rounds ⟺ fixpoint. Converges in O(diameter) rounds (near-dup
    components are shallow). -> (node, label) rows.
    """
    from ray.data.aggregate import Min

    from knowledgegraphs_ray.extract.joins import native_join
    from knowledgegraphs_ray.util.blocks import compact_nonempty

    EDGE_SCHEMA = pa.schema([("node", pa.int64()), ("peer", pa.int64())])
    LABEL_SCHEMA = pa.schema([("node", pa.int64()), ("label", pa.int64())])

    def explode(b: pa.Table) -> pa.Table:
        # explicit int64: 0-row pandas-born blocks carry null-typed columns,
        # which would poison the join key schema
        a = b["doc_a"].combine_chunks().cast(pa.int64())
        bb = b["doc_b"].combine_chunks().cast(pa.int64())
        return pa.table(
            {"node": pa.concat_arrays([a, bb]), "peer": pa.concat_arrays([bb, a])}
        )

    edges = compact_nonempty(
        pairs.map_batches(explode, batch_format="pyarrow"), EDGE_SCHEMA
    )

    def partial_min(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("node", as_index=False)["label"].min()

    def stabilize(df: pd.DataFrame) -> pd.DataFrame:
        # Ray's hash aggregate emits schema-less 0-column blocks for empty
        # partitions; give every block the constant (node, label) schema so
        # the downstream Arrow hash join sees a consistent key field
        return df.reindex(columns=["node", "label"]).astype(
            {"node": "int64", "label": "int64"}
        )

    def group_min(ds: ray.data.Dataset) -> ray.data.Dataset:
        combined = ds.map_batches(partial_min, batch_format="pandas")
        agg = combined.groupby("node").aggregate(Min("label", alias_name="label"))
        return compact_nonempty(
            agg.map_batches(stabilize, batch_format="pandas"), LABEL_SCHEMA
        )

    # init: label(node) = min(node, min peer) — one combine + one aggregate
    init = edges.map_batches(
        lambda df: pd.DataFrame(
            {"node": df["node"], "label": np.minimum(df["node"], df["peer"])}
        ),
        batch_format="pandas",
    )
    labels = group_min(init)  # group_min materializes (compact_nonempty)
    prev_sum = labels.sum("label")

    converged = False
    for _ in range(max_iter):
        # labels keyed by peer: rename, then hash-join onto the edges
        by_peer = labels.map_batches(
            lambda df: df.rename(columns={"node": "peer"}), batch_format="pandas"
        )
        via_peers = native_join(
            edges, by_peer, left_on="peer", right_on="peer"
        ).select_columns(["node", "label"])
        labels_new = group_min(via_peers.union(labels))
        new_sum = labels_new.sum("label")
        labels = labels_new
        if new_sum == prev_sum:  # monotone potential unchanged -> fixpoint
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        # one more round to distinguish "converged exactly at max_iter" from
        # a truly unfinished propagation (graph diameter > max_iter — silent
        # under-merging would over-count components downstream)
        by_peer = labels.map_batches(
            lambda df: df.rename(columns={"node": "peer"}), batch_format="pandas"
        )
        via_peers = native_join(
            edges, by_peer, left_on="peer", right_on="peer"
        ).select_columns(["node", "label"])
        probe = group_min(via_peers.union(labels))
        if probe.sum("label") == prev_sum:
            converged = True
        else:
            labels = probe  # keep the strictly-better labels
            raise RuntimeError(
                f"components_by_propagation did not converge in {max_iter} "
                "rounds (pair-graph diameter exceeds max_iter); raise "
                "max_iter — returning partial labels would over-count "
                "components"
            )
    return labels
