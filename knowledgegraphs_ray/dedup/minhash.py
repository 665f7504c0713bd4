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
        """-> (ids, (n_docs, n_perm) uint64 signature matrix)."""
        df = pl.from_arrow(batch.select([self.id_col, self.text_col]))
        toks = df.select(
            pl.col(self.id_col),
            pl.col(self.text_col)
            .str.to_lowercase()
            .str.extract_all("[a-z0-9_]+")
            .alias("t"),
        )
        lens = toks["t"].list.len().to_numpy().astype(np.int64)
        # drop_nulls: exploding an EMPTY list yields one null row, which would
        # desynchronize the flat hash stream from the length offsets
        flat = (
            toks.explode("t")
            .drop_nulls("t")
            .select(pl.col("t").hash(seed=_SEED).alias("h"))
        )
        h = flat["h"].to_numpy().astype(np.uint64)
        ids = df[self.id_col].to_numpy()
        n = len(ids)
        # k-shingle combine: s[i] = h[i]*C^2 + h[i+1]*C + h[i+2] (uint64 wrap)
        k = self.k
        C = np.uint64(1099511628211)
        with np.errstate(over="ignore"):
            sh = np.zeros(max(len(h) - k + 1, 0), dtype=np.uint64)
            for j in range(k):
                sh = sh * C + h[j : len(h) - k + 1 + j]
        # build one flat shingle stream with per-doc offsets: docs with >= k
        # tokens use their k-shingles; shorter docs fall back to raw tokens.
        # Then ONE (S_total, P) multiply-add + minimum.reduceat per batch —
        # no per-doc Python work.
        offsets = np.concatenate([[0], np.cumsum(lens)])
        segs: list[np.ndarray] = []
        seg_lens = np.empty(n, dtype=np.int64)
        for d in range(n):  # cheap slicing loop; heavy math is below
            s0, s1 = offsets[d], offsets[d + 1]
            seg = sh[s0 : s1 - k + 1] if s1 - s0 >= k else h[s0:s1]
            segs.append(seg)
            seg_lens[d] = len(seg)
        flat = np.concatenate(segs) if segs else np.empty(0, np.uint64)
        sigs = np.full((n, self.n_perm), _MERSENNE, dtype=np.uint64)
        nonempty = seg_lens > 0
        if len(flat) and nonempty.any():
            with np.errstate(over="ignore"):
                m = flat[:, None] * self.a[None, :] + self.b[None, :]
            starts = np.concatenate([[0], np.cumsum(seg_lens)])[:-1]
            # reduceat over non-empty segments only (empty segments share
            # their start with a neighbour and would corrupt its span)
            sigs[nonempty] = np.minimum.reduceat(m, starts[nonempty], axis=0)
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

    def signature_frame(self, batch: pa.Table) -> pd.DataFrame:
        ids, sigs = self.signatures(batch)
        return pd.DataFrame({"doc_id": ids, "sig": list(sigs)})


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
    bucket_driver_limit: int = 5_000_000,
) -> ray.data.Dataset:
    """-> verified pair rows (doc_a, doc_b, est_jaccard)."""
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

    # ----- hot-bucket pre-filter --------------------------------------------
    # Most (band, hash) buckets are singletons; calling a per-group UDF on
    # every one costs ~1ms each (ruinous at 16 rows/doc). Count bucket sizes
    # with the C aggregate path, broadcast the (small) set of buckets with
    # >= 2 members, filter band rows to those, and pair only there.
    # slim rows — fewer blocks, less scheduling; materialize so the two
    # consumers (bucket counting + hot filter) don't re-run the kernel.
    # Partition count grows with the cluster (CPU/4, floor 8): slim-row
    # stages want FEWER blocks than cores on one node, more on a fleet.
    n_parts = max(8, int(ray.cluster_resources().get("CPU", 8)) // 4)
    banded = banded.repartition(n_parts).materialize()
    # bucket sizes: per-block partial counts (vectorized pandas), then the
    # fastagg two-tier merge inlined with the ≥2 filter fused in: below the
    # limit ONE polars pass on the driver; above it the distributed groupby
    # aggregate with the filter applied BEFORE collecting. Either way the
    # driver only ever holds the hot set (∝ duplicate groups), never the
    # full n_docs × n_bands partial table.
    partials = banded.map_batches(
        lambda df: df.groupby(["band_id", "band_hash"], as_index=False).size(),
        batch_format="pandas",
    ).materialize()
    if partials.count() <= bucket_driver_limit:
        merged = (
            pl.from_pandas(partials.to_pandas())
            .group_by(["band_id", "band_hash"])
            .agg(pl.col("size").sum())
        )
        hot_pairs = merged.filter(pl.col("size") >= 2)
        hot_set = set(zip(hot_pairs["band_id"].to_list(), hot_pairs["band_hash"].to_list()))
    else:  # distributed tier: aggregate + filter, collect only hot buckets
        from ray.data.aggregate import Sum

        n_parts2 = max(8, int(ray.cluster_resources().get("CPU", 8)))
        agg = (
            partials.repartition(n_parts2)
            .groupby(["band_id", "band_hash"])
            .aggregate(Sum("size", alias_name="size"))
        )
        hot = agg.map_batches(
            lambda df: df[df["size"] >= 2], batch_format="pandas"
        ).to_pandas()
        hot_set = set(zip(hot["band_id"], hot["band_hash"]))
    hot_ref = ray.put(hot_set)

    class HotFilter:
        def __init__(self, ref):
            self.ref = ref
            self._s = None

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if self._s is None:
                self._s = ray.get(self.ref)
            keys = pd.Series(list(zip(df["band_id"], df["band_hash"])), index=df.index)
            return df[keys.isin(self._s)]

    hot_rows = banded.map_batches(HotFilter(hot_ref), batch_format="pandas")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique())[:max_bucket]
        if len(ids) < 2:
            return empty
        iu, ju = np.triu_indices(len(ids), k=1)
        return pd.DataFrame(
            {
                "doc_a": ids[iu].astype("int64"),
                "doc_b": ids[ju].astype("int64"),
                "band_id": np.int64(g["band_id"].iloc[0]),
            }
        )

    cand = hot_rows.groupby(["band_id", "band_hash"]).map_groups(
        pairs, batch_format="pandas"
    ).materialize()

    # ----- signatures, but only for candidate-pair members -----------------
    # The signature table is corpus-sized (n_docs × n_perm × 8B); candidate
    # pairs after LSH are near-dup-sized. Collect signatures ONLY for ids
    # appearing in pairs (broadcast id-set semi-filter over a second
    # signature pass) — memory ∝ pairs, never ∝ corpus.
    cdf = cand.to_pandas()
    needed = set(cdf["doc_a"]).union(cdf["doc_b"]) if len(cdf) else set()
    needed_ref = ray.put(needed)

    class SigFilter:
        def __init__(self, ref):
            self.ref = ref
            self._ids = None

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            if self._ids is None:
                self._ids = ray.get(self.ref)
            sf = kern.signature_frame(batch)
            return sf[sf["doc_id"].isin(self._ids)]

    sig_df = (
        ds.map_batches(SigFilter(needed_ref), batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        if needed
        else pd.DataFrame({"doc_id": [], "sig": []})
    )
    sig_map_ref = ray.put({i: s for i, s in zip(sig_df["doc_id"], sig_df["sig"])})

    class Verify:
        """Stateless broadcast-lookup stage doing BOTH dedupe and verify:
        a pair survives only in the row of its FIRST colliding band (computed
        from the signatures — no global pair shuffle needed) and only if the
        signature-slot agreement >= threshold."""

        def __init__(self, ref, band_a, n_bands, rows_per_band):
            self.ref = ref
            self.band_a = band_a
            self.n_bands = n_bands
            self.r = rows_per_band
            self._m = None

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            out_empty = pd.DataFrame(
                {
                    "doc_a": np.empty(0, "int64"),
                    "doc_b": np.empty(0, "int64"),
                    "est_jaccard": np.empty(0, "float64"),
                }
            )
            if batch.num_rows == 0 or "doc_a" not in batch.schema.names:
                return out_empty
            if self._m is None:
                self._m = ray.get(self.ref)
            a = batch["doc_a"].to_numpy(zero_copy_only=False)
            b = batch["doc_b"].to_numpy(zero_copy_only=False)
            band = batch["band_id"].to_numpy(zero_copy_only=False)
            sa = np.stack([self._m[x] for x in a])
            sb = np.stack([self._m[x] for x in b])
            eq = sa == sb
            est = eq.mean(axis=1)
            with np.errstate(over="ignore"):
                ba = (sa.reshape(-1, self.n_bands, self.r) * self.band_a).sum(axis=2).view(np.int64)
                bb = (sb.reshape(-1, self.n_bands, self.r) * self.band_a).sum(axis=2).view(np.int64)
            collide = ba == bb  # (n_pairs, n_bands)
            first = collide.argmax(axis=1)  # first colliding band
            keep = (est >= threshold) & (first == band) & collide.any(axis=1)
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


def components_from_pairs(
    pairs: ray.data.Dataset, *, max_driver_edges: int = 1_000_000
) -> pd.DataFrame:
    """(doc_a, doc_b) edges -> (doc_id, component) via driver union-find.

    Edges after verification are tiny relative to the corpus (only near-dup
    pairs); above ``max_driver_edges`` use ``components_by_propagation``."""
    from knowledgegraphs_ray.canon.unionfind import UnionFind

    df = pairs.to_pandas()
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
            break
        prev_sum = new_sum
    return labels
