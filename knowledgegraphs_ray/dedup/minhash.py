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
        flat = toks.explode("t").select(pl.col("t").hash(seed=_SEED).alias("h"))
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
        # mask shingles that cross doc boundaries; docs shorter than k tokens
        # fall back to their single tokens as shingles
        offsets = np.concatenate([[0], np.cumsum(lens)])
        sigs = np.full((n, self.n_perm), _MERSENNE, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for d in range(n):  # per-doc segment; inner ops vectorized over S×P
                s0, s1 = offsets[d], offsets[d + 1]
                if s1 - s0 >= k:
                    seg = sh[s0 : s1 - k + 1]
                else:
                    seg = h[s0:s1]
                if len(seg) == 0:
                    continue
                m = seg[:, None] * self.a[None, :] + self.b[None, :]
                sigs[d] = m.min(axis=0)
        return ids, sigs

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
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
                "band_hash": bands.reshape(-1),
                "sig": list(np.repeat(sigs, self.n_bands, axis=0)),
            }
        )


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
) -> ray.data.Dataset:
    """-> verified pair rows (doc_a, doc_b, est_jaccard)."""
    kern = MinHashKernel(
        id_col=id_col, text_col=text_col, shingle_k=shingle_k, n_perm=n_perm, n_bands=n_bands
    )
    banded = ds.map_batches(kern, batch_format="pyarrow", zero_copy_batch=True)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id").head(max_bucket)
        ids = g["doc_id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "est_jaccard": []})
        sigs = np.stack(g["sig"].to_numpy())
        rows = {"doc_a": [], "doc_b": [], "est_jaccard": []}
        for i in range(len(ids)):
            eq = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
            keep = np.where(eq >= threshold)[0]
            for j in keep:
                rows["doc_a"].append(ids[i])
                rows["doc_b"].append(ids[i + 1 + j])
                rows["est_jaccard"].append(float(eq[j]))
        return pd.DataFrame(rows)

    cand = banded.groupby(["band_id", "band_hash"]).map_groups(
        pairs, batch_format="pandas"
    )
    # same pair can surface from several bands — dedupe on (doc_a, doc_b)
    def dedupe(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return cand.groupby(["doc_a", "doc_b"]).map_groups(dedupe, batch_format="pandas")


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
    pairs: ray.data.Dataset, *, max_iter: int = 10
) -> ray.data.Dataset:
    """Distributed min-label propagation over the pair graph — each round is
    one groupby; converges in O(diameter) rounds (near-dup components are
    shallow). The scale path for components when edges don't fit the driver."""

    def explode(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [b["doc_a"].combine_chunks(), b["doc_b"].combine_chunks()]
                ),
                "peer": pa.concat_arrays(
                    [b["doc_b"].combine_chunks(), b["doc_a"].combine_chunks()]
                ),
            }
        )

    edges = pairs.map_batches(explode, batch_format="pyarrow")

    def init_label(g: pd.DataFrame) -> pd.DataFrame:
        node = g["node"].iloc[0]
        lab = min(g["peer"].min(), node)
        return pd.DataFrame({"node": [node], "label": [lab]})

    labels = edges.groupby("node").map_groups(init_label, batch_format="pandas")
    for _ in range(max_iter):
        lab_df = labels.to_pandas()  # label table is O(nodes in dup graph), small
        lmap = dict(zip(lab_df["node"], lab_df["label"]))

        def relabel(g: pd.DataFrame, lmap=lmap) -> pd.DataFrame:
            node = g["node"].iloc[0]
            cands = [lmap.get(node, node)] + [lmap.get(p, p) for p in g["peer"]]
            return pd.DataFrame({"node": [node], "label": [min(cands)]})

        new_labels = edges.groupby("node").map_groups(relabel, batch_format="pandas")
        new_df = new_labels.to_pandas()
        if dict(zip(new_df["node"], new_df["label"])) == lmap:
            break
        labels = new_labels
    return labels
