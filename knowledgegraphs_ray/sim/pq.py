"""Product quantization (PQ) — the compressed-index tier of the similarity
family (brute-force < LSH buckets < IVF lists < IVF-PQ codes).

At 100 TB of float32 embeddings (64-dim = 256 B/vector) even the IVF lists
are object-store-sized; PQ compresses each vector to M uint8 codes
(M = 8 ⇒ 32× smaller), so the SCAN side of a query reads codes, not floats
(Jégou, Douze, Schmid: "Product Quantization for Nearest Neighbor Search",
TPAMI 2011 — public).

Ray-Data-first shapes:

* ``train_pq`` / ``train_pq_distributed`` — per-subspace k-means. The
  distributed tier runs ALL M subspaces in one ``map_batches`` pass per
  Lloyd round: each block emits one (M*K, d_sub) partial-sum matrix +
  counts, the driver merges the O(num_blocks) partials in deterministic tag
  order (the ``sim.ivf.train_centroids_distributed`` /
  ``text.classifier.train_logreg_distributed`` pattern). Per-round
  quantization makes the codebooks parallelism-independent.
* ``encode_pq`` — map-only: broadcast codebooks once (``ray.put``), each
  batch computes argmin sub-distances with one (n, K) matmul per subspace
  and emits a ``list<uint8>`` code column. This is the corpus-sized pass.
* ``pq_topk`` — asymmetric distance computation (ADC): each query
  precomputes an (M, K) lookup table of subspace dot products (driver-side,
  tiny); scanning a batch is M fancy-indexed gathers + a sum — no float
  vectors are read. Per-batch local top-k then the standard per-query merge.

Reference analogue: the IDF candidate-index role of
DeepOnto utils/text_utils.py:155-182 (candidate generation before exact
scoring), vector-space compressed edition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from knowledgegraphs_ray.sim.ann import _batch_matrix, _normalize


def _split(mat: np.ndarray, m: int) -> np.ndarray:
    """(n, d) -> (m, n, d/m) subspace views."""
    n, d = mat.shape
    assert d % m == 0, f"dim {d} not divisible by M={m}"
    return mat.reshape(n, m, d // m).transpose(1, 0, 2)


def train_pq(
    ds: ray.data.Dataset,
    *,
    m: int = 8,
    k: int = 16,
    column: str = "embedding",
    sample_size: int = 4096,
    n_iter: int = 8,
    seed: int = 42,
) -> np.ndarray:
    """Sample-tier codebooks: (M, K, d_sub) from seeded Lloyd on a driver
    sample (tiny relative to the corpus; the distributed tier below for
    full-data training)."""
    rows = ds.limit(sample_size).to_pandas()
    mat = _normalize(
        np.stack([np.asarray(v, dtype=np.float64) for v in rows[column]])
    )
    subs = _split(mat, m)
    rng = np.random.default_rng(seed)
    books = []
    for mi in range(m):
        x = subs[mi]
        cent = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
        for _ in range(n_iter):
            d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(len(cent)):
                members = x[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books.append(cent)
    return np.stack(books)


def train_pq_distributed(
    ds: ray.data.Dataset,
    *,
    m: int = 8,
    k: int = 16,
    column: str = "embedding",
    id_column: str = "vec_id",
    n_iter: int = 5,
    seed: int = 42,
    quant: float = 1e-9,
) -> np.ndarray:
    """Full-data Lloyd for all M subspaces at once: per round, each block
    emits (M*K, d_sub) per-centroid sums + (M*K,) counts + a tag; the driver
    merges the bounded partials in tag order and quantizes, so the codebooks
    are identical at any parallelism. Traffic per round = num_blocks × K × d
    doubles."""
    books = train_pq(
        ds, m=m, k=k, column=column, sample_size=4096, n_iter=1, seed=seed
    )
    d_sub = books.shape[2]

    for _ in range(n_iter):
        bref = ray.put(books)

        def partial(batch: pa.Table, _bref=bref) -> pd.DataFrame:
            bk = ray.get(_bref)  # (m, k, d_sub)
            mat = _normalize(_batch_matrix(batch, column))
            tag = (
                int(pa.compute.min(batch[id_column]).as_py())
                if batch.num_rows
                else 2**62
            )
            sums = np.zeros((m * k, d_sub))
            cnts = np.zeros(m * k)
            if len(mat):
                subs = _split(mat, m)
                for mi in range(m):
                    x = subs[mi]
                    d2 = (
                        (x**2).sum(axis=1, keepdims=True)
                        - 2.0 * (x @ bk[mi].T)
                        + (bk[mi] ** 2).sum(axis=1)[None, :]
                    )
                    assign = d2.argmin(axis=1)
                    np.add.at(sums, mi * k + assign, x)
                    np.add.at(cnts, mi * k + assign, 1.0)
            row = {f"s{j}": [sums[:, j]] for j in range(d_sub)}
            row["cnt"] = [cnts]
            row["tag"] = [tag]
            return pd.DataFrame(row)

        parts = ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()
        parts = parts.sort_values("tag", kind="mergesort")
        sums = np.zeros((m * k, d_sub))
        cnts = np.zeros(m * k)
        for _, p in parts.iterrows():
            for j in range(d_sub):
                sums[:, j] += np.asarray(p[f"s{j}"])
            cnts += np.asarray(p["cnt"])
        upd = books.reshape(m * k, d_sub).copy()
        nz = cnts > 0
        upd[nz] = sums[nz] / cnts[nz, None]
        books = (np.round(upd / quant) * quant).reshape(m, k, d_sub)
    return books


class PqEncoder:
    """Map-only encoding stage: broadcast codebooks, one (n, K) distance
    matrix per subspace, emit list<uint8> codes."""

    def __init__(self, books_ref, column: str = "embedding"):
        self.books_ref = books_ref
        self._b = None
        self.column = column

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._b is None:
            self._b = ray.get(self.books_ref)
        bk = self._b  # (m, k, d_sub)
        m = bk.shape[0]
        mat = _normalize(_batch_matrix(batch, self.column))
        if not len(mat):
            codes = np.empty((0, m), dtype=np.uint8)
        else:
            subs = _split(mat, m)
            cols = []
            for mi in range(m):
                x = subs[mi]
                d2 = (
                    (x**2).sum(axis=1, keepdims=True)
                    - 2.0 * (x @ bk[mi].T)
                    + (bk[mi] ** 2).sum(axis=1)[None, :]
                )
                cols.append(d2.argmin(axis=1).astype(np.uint8))
            codes = np.stack(cols, axis=1)
        out = batch.drop_columns([self.column]) if self.column in batch.column_names else batch
        return out.append_column(
            "pq_code", pa.FixedSizeListArray.from_arrays(codes.reshape(-1), m)
        )


def encode_pq(
    ds: ray.data.Dataset,
    books: np.ndarray,
    *,
    column: str = "embedding",
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """Corpus-sized pass: embeddings -> M uint8 codes (drops the float
    column — at scale the code table is what persists)."""
    enc = PqEncoder(ray.put(books), column=column)
    return ds.map_batches(
        enc, batch_format="pyarrow", zero_copy_batch=True, concurrency=concurrency
    )


class AdcScorer:
    """ADC scan: per query an (M, K) LUT of subspace dot products; scoring a
    batch = M fancy-indexed gathers over the code column + a sum. Never
    touches float vectors."""

    def __init__(self, luts_ref, k: int, id_column: str):
        self.luts_ref = luts_ref
        self._l = None
        self.k = k
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        if self._l is None:
            self._l = ray.get(self.luts_ref)
        q_ids, luts = self._l["ids"], self._l["luts"]  # (nq, m, k)
        ids = batch[self.id_column].to_numpy(zero_copy_only=False)
        codes_arr = batch["pq_code"].combine_chunks()
        n = len(codes_arr)
        m = luts.shape[1]
        if n == 0:
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype="int64"),
                    "neighbor_id": pd.Series([], dtype="int64"),
                    "score": pd.Series([], dtype="float64"),
                }
            )
        codes = (
            codes_arr.flatten().to_numpy(zero_copy_only=False).reshape(n, m)
        )
        # scores[q, i] = sum_m luts[q, m, codes[i, m]] — luts (nq, m, k)
        # indexed at [:, m_idx (n,m), codes (n,m)] -> (nq, n, m)
        scores = luts[:, np.arange(m)[None, :], codes].sum(axis=2)
        k = min(self.k, scores.shape[1])
        top = np.argpartition(-scores, k - 1, axis=1)[:, :k]
        rows = {"query_id": [], "neighbor_id": [], "score": []}
        for qi in range(scores.shape[0]):
            rows["query_id"].append(np.repeat(q_ids[qi], k))
            rows["neighbor_id"].append(ids[top[qi]])
            rows["score"].append(scores[qi, top[qi]])
        return pd.DataFrame({c: np.concatenate(v) for c, v in rows.items()})


def pq_topk(
    ds: ray.data.Dataset,
    query_ids: list[int],
    *,
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    id_column: str = "vec_id",
    column: str = "embedding",
    books: np.ndarray | None = None,
    concurrency: int | None = None,
    rerank_r: int | None = None,
) -> ray.data.Dataset:
    """ADC top-k: (query_id, neighbor_id, rank) with rank ordered by
    (adc score desc, neighbor_id asc). Queries keep their exact vectors
    (asymmetric); the corpus side is scanned as codes.

    ``rerank_r``: two-stage retrieval — take the top ``rerank_r`` ADC
    candidates per query, then rescore THOSE with exact cosine over their
    float vectors (one broadcast-id-set filter pass; the gathered rerank set
    is O(num_queries × rerank_r), driver-bounded by construction) and emit
    the exact top-k. ``rerank_r >= corpus size`` degenerates to the exact
    answer; in practice a few-hundred-candidate rerank recovers near-1.0
    recall at code-scan cost."""
    if books is None:
        books = train_pq(ds, m=m, k=n_codes, column=column)
    qdf = (
        ds.map_batches(
            lambda b: b.filter(
                pa.compute.is_in(b[id_column], value_set=pa.array(query_ids))
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values(id_column)
    )
    q_ids = qdf[id_column].to_numpy()
    q_mat = _normalize(
        np.stack([np.asarray(v, dtype=np.float64) for v in qdf[column]])
    )
    # LUT[q, m, c] = q_sub[m] . codebook[m, c]
    mm, kk, d_sub = books.shape
    q_subs = q_mat.reshape(len(q_mat), mm, d_sub)
    luts = np.einsum("qmd,mkd->qmk", q_subs, books)
    luts_ref = ray.put({"ids": q_ids, "luts": luts})

    n_cand = rerank_r if rerank_r is not None else k
    codes = encode_pq(ds, books, column=column, concurrency=concurrency)
    local = codes.map_batches(
        AdcScorer(luts_ref, k=n_cand, id_column=id_column),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def merge(g: pd.DataFrame, _n=n_cand) -> pd.DataFrame:
        g = g.sort_values(
            ["score", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(_n)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank"]]

    cand = local.groupby("query_id").map_groups(merge, batch_format="pandas")
    if rerank_r is None:
        return cand

    # --- exact rerank of the ADC candidates -------------------------------
    cdf = cand.to_pandas()  # O(num_queries × rerank_r) rows — bounded
    cand_ids = pa.array(np.unique(cdf["neighbor_id"].to_numpy()))
    vecs = (
        ds.map_batches(
            lambda b: b.filter(pa.compute.is_in(b[id_column], value_set=cand_ids)),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values(id_column)
    )
    v_ids = vecs[id_column].to_numpy()
    v_mat = _normalize(
        np.stack([np.asarray(v, dtype=np.float64) for v in vecs[column]])
    )
    pos = {int(i): j for j, i in enumerate(v_ids)}
    out = []
    for qi, qid in enumerate(q_ids):
        mine = cdf[cdf["query_id"] == qid]["neighbor_id"].to_numpy()
        sub = v_mat[[pos[int(i)] for i in mine]]
        scores = sub @ q_mat[qi]
        order = np.lexsort((mine, -scores))[:k]
        out.append(
            pd.DataFrame(
                {
                    "query_id": np.repeat(qid, len(order)),
                    "neighbor_id": mine[order],
                    "rank": np.arange(1, len(order) + 1, dtype=np.int64),
                }
            )
        )
    return ray.data.from_pandas(pd.concat(out, ignore_index=True))


def ivf_pq_topk(
    ds: ray.data.Dataset,
    query_ids: list[int],
    *,
    k: int = 10,
    n_list: int = 16,
    n_probe: int = 4,
    m: int = 8,
    n_codes: int = 16,
    id_column: str = "vec_id",
    column: str = "embedding",
    concurrency: int | None = None,
    rerank_r: int | None = None,
    cent: np.ndarray | None = None,
    books: np.ndarray | None = None,
) -> ray.data.Dataset:
    """IVF-PQ: coarse centroid lists cut the scan to ``n_probe / n_list`` of
    the corpus, PQ codes cut the scanned bytes 32× — the FAISS composition,
    Ray-Data-first. Each batch masks its rows per query to that query's
    probed lists before the ADC gathers (one boolean ``isin`` per query —
    no data moves; the list assignment column is carried with the codes).
    ``n_probe == n_list`` degenerates to exactly ``pq_topk`` (full ADC
    scan), which the tests pin. Optional exact rerank as in ``pq_topk``.

    ``cent`` / ``books`` accept a pre-trained index (train once, query
    many — the production shape; also what ``tools/pq_recall_grid.py``
    sweeps). When omitted they are trained from ``ds``.

    Measured defaults (BASELINE.md round-4 recall grid, 1M 32-dim vectors
    in 16-member near-duplicate families, n_list=1024, m=8, n_codes=64):
    ``n_probe=8, rerank_r=5·k`` reaches recall@10 = 1.0 while scanning
    0.8% of the corpus as codes; ``n_probe=1`` tops out at 0.916 (family
    split across a centroid boundary) regardless of rerank depth."""
    from knowledgegraphs_ray.sim.ivf import assign_lists, train_centroids

    if cent is None:
        cent = train_centroids(ds, n_list=n_list, column=column)
    if books is None:
        books = train_pq(ds, m=m, k=n_codes, column=column)

    qdf = (
        ds.map_batches(
            lambda b: b.filter(
                pa.compute.is_in(b[id_column], value_set=pa.array(query_ids))
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values(id_column)
    )
    q_ids = qdf[id_column].to_numpy()
    q_mat = _normalize(
        np.stack([np.asarray(v, dtype=np.float64) for v in qdf[column]])
    )
    mm, kk, d_sub = books.shape
    luts = np.einsum("qmd,mkd->qmk", q_mat.reshape(len(q_mat), mm, d_sub), books)
    # probed lists per query: n_probe nearest coarse centroids
    probes = np.argsort(-(q_mat @ cent.T), axis=1)[:, :n_probe]
    state_ref = ray.put({"ids": q_ids, "luts": luts, "probes": probes})

    tagged = assign_lists(ds, cent, id_column=id_column, column=column)
    codes = encode_pq(tagged, books, column=column, concurrency=concurrency)

    n_cand = rerank_r if rerank_r is not None else k

    class IvfAdcScorer:
        def __init__(self, ref, k, id_column):
            self.ref, self.k, self.id_column = ref, k, id_column
            self._s = None

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            if self._s is None:
                self._s = ray.get(self.ref)
            st = self._s
            ids = batch[self.id_column].to_numpy(zero_copy_only=False)
            lists = batch["ivf_list"].to_numpy(zero_copy_only=False)
            codes_arr = batch["pq_code"].combine_chunks()
            n = len(codes_arr)
            rows = {"query_id": [], "neighbor_id": [], "score": []}
            if n:
                mcols = codes_arr.flatten().to_numpy(zero_copy_only=False).reshape(
                    n, st["luts"].shape[1]
                )
                mrange = np.arange(st["luts"].shape[1])
                for qi in range(len(st["ids"])):
                    mask = np.isin(lists, st["probes"][qi])
                    if not mask.any():
                        continue
                    sub = mcols[mask]
                    scores = st["luts"][qi][mrange[None, :], sub].sum(axis=1)
                    kk2 = min(self.k, len(scores))
                    top = np.argpartition(-scores, kk2 - 1)[:kk2]
                    rows["query_id"].append(np.repeat(st["ids"][qi], kk2))
                    rows["neighbor_id"].append(ids[mask][top])
                    rows["score"].append(scores[top])
            if not rows["query_id"]:
                return pd.DataFrame(
                    {
                        "query_id": pd.Series([], dtype="int64"),
                        "neighbor_id": pd.Series([], dtype="int64"),
                        "score": pd.Series([], dtype="float64"),
                    }
                )
            return pd.DataFrame({c: np.concatenate(v) for c, v in rows.items()})

    local = codes.map_batches(
        IvfAdcScorer(state_ref, n_cand, id_column),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def merge(g: pd.DataFrame, _n=n_cand) -> pd.DataFrame:
        g = g.sort_values(
            ["score", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(_n)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank"]]

    cand = local.groupby("query_id").map_groups(merge, batch_format="pandas")
    if rerank_r is None:
        return cand

    cdf = cand.to_pandas()
    cand_ids = pa.array(np.unique(cdf["neighbor_id"].to_numpy()))
    vecs = (
        ds.map_batches(
            lambda b: b.filter(pa.compute.is_in(b[id_column], value_set=cand_ids)),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values(id_column)
    )
    v_ids = vecs[id_column].to_numpy()
    v_mat = _normalize(
        np.stack([np.asarray(v, dtype=np.float64) for v in vecs[column]])
    )
    pos = {int(i): j for j, i in enumerate(v_ids)}
    out = []
    for qi, qid in enumerate(q_ids):
        mine = cdf[cdf["query_id"] == qid]["neighbor_id"].to_numpy()
        sub = v_mat[[pos[int(i)] for i in mine]]
        scores = sub @ q_mat[qi]
        order = np.lexsort((mine, -scores))[:k]
        out.append(
            pd.DataFrame(
                {
                    "query_id": np.repeat(qid, len(order)),
                    "neighbor_id": mine[order],
                    "rank": np.arange(1, len(order) + 1, dtype=np.int64),
                }
            )
        )
    return ray.data.from_pandas(pd.concat(out, ignore_index=True))
