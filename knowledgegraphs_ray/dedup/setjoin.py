"""Exact set-similarity self-join with prefix filtering (AllPairs /
PPJoin-lite, Bayardo et al. WWW'07; Xiao et al. WWW'08) — every document
pair whose token-set Jaccard ≥ t, EXACTLY (no sketch), without the all-pairs
blowup the reference's BertMap-style blocking avoids only probabilistically
(`dedup/minhash.py` is the sketch tier; this is the exact tier for
moderate-vocabulary ER workloads).

Prefix theorem: under ANY fixed total order of tokens, two sets with
Jaccard ≥ t must share at least one token among the first
``p(x) = |x| − ⌈t·|x|⌉ + 1`` tokens of each (rarest-first order makes those
prefixes selective, it is not needed for correctness).  So candidate pairs
are generated ONLY inside per-token groups of prefix rows, then verified
exactly.

Scale shape:
* tokenization + per-doc distinct + prefix selection are all MAP-SIDE: the
  global rarity order broadcasts once as a token→rank Series (``ray.put``),
  so the corpus text never shuffles — only slim (rank, doc, size) prefix
  rows (≈ (1−t)·Σ|x| of them) enter the ONE candidate exchange.
* a hot prefix token yields O(group²) candidates → ``max_token_group``
  guard raises with the PPJoin remedy (raise t, pre-drop stop-tokens, or
  fall back to minhash) rather than silently blowing up.
* verification joins candidates back to per-doc sorted token LISTS (two
  doc-keyed hash joins, candidate-bounded) and intersects vectorized per
  row; exact ``jac_micro = (1e6·|∩|) // |∪|`` filters ≥ t_micro — integer
  floor-division, bit-identical to the DuckDB twin.
* the token→rank vocabulary rides the driver (fail-fast above
  ``vocab_limit``): open web-scale vocabularies belong to the minhash
  tier, a documented boundary like text/overlap.py's driver_limit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from knowledgegraphs_ray.extract.joins import native_join
from knowledgegraphs_ray.util.blocks import compact_nonempty
from knowledgegraphs_ray.util.fastagg import sum_partials


def _nparts() -> int:
    return max(2, min(32, int(ray.cluster_resources().get("CPU", 8))))


def _doc_tokens(
    df: pd.DataFrame, text_col: str, id_col: str, shingle_k: int = 1
) -> pd.DataFrame:
    """Distinct set elements per doc: unigram tokens (k=1) or ordered
    k-token shingles joined with single spaces (k>1). Shingling restores
    prefix-filter selectivity on tiny-vocabulary corpora, where every
    unigram is hot and AllPairs degrades to the quadratic join."""
    toks = df[text_col].str.split(" ")
    out = df[[id_col]].copy()
    out["t"] = toks
    out = out.explode("t", ignore_index=True)
    out = out[(out["t"].notna()) & (out["t"] != "")]
    if shingle_k > 1:
        k = shingle_k
        ids = out[id_col].to_numpy()
        t = out["t"].to_numpy(dtype=object)
        n = len(t)
        if n < k:
            return out.iloc[0:0][[id_col, "t"]]
        # explode preserves per-doc token order; a window is valid when its
        # first and last token belong to the same doc
        m = n - k + 1
        sh = t[0:m].copy()
        for j in range(1, k):
            sh = sh + " "
            sh = sh + t[j : m + j]
        same = ids[0:m] == ids[k - 1 : n]
        out = pd.DataFrame({id_col: ids[0:m][same], "t": sh[same]})
    return out.drop_duplicates([id_col, "t"])


def _rarity_and_prefixes(
    docs: ray.data.Dataset,
    *,
    text_col: str,
    id_col: str,
    t_micro: int,
    vocab_limit: int,
    shingle_k: int,
    nparts: int,
):
    """One rarity pass at a fixed ``shingle_k``: -> (n_vocab, rank_ref,
    pref) with pref the slim (rank, doc, size, bucket) prefix rows."""
    tok_parts = docs.map_batches(
        lambda df: _doc_tokens(df, text_col, id_col, shingle_k)
        .groupby("t", as_index=False, sort=False)
        .size()
        .rename(columns={"size": "df"}),
        batch_format="pandas",
    )
    dfreq = sum_partials(tok_parts, keys=["t"], sum_cols=["df"])
    n_vocab = dfreq.count()
    if n_vocab > vocab_limit:
        raise RuntimeError(
            f"set_similarity_join: vocabulary has {n_vocab} tokens "
            f"(> vocab_limit={vocab_limit}); the token→rank order must stay "
            "driver-broadcastable — use dedup/minhash.py for open vocabularies"
        )
    if n_vocab == 0:
        return 0, None, None
    vdf = dfreq.to_pandas().sort_values(["df", "t"], kind="mergesort")
    rank = pd.Series(
        np.arange(len(vdf), dtype=np.int64), index=vdf["t"].to_numpy()
    )
    rank_ref = ray.put(rank)

    # ---- map-side prefix emission: (rank, doc, size, bucket) ----
    def prefixes(df: pd.DataFrame) -> pd.DataFrame:
        lut = ray.get(rank_ref)
        dt = _doc_tokens(df, text_col, id_col, shingle_k)
        r = dt["t"].map(lut).to_numpy(dtype=np.int64)
        ids = dt[id_col].to_numpy()
        order = np.lexsort((r, ids))
        ids, r = ids[order], r[order]
        codes, starts = np.unique(ids, return_index=True)
        sizes = np.diff(np.r_[starts, len(ids)]).astype(np.int64)
        # prefix length p = s - ceil(t*s) + 1 (integer ceil)
        plen = sizes - (-(-(t_micro * sizes) // 1_000_000)) + 1
        pos = np.arange(len(ids), dtype=np.int64) - np.repeat(starts, sizes)
        keep = pos < np.repeat(plen, sizes)
        out = pd.DataFrame(
            {
                "r": r[keep],
                "doc": ids[keep],
                "size": np.repeat(sizes, sizes)[keep],
            }
        )
        out["__b"] = (out["r"].to_numpy() % nparts).astype(np.int64)
        return out

    return n_vocab, rank_ref, docs.map_batches(prefixes, batch_format="pandas")


def _prefix_group_stats(pref: ray.data.Dataset) -> tuple[int, int]:
    """-> (candidate_volume, max_group) from the slim prefix rows: group
    sizes per prefix-token rank, Σ C(g, 2) pairs BEFORE generation — the
    exact cost the emit stage would pay, measured from partials the
    rarity pass already produces."""
    parts = pref.map_batches(
        lambda df: df.groupby("r", as_index=False, sort=False)
        .size()
        .rename(columns={"size": "c"}),
        batch_format="pandas",
    )
    g = sum_partials(parts, keys=["r"], sum_cols=["c"]).to_pandas()
    if g.empty:
        return 0, 0
    c = g["c"].to_numpy(dtype=np.int64)
    return int((c * (c - 1) // 2).sum()), int(c.max())


AUTO_SHINGLE_KS = (1, 3, 5)


def choose_shingle_k(
    docs: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_micro: int = 700_000,
    vocab_limit: int = 5_000_000,
    max_token_group: int = 20_000,
    auto_candidate_limit: int = 2_000_000,
) -> int:
    """Deterministic degeneracy steering: the smallest k in
    ``AUTO_SHINGLE_KS`` whose prefix-group candidate volume Σ C(g, 2)
    fits ``auto_candidate_limit`` with every group ≤ ``max_token_group``.
    Raises with the minhash remedy when even the largest k is degenerate
    (near-identical corpus: shingling cannot help)."""
    t_micro = int(threshold_micro)
    nparts = _nparts()
    last = None
    for k in AUTO_SHINGLE_KS:
        n_vocab, _, pref = _rarity_and_prefixes(
            docs,
            text_col=text_col,
            id_col=id_col,
            t_micro=t_micro,
            vocab_limit=vocab_limit,
            shingle_k=k,
            nparts=nparts,
        )
        if n_vocab == 0:
            return k  # empty token sets at this k -> empty result either way
        vol, maxg = _prefix_group_stats(pref)
        last = (k, vol, maxg)
        if vol <= auto_candidate_limit and maxg <= max_token_group:
            return k
    k, vol, maxg = last
    raise RuntimeError(
        f"set_similarity_join: degenerate corpus — at shingle_k={k} the "
        f"prefix groups still yield {vol} candidate pairs (limit "
        f"{auto_candidate_limit}, max group {maxg}); pair emission is "
        "O(group²) — use the minhash tier (dedup/minhash.py) for "
        "near-identical corpora"
    )


def set_similarity_join(
    docs: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_micro: int = 700_000,
    vocab_limit: int = 5_000_000,
    max_token_group: int = 20_000,
    shingle_k: int | str = 1,
    auto_candidate_limit: int = 2_000_000,
) -> ray.data.Dataset:
    """-> (u, v, inter, size_u, size_v, jac_micro) for every pair with
    token-set Jaccard ≥ threshold_micro/1e6; u < v by id order.

    ``shingle_k > 1`` computes Jaccard over ordered k-token shingle sets
    instead of unigram sets — REQUIRED for tiny-vocabulary corpora, where
    every unigram is corpus-hot and prefix filtering degrades to the
    quadratic join (sf0.1 fixture: 31 distinct tokens, max df 3923/5000
    -> unigram 61.6 s vs 3-shingle seconds at identical output quality).

    ``shingle_k="auto"``: measure the EXACT candidate volume Σ C(g, 2)
    from the prefix-group sizes (a slim aggregate over rows the rarity
    pass produces anyway) and escalate k through ``AUTO_SHINGLE_KS``
    until it fits ``auto_candidate_limit`` and every group fits
    ``max_token_group`` — degeneracy is steered around BEFORE candidate
    generation instead of raising mid-run. Raises (naming the minhash
    tier) if even the largest k stays degenerate. The chosen k changes
    the similarity SEMANTICS (shingle sets, not unigram sets), so oracle
    comparisons must pin an explicit k; ``choose_shingle_k`` exposes the
    decision."""
    t_micro = int(threshold_micro)
    if not (0 < t_micro <= 1_000_000):
        raise ValueError("threshold_micro must be in (0, 1e6]")
    nparts = _nparts()

    PAIR_SCHEMA = pa.schema(
        [
            ("u", pa.int64()),
            ("v", pa.int64()),
            ("inter", pa.int64()),
            ("size_u", pa.int64()),
            ("size_v", pa.int64()),
            ("jac_micro", pa.int64()),
        ]
    )

    if shingle_k == "auto":
        shingle_k = choose_shingle_k(
            docs,
            text_col=text_col,
            id_col=id_col,
            threshold_micro=t_micro,
            vocab_limit=vocab_limit,
            max_token_group=max_token_group,
            auto_candidate_limit=auto_candidate_limit,
        )
    shingle_k = int(shingle_k)

    n_vocab, rank_ref, pref = _rarity_and_prefixes(
        docs,
        text_col=text_col,
        id_col=id_col,
        t_micro=t_micro,
        vocab_limit=vocab_limit,
        shingle_k=shingle_k,
        nparts=nparts,
    )
    if n_vocab == 0:
        return ray.data.from_arrow(PAIR_SCHEMA.empty_table())

    # ---- candidate pairs inside per-token groups ----
    def emit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["r", "doc"], kind="mergesort").drop_duplicates(
            ["r", "doc"]
        )
        codes, counts = np.unique(g["r"].to_numpy(), return_counts=True)
        if len(counts) and int(counts.max()) > max_token_group:
            hot = codes[int(np.argmax(counts))]
            raise RuntimeError(
                f"set_similarity_join: prefix token rank {hot} appears in "
                f"{int(counts.max())} prefixes (> max_token_group="
                f"{max_token_group}); pair emission is O(group²) — raise the "
                "threshold, stop-list frequent tokens, or use the minhash tier"
            )
        from knowledgegraphs_ray.graph.triangles import (
            _pairs_within_sorted_groups,
        )

        grp, _ = pd.factorize(g["r"], sort=False)
        a, b = _pairs_within_sorted_groups(grp)
        ids = g["doc"].to_numpy()
        szs = g["size"].to_numpy().astype(np.int64)
        ua, vb = ids[a], ids[b]
        su, sv = szs[a], szs[b]
        # canonical u < v (within-token rows are doc-sorted already)
        lo = np.minimum(su, sv)
        hi = np.maximum(su, sv)
        keep = lo * np.int64(1_000_000) >= np.int64(t_micro) * hi
        out = pd.DataFrame(
            {
                "u": ua[keep].astype(np.int64),
                "v": vb[keep].astype(np.int64),
                "size_u": su[keep],
                "size_v": sv[keep],
            }
        ).drop_duplicates(["u", "v"])
        out["__one"] = np.int64(1)
        return out

    CAND_ONE = pa.schema(
        [
            ("u", pa.int64()),
            ("v", pa.int64()),
            ("size_u", pa.int64()),
            ("size_v", pa.int64()),
            ("__one", pa.int64()),
        ]
    )
    pairs = compact_nonempty(
        pref.groupby("__b").map_groups(emit, batch_format="pandas"), CAND_ONE
    )
    CAND_SCHEMA = pa.schema(
        [
            ("u", pa.int64()),
            ("v", pa.int64()),
            ("size_u", pa.int64()),
            ("size_v", pa.int64()),
        ]
    )
    if pairs.count() == 0:
        return ray.data.from_arrow(PAIR_SCHEMA.empty_table())
    cand = sum_partials(
        pairs, keys=["u", "v", "size_u", "size_v"], sum_cols=["__one"]
    )
    cand = cand.map_batches(
        lambda t: t.select(["u", "v", "size_u", "size_v"]).cast(CAND_SCHEMA),
        batch_format="pyarrow",
    ).materialize()  # count() below + the verify join both reuse it
    if cand.count() == 0:
        return ray.data.from_arrow(PAIR_SCHEMA.empty_table())

    # ---- verify: candidate-bounded joins to per-doc token-rank lists ----
    def toklist(df: pd.DataFrame) -> pa.Table:
        lut = ray.get(rank_ref)
        dt = _doc_tokens(df, text_col, id_col, shingle_k)
        r = dt["t"].map(lut).to_numpy(dtype=np.int64)
        ids = dt[id_col].to_numpy()
        order = np.lexsort((r, ids))
        ids, r = ids[order], r[order]
        docs_u, starts = np.unique(ids, return_index=True)
        # pack each doc's sorted rank vector into ONE binary cell (Acero
        # joins carry binary payloads but not list columns): the offsets
        # are byte positions into the contiguous int64 buffer — zero-copy
        byte_offsets = (np.r_[starts, len(r)].astype(np.int64) * 8)
        blob = pa.Array.from_buffers(
            pa.large_binary(),
            len(docs_u),
            [None, pa.py_buffer(byte_offsets.tobytes()), pa.py_buffer(r.tobytes())],
        )
        return pa.table({"doc": pa.array(docs_u, pa.int64()), "toks": blob})

    lists = docs.map_batches(toklist, batch_format="pandas")
    # native_join compacts 0-row blocks on both sides itself (r5) — no
    # per-input compact_nonempty guards needed here anymore
    lu = lists.map_batches(
        lambda t: t.rename_columns(["u", "toks_u"]), batch_format="pyarrow"
    )
    lv = lists.map_batches(
        lambda t: t.rename_columns(["v", "toks_v"]), batch_format="pyarrow"
    )
    JOIN1 = pa.schema(
        list(zip(CAND_SCHEMA.names, CAND_SCHEMA.types))
        + [("toks_u", pa.large_binary())]
    )
    half = native_join(
        cand, lu, left_on="u", right_on="u", num_partitions=nparts
    ).map_batches(
        lambda t: t.select(JOIN1.names).cast(JOIN1), batch_format="pyarrow"
    ).materialize()  # count() below + the second join both reuse it
    if half.count() == 0:
        return ray.data.from_arrow(PAIR_SCHEMA.empty_table())
    joined = native_join(
        half, lv, left_on="v", right_on="v", num_partitions=nparts
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        inter = np.fromiter(
            (
                len(
                    np.intersect1d(
                        np.frombuffer(a, np.int64),
                        np.frombuffer(b, np.int64),
                        assume_unique=True,
                    )
                )
                for a, b in zip(df["toks_u"], df["toks_v"])
            ),
            dtype=np.int64,
            count=len(df),
        )
        su = df["size_u"].to_numpy().astype(np.int64)
        sv = df["size_v"].to_numpy().astype(np.int64)
        union = su + sv - inter
        jac = np.where(union > 0, (1_000_000 * inter) // np.maximum(union, 1), 0)
        out = pd.DataFrame(
            {
                "u": df["u"],
                "v": df["v"],
                "inter": inter,
                "size_u": su,
                "size_v": sv,
                "jac_micro": jac.astype(np.int64),
            }
        )
        return out[out["jac_micro"] >= t_micro]

    return compact_nonempty(
        joined.map_batches(verify, batch_format="pandas"), PAIR_SCHEMA
    )


def set_similarity_oracle_sql(
    *,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_micro: int = 700_000,
    shingle_k: int = 1,
) -> str:
    """DuckDB twin: distinct tokens (or space-joined k-shingles) per doc,
    exact pair intersection via self-join, identical integer
    floor-division jac_micro filter."""
    if shingle_k > 1:
        k = shingle_k
        join_expr = " || ' ' || ".join(f"l[i+{j}]" for j in range(k))
        toks_cte = f"""toks AS (
  SELECT DISTINCT doc, t FROM (
    SELECT {id_col} AS doc,
           UNNEST(list_transform(range(1, len(l) - {k - 2}),
                                 i -> {join_expr})) AS t
    FROM (SELECT {id_col},
                 list_filter(string_split({text_col}, ' '),
                             x -> x <> '') AS l
          FROM {table}))
)"""
    else:
        toks_cte = f"""toks AS (
  SELECT DISTINCT {id_col} AS doc, t FROM (
    SELECT {id_col}, UNNEST(string_split({text_col}, ' ')) AS t FROM {table})
  WHERE t <> ''
)"""
    return f"""
WITH {toks_cte},
sz AS (SELECT doc, COUNT(*)::BIGINT AS s FROM toks GROUP BY doc),
inter AS (
  SELECT a.doc AS u, b.doc AS v, COUNT(*)::BIGINT AS i
  FROM toks a JOIN toks b ON a.t = b.t AND a.doc < b.doc
  GROUP BY 1, 2
)
SELECT inter.u, inter.v, inter.i AS inter,
       su.s AS size_u, sv.s AS size_v,
       (1000000 * inter.i) // (su.s + sv.s - inter.i) AS jac_micro
FROM inter
JOIN sz su ON su.doc = inter.u
JOIN sz sv ON sv.doc = inter.v
WHERE (1000000 * inter.i) // (su.s + sv.s - inter.i) >= {threshold_micro}
"""
