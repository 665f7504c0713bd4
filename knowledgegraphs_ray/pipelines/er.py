"""End-to-end entity-resolution chain: sorted-neighborhood blocking ->
exact token-Jaccard verification -> connected components -> canonical-id
assignment. The composed record-linkage pipeline a dedup/canonicalization
run executes, built entirely from the engine's own stages:

1. **Block + verify (default ``verify="halo"``)**: SNM candidates are
   pairs within ``window`` positions of the (text-prefix, id) sort — and
   they are POSITIONALLY ADJACENT in that sort, so blocking and
   verification fuse into one pass over the sorted stream: each block
   ships only the (window-1)-row (id, text) head of its successors as a
   halo (the ``linking/blocking.py`` / ``util/segrank.py`` halo pattern),
   tokenizes its rows ONCE in-task, and emits exact distinct-token
   Jaccard edges directly. Text shuffles exactly once (the sort); the
   former O(window x corpus-tokens) double token-table join is gone.
2. **Verify, join tier (``verify="join"``)**: kept for NON-POSITIONAL
   candidate sources — candidates join the per-doc distinct-token table
   on the left id, the result joins it again on (right id, token);
   surviving rows ARE the pair's intersection tokens, merged through
   ``fastagg``. Same integer ``(1e6 * inter) // union`` floor rule; a
   tier-equivalence pytest pins both tiers hash-identical.
3. **Resolve** (``dedup/minhash.components_from_pairs`` /
   ``components_by_propagation``): undirected components over the verified
   edges; driver union-find below ``max_driver_edges``, distributed
   min-label propagation above.
4. **Assign**: every record maps to min(component) — records outside any
   component map to themselves. The component membership table is
   dup-bounded (only records with a verified near-duplicate), so it
   broadcasts; the corpus itself streams map-only.

Contrast with ``canon/canonicalize.py`` (mention-level, similarity via
normalized keys) and ``curation_chain`` (document filters + minhash): this
chain is the RECORD-LINKAGE composition — blocking-based candidates with
an exact verify, the Hernandez-Stolfo pipeline shape.

Reference anchor: AnnotationSelection/UnionFind canonicalization
(Evaluator.java candidate-pair flow); the SNM front end replaces the
reference's exact/IDF candidate lookup for the sorted-key regime.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from knowledgegraphs_ray.extract.joins import native_join
from knowledgegraphs_ray.util.fastagg import merge_partials, sum_partials

_EDGE_SCHEMA = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])


def _nparts() -> int:
    return max(8, int(ray.cluster_resources().get("CPU", 8)))


@ray.remote
def _idtext_head(block: pa.Table, id_col: str, text_col: str, k: int) -> pa.Table:
    """First k (id, text) rows of a block — the halo a predecessor needs
    to complete its tail rows' windows."""
    return block.select([id_col, text_col]).slice(0, min(k, block.num_rows))


@ray.remote
def _verify_block(
    block: pa.Table,
    id_col: str,
    text_col: str,
    window: int,
    threshold_micro: int,
    *halos: pa.Table,
) -> pa.Table:
    """Edges (doc_a, doc_b) with exact distinct-token Jaccard >= threshold
    for every pair (row r, row r+d), d in 1..window-1, the tail rows
    completing their windows from the successor blocks' (id, text) heads.
    Tokens are computed in-task — no token row ever leaves the task."""
    if block.num_rows == 0:
        return _EDGE_SCHEMA.empty_table()
    tabs = [block.select([id_col, text_col])]
    tabs += [h for h in halos if h.num_rows > 0]
    ext = pa.concat_tables(tabs)
    ids = ext[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    # one tokenization per row; distinct-token sets via C-speed set ops —
    # the same " "-split / drop-empty semantics as setjoin._doc_tokens
    texts = ext[text_col].to_pylist()
    toks: list[frozenset] = [
        frozenset(t for t in (s.split(" ") if s else ()) if t) for s in texts
    ]
    sizes = np.fromiter((len(t) for t in toks), dtype=np.int64, count=len(toks))
    n = block.num_rows
    t_micro = int(threshold_micro)
    out_a: list[int] = []
    out_b: list[int] = []
    for d in range(1, window):
        m = min(n, len(ids) - d)
        for r in range(m):
            su = sizes[r]
            sv = sizes[r + d]
            # size prefilter: jac >= t requires min(s)*1e6 >= t*max(s)
            if su <= sv:
                lo, hi = su, sv
            else:
                lo, hi = sv, su
            if lo * 1_000_000 < t_micro * hi or hi == 0:
                continue
            inter = len(toks[r] & toks[r + d])
            union = su + sv - inter
            if union > 0 and (1_000_000 * inter) // union >= t_micro:
                out_a.append(int(ids[r]))
                out_b.append(int(ids[r + d]))
    if not out_a:
        return _EDGE_SCHEMA.empty_table()
    return pa.table(
        {
            "doc_a": np.asarray(out_a, np.int64),
            "doc_b": np.asarray(out_b, np.int64),
        },
        schema=_EDGE_SCHEMA,
    )


def _halo_edges(
    docs: ray.data.Dataset,
    *,
    id_col: str,
    text_col: str,
    prefix_chars: int,
    window: int,
    threshold_micro: int,
) -> ray.data.Dataset:
    """Fused SNM block + verify: one payload sort, window-sized (id, text)
    halo per block boundary, in-task tokenization, zero joins."""

    def key(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: t[id_col],
                "bkey": pc.utf8_slice_codeunits(t[text_col], 0, prefix_chars),
                text_col: t[text_col],
            }
        )

    sorted_ds = docs.map_batches(key, batch_format="pyarrow").sort(
        ["bkey", id_col]
    )
    refs = sorted_ds.to_arrow_refs()
    from knowledgegraphs_ray.util.blocks import _num_rows

    counts = ray.get([_num_rows.remote(r) for r in refs])
    if sum(counts) < 2:
        return ray.data.from_arrow(_EDGE_SCHEMA.empty_table())
    k = window - 1
    heads = [_idtext_head.remote(r, id_col, text_col, k) for r in refs]
    out = []
    for i, r in enumerate(refs):
        need, nxt = k, []
        j = i + 1
        while j < len(refs) and need > 0:
            nxt.append(heads[j])
            need -= min(counts[j], k)
            j += 1
        out.append(
            _verify_block.remote(
                r, id_col, text_col, window, threshold_micro, *nxt
            )
        )
    return ray.data.from_arrow_refs(out)


def _join_edges(
    docs: ray.data.Dataset,
    *,
    id_col: str,
    text_col: str,
    prefix_chars: int,
    window: int,
    threshold_micro: int,
    hash_tokens: bool,
) -> ray.data.Dataset | None:
    """Join-shaped verify for non-positional candidate sources: SNM pairs
    join the per-doc distinct-token table twice; surviving rows are the
    intersection. Returns None when no candidate pair shares a token."""
    from knowledgegraphs_ray.dedup.setjoin import _doc_tokens
    from knowledgegraphs_ray.linking.blocking import sorted_neighborhood_pairs

    def key(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: t[id_col],
                "bkey": pc.utf8_slice_codeunits(t[text_col], 0, prefix_chars),
            }
        )

    cand = sorted_neighborhood_pairs(
        docs.map_batches(key, batch_format="pyarrow"),
        key_cols=["bkey"],
        id_col=id_col,
        window=window,
    ).materialize()
    if cand.count() == 0:
        return None

    # hash_tokens: the 100-TB knob for THIS tier — 8-byte token keys
    # through the two verify joins instead of literal strings (same 64-bit
    # collision class as dedup/spans.py; a collision only ever inflates an
    # intersection).  Default False so the oracle compares literal tokens.
    def tok_rows(df: pd.DataFrame) -> pd.DataFrame:
        dt = _doc_tokens(df, text_col, id_col)
        out = dt.rename(columns={id_col: "doc"}).astype({"doc": "int64"})
        if hash_tokens:
            from knowledgegraphs_ray.text.analysis import rolling_hashes

            h = rolling_hashes(pa.array(out["t"], pa.string()))
            out = pd.DataFrame(
                {"doc": out["doc"].to_numpy(), "t": h.view(np.int64)}
            )
        return out

    toks = docs.map_batches(tok_rows, batch_format="pandas")

    def size_partials(df: pd.DataFrame) -> pd.DataFrame:
        dt = _doc_tokens(df, text_col, id_col)
        p = dt.groupby(id_col, as_index=False).size().rename(columns={"size": "s"})
        return p.rename(columns={id_col: "doc"}).astype({"doc": "int64", "s": "int64"})

    sz = sum_partials(
        docs.map_batches(size_partials, batch_format="pandas"),
        keys=["doc"],
        sum_cols=["s"],
    )

    n = _nparts()
    left_toks = native_join(
        cand, toks, left_on="id_a", right_on="doc", num_partitions=n
    ).select_columns(["id_a", "id_b", "t"])
    inter_rows = native_join(
        left_toks,
        toks,
        left_on=("id_b", "t"),
        right_on=("doc", "t"),
        num_partitions=n,
    ).select_columns(["id_a", "id_b"])

    def pair_partials(df: pd.DataFrame) -> pd.DataFrame:
        p = df.groupby(["id_a", "id_b"], as_index=False).size()
        return p.rename(columns={"size": "inter"}).astype(
            {"id_a": "int64", "id_b": "int64", "inter": "int64"}
        )

    inter = merge_partials(
        inter_rows.map_batches(pair_partials, batch_format="pandas"),
        keys=["id_a", "id_b"],
        agg={"inter": "sum"},
    ).materialize()
    if inter.count() == 0:  # candidates share no tokens at all
        return None
    with_su = native_join(
        inter, sz, left_on="id_a", right_on="doc", num_partitions=n
    )
    with_sv = native_join(
        with_su.select_columns(["id_a", "id_b", "inter", "s"]).rename_columns(
            {"s": "size_u"}
        ),
        sz,
        left_on="id_b",
        right_on="doc",
        num_partitions=n,
    )

    def edge_filter(t: pa.Table) -> pa.Table:
        i = t["inter"].to_numpy(zero_copy_only=False).astype(np.int64)
        su = t["size_u"].to_numpy(zero_copy_only=False).astype(np.int64)
        sv = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        jac = (1_000_000 * i) // (su + sv - i)
        keep = jac >= threshold_micro
        return pa.table(
            {
                "doc_a": t["id_a"].to_numpy(zero_copy_only=False)[keep],
                "doc_b": t["id_b"].to_numpy(zero_copy_only=False)[keep],
            },
            schema=_EDGE_SCHEMA,
        )

    return with_sv.map_batches(edge_filter, batch_format="pyarrow")


def er_resolve(
    docs: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_chars: int = 16,
    window: int = 4,
    threshold_micro: int = 700_000,
    max_driver_edges: int = 1_000_000,
    propagation_max_iter: int = 100,
    hash_tokens: bool = False,
    verify: str = "halo",
) -> ray.data.Dataset:
    """-> (``id_col``, canon_id) for EVERY input record, sorted by id;
    canon_id = min record id of the verified-duplicate component (self for
    singletons). See module doc for the tiers; ``verify`` picks "halo"
    (fused in-block, default) or "join" (non-positional candidate shape)."""
    assert verify in ("halo", "join")
    ids_only = docs.select_columns([id_col])

    def selfmap(t: pa.Table) -> pa.Table:
        i = t[id_col].cast(pa.int64())
        return pa.table(
            {id_col: i, "canon_id": i},
            schema=pa.schema([(id_col, pa.int64()), ("canon_id", pa.int64())]),
        )

    if verify == "halo":
        edges = _halo_edges(
            docs,
            id_col=id_col,
            text_col=text_col,
            prefix_chars=prefix_chars,
            window=window,
            threshold_micro=threshold_micro,
        ).materialize()
    else:
        e = _join_edges(
            docs,
            id_col=id_col,
            text_col=text_col,
            prefix_chars=prefix_chars,
            window=window,
            threshold_micro=threshold_micro,
            hash_tokens=hash_tokens,
        )
        if e is None:
            return ids_only.map_batches(selfmap, batch_format="pyarrow").sort(
                id_col
            )
        edges = e.materialize()

    # --- 3 + 4. resolve and assign ----------------------------------------
    n_edges = edges.count()
    if n_edges == 0:
        return ids_only.map_batches(selfmap, batch_format="pyarrow").sort(id_col)

    if n_edges <= max_driver_edges:
        from knowledgegraphs_ray.dedup.minhash import components_from_pairs

        lab = components_from_pairs(edges, max_driver_edges=max_driver_edges)
        nodes = lab["doc_id"].to_numpy(dtype=np.int64)
        comps = lab["component"].to_numpy(dtype=np.int64)
    else:
        from knowledgegraphs_ray.dedup.minhash import components_by_propagation

        # SNM edge sets are PATH-shaped (window adjacency), so component
        # diameter grows with dup-group size — give propagation headroom
        lab = components_by_propagation(
            edges, max_iter=propagation_max_iter
        ).to_pandas()
        nodes = lab["node"].to_numpy(dtype=np.int64)
        comps = lab["label"].to_numpy(dtype=np.int64)
    order = np.argsort(nodes)
    nodes_ref = ray.put(nodes[order])
    comps_ref = ray.put(comps[order])

    def assign(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ns = ray.get(nodes_ref)
        cs = ray.get(comps_ref)
        loc = np.searchsorted(ns, ids)
        loc[loc == len(ns)] = 0
        hit = ns[loc] == ids
        canon = np.where(hit, cs[loc], ids)
        return pa.table(
            {id_col: ids, "canon_id": canon},
            schema=pa.schema([(id_col, pa.int64()), ("canon_id", pa.int64())]),
        )

    return ids_only.map_batches(assign, batch_format="pyarrow").sort(id_col)


def er_resolve_oracle_sql(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_chars: int = 16,
    window: int = 4,
    threshold_micro: int = 700_000,
) -> str:
    """DuckDB twin: rank-gap blocking join + distinct-token intersection +
    identical floor-division threshold + recursive-CTE components + a
    coalesce(self) left join for singletons. Output id column is named
    ``id_col``, matching the engine."""
    w1 = window - 1
    return f"""
WITH RECURSIVE r AS (
  SELECT {id_col} AS id,
         row_number() OVER (
           ORDER BY substr({text_col}, 1, {prefix_chars}), {id_col}) AS rn
  FROM {table}
), cand AS (
  SELECT a.id AS u, b.id AS v
  FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + {w1}
), toks AS (
  SELECT DISTINCT {id_col} AS doc, t FROM (
    SELECT {id_col}, UNNEST(string_split({text_col}, ' ')) AS t FROM {table})
  WHERE t <> ''
), sz AS (
  SELECT doc, COUNT(*)::BIGINT AS s FROM toks GROUP BY doc
), inter AS (
  SELECT c.u, c.v, COUNT(*)::BIGINT AS i
  FROM cand c
  JOIN toks a ON a.doc = c.u
  JOIN toks b ON b.doc = c.v AND b.t = a.t
  GROUP BY 1, 2
), e0 AS (
  SELECT inter.u, inter.v FROM inter
  JOIN sz su ON su.doc = inter.u
  JOIN sz sv ON sv.doc = inter.v
  WHERE (1000000 * inter.i) // (su.s + sv.s - inter.i) >= {threshold_micro}
), edges AS (
  SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0
), nodes AS (
  SELECT DISTINCT u AS node FROM edges
), walk(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.u, w.label FROM edges e JOIN walk w ON w.node = e.v
), comp AS (
  SELECT node, min(label) AS component FROM walk GROUP BY node
)
SELECT d.{id_col} AS {id_col},
       coalesce(c.component, d.{id_col}) AS canon_id
FROM {table} d LEFT JOIN comp c ON c.node = d.{id_col}
ORDER BY {id_col}
"""
