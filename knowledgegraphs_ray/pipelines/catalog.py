"""Query catalog — the named, oracle-checked pipelines exposed via
``__ray_entry__.queries()`` / ``oracle_sql()``.

Each entry is a callable ``sf_dir -> Dataset | DataFrame`` whose result the
driver compares against the DuckDB SQL in ``ORACLE`` (generated from the same
compiled plans where possible — see ``oracle.sqlgen``).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from knowledgegraphs_ray.dedup.exact import dedup_exact
from knowledgegraphs_ray.extract.containment import containment_check
from knowledgegraphs_ray.extract.kernel import decode_triples
from knowledgegraphs_ray.oracle import sqlgen
from knowledgegraphs_ray.pipelines.relational import extract_kg
from knowledgegraphs_ray.pipelines.transcripts import (
    extract_transcript_triples,
    transcripts_from_events,
)
from knowledgegraphs_ray.rules.compiler import compile_rules
from knowledgegraphs_ray.schema.model import tpch_schema
from knowledgegraphs_ray.pipelines import linking_pipeline as lp
from knowledgegraphs_ray.sim.ann import brute_force_topk
from knowledgegraphs_ray.text import analysis as ta

STAR_TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]


def _docs(sf_dir: str, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# --- Ray-side queries -------------------------------------------------------


def q_kg_triples_customer(sf_dir: str):
    return decode_triples(extract_kg(sf_dir, ["customer"]))


def q_kg_triples_orders(sf_dir: str):
    return decode_triples(extract_kg(sf_dir, ["orders"]))


def q_kg_triples_star(sf_dir: str):
    return decode_triples(extract_kg(sf_dir, STAR_TABLES))


def q_kg_attr_classes_customer(sf_dir: str):
    return decode_triples(extract_kg(sf_dir, ["customer"], attrs_to_classes=True))


def q_kg_transcripts(sf_dir: str):
    return decode_triples(extract_transcript_triples(transcripts_from_events(sf_dir)))


def q_tool_transitions(sf_dir: str):
    """Tool-call transition counts over the derived transcript stream
    (pipelines/transcripts.py:tool_transitions): which tool follows which
    within a conversation — lead() via the O(num_blocks) halo walk on the
    already-sorted transcripts, then vocabulary-sized count partials."""
    from knowledgegraphs_ray.pipelines.transcripts import tool_transitions

    return tool_transitions(transcripts_from_events(sf_dir), assume_sorted=True)


def q_conv_fingerprints(sf_dir: str):
    """Order-sensitive conversation content fingerprints for conv-level
    exact dedup (pipelines/transcripts.py:conversation_fingerprints):
    distributed string_agg(ORDER BY turn) via vectorized piece emission +
    one piece exchange, md5 per conversation; ordered-string_agg twin."""
    from knowledgegraphs_ray.pipelines.transcripts import conversation_fingerprints

    return conversation_fingerprints(transcripts_from_events(sf_dir), assume_sorted=True)


def q_conv_stats(sf_dir: str):
    """Per-conversation shape statistics (turn counts by role, tool-call
    volume, text mass) for SFT filtering/stratification
    (pipelines/transcripts.py:conversation_stats): per-block integer
    partials merged by conv_id, text never shuffles."""
    from knowledgegraphs_ray.pipelines.transcripts import conversation_stats

    return conversation_stats(transcripts_from_events(sf_dir))


def q_kg_triples_events(sf_dir: str):
    from knowledgegraphs_ray.pipelines.relational import extract_events_kg

    return decode_triples(extract_events_kg(sf_dir))


def q_kg_pagerank(sf_dir: str):
    """Entity PageRank over the star-KG link graph (graph/pagerank.py):
    5 integer fixed-point iterations over the kg:p_* object-property edges;
    bit-exact vs the unrolled-CTE DuckDB oracle."""
    from knowledgegraphs_ray.graph.pagerank import pagerank
    from knowledgegraphs_ray.pipelines.relational import extract_link_edges

    return pagerank(extract_link_edges(sf_dir, STAR_TABLES), iters=5)


def q_kg_ppr(sf_dir: str):
    """PERSONALIZED PageRank from the region seed entities over the same
    star-KG link graph: teleport mass restricted to kg:region/* (seed-
    masked init + base term, identical int64 fixed-point arithmetic) —
    relevance-from-seeds ranking for KG neighborhood exploration
    (graph/pagerank.py, seed_prefix)."""
    from knowledgegraphs_ray.graph.pagerank import pagerank
    from knowledgegraphs_ray.pipelines.relational import extract_link_edges

    return pagerank(
        extract_link_edges(sf_dir, STAR_TABLES), iters=5,
        seed_prefix="kg:region/",
    )


def q_kg_random_walks(sf_dir: str):
    """Deterministic md5-ranked random walks over the star-KG link graph
    from the lineitem entities (graph/walks.py) — the DeepWalk corpus
    generator: 4-hop walks following lineitem -> orders/part ->
    customer -> nation -> region, next hop = sorted neighbor at
    md5(node ␟ walk ␟ step) % deg; broadcast-CSR tier, zero shuffles
    after the one adjacency exchange."""
    from knowledgegraphs_ray.graph.walks import random_walks
    from knowledgegraphs_ray.pipelines.relational import extract_link_edges

    return random_walks(
        extract_link_edges(sf_dir, STAR_TABLES),
        start_prefix="kg:lineitem/",
        walk_len=4,
    )


def q_kg_bfs_depths(sf_dir: str):
    """Multi-source BFS over the star-KG link graph (graph/bfs.py): hop
    distance from the region entities to every reachable node (region 0,
    nation 1, customer/supplier 2, orders 3, lineitem 4, part 5) — driver
    CSR sweep below the edge limit, distributed Bellman-Ford rounds above;
    depth-capped recursive-CTE twin."""
    from knowledgegraphs_ray.graph.bfs import bfs_depths
    from knowledgegraphs_ray.pipelines.relational import extract_link_edges

    return bfs_depths(
        extract_link_edges(sf_dir, STAR_TABLES),
        seed_prefix="kg:region/",
        max_depth=6,
    )


_COMPONENT_TABLES = ["customer", "supplier", "nation"]


def q_kg_components(sf_dir: str):
    """Connected components over the customer/supplier/nation link edges
    (graph/components.py): every entity labelled with the lexicographically
    smallest IRI reachable from it. The subgraph is chosen so components
    are region-sized (5 of them), keeping the recursive-CTE oracle's
    transitive closure polynomial at sf0.01 — the full star graph is one
    giant component and the closure would be quadratic in corpus size."""
    from knowledgegraphs_ray.graph.components import connected_components
    from knowledgegraphs_ray.pipelines.relational import extract_link_edges

    return connected_components(extract_link_edges(sf_dir, _COMPONENT_TABLES))


def q_fk_containment(sf_dir: str):
    res = containment_check(
        ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"]),
        "o_custkey",
        ray.data.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"]),
        "c_custkey",
    )
    return pa.table(
        {
            "n_src_rows": [res["n_src_rows"]],
            "n_dangling": [res["n_dangling"]],
            "contained": [res["contained"]],
        }
    )


def q_dedup_exact_documents(sf_dir: str):
    return dedup_exact(_docs(sf_dir, ["doc_id", "text"]), column="text", id_column="doc_id")


def q_text_token_stats(sf_dir: str):
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(ta.token_stats, batch_format="pyarrow", zero_copy_batch=True)
        .select_columns(["doc_id", "n_tokens", "n_chars_actual"])
    )


def q_text_quality(sf_dir: str):
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(ta.quality_stats, batch_format="pyarrow", zero_copy_batch=True)
        .select_columns(["doc_id", "punct_ratio", "stop_ratio"])
    )


def q_lang_id(sf_dir: str):
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(ta.lang_scores, batch_format="pyarrow", zero_copy_batch=True)
        .select_columns(["doc_id"] + [f"score_{l}" for l in ta.LANG_MARKERS] + ["lang_pred"])
    )


def q_ann_topk(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return brute_force_topk(ds, query_ids=[0, 1, 2], k=10)


def q_ann_ivf_pq_topk(sf_dir: str):
    """IVF-PQ with n_probe == n_list (every list scanned) and exact rerank
    over the whole corpus: the result is EXACT — the brute-force SQL is a
    true oracle — while the full compressed-index machinery (coarse assign,
    PQ encode, ADC candidate scan, rerank gather) runs under the gate. The
    approximate reduced-probe tier is recall-tested in tests/test_pq.py.

    The rerank gather is driver-bounded (rerank_r candidate embeddings come
    to the driver), so rerank_r is CAPPED: the exactness claim holds only
    while the corpus fits the cap — true for every gate sf_dir (≤2k
    vectors); a larger corpus falls back to exact-top-R rerank of the ADC
    candidates, which is the normal approximate configuration."""
    from knowledgegraphs_ray.sim.pq import ivf_pq_topk

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return ivf_pq_topk(
        ds, query_ids=[0, 1, 2], k=10, n_list=16, n_probe=16,
        rerank_r=min(ds.count(), 100_000),
    )


def q_kg_triples_dedup(sf_dir: str):
    """D5: exact (s,p,o) dedup — the duplicated union collapses back to the
    original set because IRIs are deterministic (retry idempotence)."""
    from knowledgegraphs_ray.dedup.exact import dedup_exact
    import pyarrow.compute as pc

    trips = extract_kg(sf_dir, ["nation", "region"])
    doubled = trips.union(extract_kg(sf_dir, ["nation", "region"]))

    def add_key(batch: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            batch["subj"].combine_chunks().cast(pa.string()),
            batch["pred"].combine_chunks().cast(pa.string()),
            batch["obj"].combine_chunks().cast(pa.string()),
            "\x1f",
        )
        return batch.append_column("spo", key).append_column("spo_id", key)

    keyed = doubled.map_batches(add_key, batch_format="pyarrow")
    deduped = dedup_exact(keyed, column="spo", id_column="spo_id", keep_payload=True)
    # (spo, n_copies) -> split back to columns
    import pandas as pd

    def split(df: pd.DataFrame) -> pd.DataFrame:
        parts = df["spo"].str.split("\x1f", expand=True)
        return pd.DataFrame(
            {
                "subj": parts[0],
                "pred": parts[1],
                "obj": parts[2],
                "n_copies": df["n_copies"].astype("int64"),
            }
        )

    return deduped.map_batches(split, batch_format="pandas")


def q_kg_triples_bridge(sf_dir: str):
    """objPropRules 2-4/7 instantiation over the bridge schema: a
    many-to-many join table (orderpart, from lineitem columns) and a
    self-referencing table (nation_sibling, derived sibling FK). Link
    emission is gated on the compiled ontology exactly like the reference's
    addForeignKeysToPaths (InsertDataRDB.java:47-64)."""
    import pyarrow.compute as pc

    from knowledgegraphs_ray.extract.kernel import TripleKernel
    from knowledgegraphs_ray.schema.model import bridge_schema

    g = bridge_schema()
    rules = compile_rules(g)

    op = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_quantity"],
    )
    t_op = op.map_batches(
        TripleKernel(rules.plans["orderpart"], g["orderpart"].columns),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=32768,
    )

    nat = ray.data.read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )

    def derive_sibling(b: pa.Table) -> pa.Table:
        keys = b["n_nationkey"].to_numpy(zero_copy_only=False)
        sib = (keys.astype("int64") + 1) % 25
        return b.append_column("sibling_key", pa.array(sib.astype("int32"), pa.int32()))

    t_ns = nat.map_batches(derive_sibling, batch_format="pyarrow").map_batches(
        TripleKernel(rules.plans["nation_sibling"], g["nation_sibling"].columns),
        batch_format="pyarrow",
        batch_size=32768,
    )
    return decode_triples(t_op.union(t_ns))


def q_clean_corpus(sf_dir: str):
    from knowledgegraphs_ray.pipelines.training_data import clean_corpus

    return clean_corpus(_docs(sf_dir, ["doc_id", "text", "lang"]))


def q_corpus_sample(sf_dir: str):
    """Deterministic per-language stratified sample (corpus mixing) —
    exact-integer md5 thresholds, value-checked against the identical SQL."""
    from knowledgegraphs_ray.pipelines.training_data import stratified_sample

    return stratified_sample(
        _docs(sf_dir, ["doc_id", "lang"]),
        rates={"en": 0.5, "de": 0.25, "es": 1.0},
        default_rate=0.1,
    )


def q_kg_pred_stats(sf_dir: str):
    import pandas as pd
    from knowledgegraphs_ray.util.fastagg import sum_partials

    trips = extract_kg(sf_dir, STAR_TABLES)

    def partial(batch: pa.Table) -> pd.DataFrame:
        # pred arrives dictionary-encoded (TRIPLE_SCHEMA_ENC) — decode per
        # partial; the grouped output is tiny either way
        pred = batch["pred"].combine_chunks().cast(pa.string())
        df = pd.DataFrame({"pred": pred.to_numpy(zero_copy_only=False)})
        out = df.groupby("pred", as_index=False).size()
        return out.rename(columns={"size": "n_triples"})

    parts = trips.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    return sum_partials(parts, keys=["pred"], sum_cols=["n_triples"])


def q_purchases_last_view(sf_dir: str):
    import numpy as np
    import pandas as pd
    from knowledgegraphs_ray.extract.asof import asof_join

    # Predicate pushdown: the event_type filter runs inside the parquet
    # scan (row-group stats + scan-level filtering), so non-matching rows
    # never enter the object store. Branching one read would re-execute the
    # full scan per consumer anyway — two pruned reads are strictly less IO.
    import pyarrow.dataset as pads

    purchases = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts"],
        filter=pads.field("event_type") == "purchase",
    )
    views = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts"],
        filter=pads.field("event_type") == "view",
    )
    joined = asof_join(purchases, views, key="user_id", ts_col="ts", right_cols=[])

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        ts_r = pd.to_datetime(df["ts_right"]).astype("datetime64[us]")
        # float64 with NaN for misses — matching how DuckDB surfaces a
        # nullable BIGINT to pandas, so the driver's value hash agrees
        us = ts_r.astype("int64").astype("float64")
        us[ts_r.isna().to_numpy()] = np.nan
        return pd.DataFrame(
            {"event_id": df["event_id"].astype("int64"), "last_view_us": us}
        )

    return joined.map_batches(finalize, batch_format="pandas")


def q_lineitem_orders_join(sf_dir: str):
    """Both-sides-large hash join via Ray's native Dataset.join."""
    from knowledgegraphs_ray.extract.joins import native_join

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_linenumber"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderstatus"]
    )
    out = native_join(li, orders, left_on="l_orderkey", right_on="o_orderkey")
    return out.select_columns(["l_orderkey", "l_linenumber", "o_orderstatus"])


def q_candidate_keys_customer(sf_dir: str):
    from knowledgegraphs_ray.schema.keys import candidate_keys

    ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet")
    return candidate_keys(ds)


def q_discovered_fks(sf_dir: str):
    """S3/J5: FK discovery from DATA — name-gated candidate pairs tested
    with the broadcast containment join; edges where every non-null source
    value appears in the referenced key column."""
    from knowledgegraphs_ray.schema.keys import discover_fks

    g = tpch_schema(STAR_TABLES)
    tables = {
        t: ray.data.read_parquet(f"{sf_dir}/{t}.parquet") for t in STAR_TABLES
    }
    keys = {t: list(g[t].pks) for t in STAR_TABLES if len(g[t].pks) == 1}
    return discover_fks(tables, keys)


def q_pricing_summary(sf_dir: str):
    from knowledgegraphs_ray.pipelines.analytics import lineitem_pricing_summary

    return lineitem_pricing_summary(sf_dir)


def q_orders_customer_join(sf_dir: str):
    from knowledgegraphs_ray.pipelines.analytics import orders_with_customer

    return orders_with_customer(sf_dir)


def q_top_customers(sf_dir: str):
    from knowledgegraphs_ray.pipelines.analytics import top_customers_by_revenue

    return top_customers_by_revenue(sf_dir)


def q_pii_schema(sf_dir: str):
    """Schema-level PII identification over the star ontology (F-stage).
    Output is schema-derived (same at every sf) — rows-only check."""
    from knowledgegraphs_ray.pii.identify import identify_schema_pii
    from knowledgegraphs_ray.rules.compiler import compile_rules

    rules = compile_rules(tpch_schema(STAR_TABLES))
    return identify_schema_pii(rules)


def q_pii_scan_documents(sf_dir: str):
    from knowledgegraphs_ray.pii.scan import scan_value_pii

    return scan_value_pii(_docs(sf_dir, ["doc_id", "text"]))


def q_pii_redact_documents(sf_dir: str):
    from knowledgegraphs_ray.pii.scan import redact_pii

    return redact_pii(_docs(sf_dir, ["doc_id", "text"]))


def q_watermark_windows(sf_dir: str):
    """Watermark-aware incremental tumbling windows over three event
    shards arriving out of order (streaming/watermark.py): two time-
    ordered halves (split at Jan 16), then a 5 % straggler shard held
    back to the end — with a 2-day allowed lateness the stragglers whose
    window closed are DROPPED (exactly-once emission), recent ones merge
    into still-open windows. Output = the union of per-shard emissions +
    the final flush; the DuckDB twin replays the same per-shard
    watermarks."""
    import pandas as pd

    from knowledgegraphs_ray.streaming.watermark import (
        WindowState,
        tumbling_advance,
        tumbling_flush,
    )

    CUT_US = 1705363200000000  # 2024-01-16 00:00:00 UTC in epoch µs
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"],
    ).materialize()

    def part(df: pd.DataFrame, which: str) -> pd.DataFrame:
        ep = df["ts"].astype("datetime64[us]").astype("int64")
        straggler = df["event_id"] % 20 == 0
        if which == "early":
            m = ~straggler & (ep < CUT_US)
        elif which == "late_half":
            m = ~straggler & (ep >= CUT_US)
        else:
            m = straggler
        return df[m][["user_id", "ts", "value"]]

    shards = [
        ev.map_batches(lambda df, w=w: part(df, w), batch_format="pandas")
        for w in ("early", "late_half", "stragglers")
    ]
    st = WindowState(window_sec=3600, lateness_sec=2 * 86400)
    outs = []
    for sh in shards:
        st, fin = tumbling_advance(st, sh)
        outs.append(fin)
    outs.append(tumbling_flush(st))
    out = outs[0].union(*outs[1:])
    return out


def q_watermark_sessions(sf_dir: str):
    """Watermark-aware SESSION windows (gap-based, allowed lateness) over
    the same three out-of-order event shards as ``watermark_windows``
    (streaming/watermark.py sessions_advance/flush): open sessions are
    merge-capable interval state — a kept straggler landing within the
    gap of two open sessions bridges them; sessions whose end + gap
    cleared the watermark finalize exactly once. The DuckDB twin replays
    the per-shard watermarks and sessionizes the kept union."""
    import pandas as pd

    from knowledgegraphs_ray.streaming.watermark import (
        SessionState,
        sessions_advance,
        sessions_flush,
    )

    CUT_US = 1705363200000000  # 2024-01-16 00:00:00 UTC in epoch µs
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"],
    ).materialize()

    def part(df: pd.DataFrame, which: str) -> pd.DataFrame:
        ep = df["ts"].astype("datetime64[us]").astype("int64")
        straggler = df["event_id"] % 20 == 0
        if which == "early":
            m = ~straggler & (ep < CUT_US)
        elif which == "late_half":
            m = ~straggler & (ep >= CUT_US)
        else:
            m = straggler
        return df[m][["user_id", "ts", "value"]]

    shards = [
        ev.map_batches(lambda df, w=w: part(df, w), batch_format="pandas")
        for w in ("early", "late_half", "stragglers")
    ]
    st = SessionState(gap_sec=6 * 3600, lateness_sec=2 * 86400)
    outs = []
    for sh in shards:
        st, fin = sessions_advance(st, sh)
        outs.append(fin)
    outs.append(sessions_flush(st))
    return outs[0].union(*outs[1:])


def q_events_tumbling(sf_dir: str):
    from knowledgegraphs_ray.streaming.windows import tumbling_window_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )
    return tumbling_window_agg(ds, window_sec=3600)


def q_events_hopping(sf_dir: str):
    from knowledgegraphs_ray.streaming.windows import hopping_window_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )
    return hopping_window_agg(ds, window_sec=3600, hop_sec=900)


def q_events_sessionize(sf_dir: str):
    from knowledgegraphs_ray.streaming.windows import sessionize

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )
    return sessionize(ds, gap_sec=1800)


def q_events_sessionize_incremental(sf_dir: str):
    """The raw-actor incremental sessionizer — same oracle as the batch
    operator, so the stateful streaming path is value-checked too."""
    from knowledgegraphs_ray.streaming.stateful import incremental_sessionize

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )
    return incremental_sessionize(ds, gap_sec=1800, n_shards=4)


def q_purchase_sessions(sf_dir: str):
    """Keyed interval (range) join: each purchase event matched to the
    session window that contains its timestamp — binned-replication range
    join (extract/rangejoin.py) over the sessionize output."""
    import numpy as np
    import pandas as pd

    from knowledgegraphs_ray.extract.rangejoin import interval_join
    from knowledgegraphs_ray.streaming.windows import sessionize

    import pyarrow.dataset as pads

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"],
    )

    def purchases(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "user_id": df["user_id"].astype("int64"),
                "ep_us": df["ts"].astype("datetime64[us]").astype("int64"),
            }
        )

    # purchase filter pushed into the parquet scan (see q_purchases_last_view)
    points = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts"],
        filter=pads.field("event_type") == "purchase",
    ).map_batches(purchases, batch_format="pandas")
    intervals = sessionize(ev, gap_sec=1800)
    out = interval_join(
        points,
        intervals,
        point_col="ep_us",
        lo_col="start_us",
        hi_col="end_us",
        key="user_id",
        bin_width=1800 * 1_000_000,
    )
    return out.select_columns(["event_id", "user_id", "session_idx"])


def q_json_triples_events(sf_dir: str):
    from knowledgegraphs_ray.sources.json import json_to_triples

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "props"])
    return json_to_triples(ds, id_col="event_id", json_col="props")


def q_ngram_dedup_pairs(sf_dir: str):
    from knowledgegraphs_ray.dedup.ngram import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(sf_dir, ["doc_id", "text"]))


def q_minhash_dedup_pairs(sf_dir: str):
    from knowledgegraphs_ray.dedup.minhash import minhash_candidate_pairs

    return minhash_candidate_pairs(_docs(sf_dir, ["doc_id", "text"]), threshold=0.7)


def q_minhash_components(sf_dir: str):
    """Connected near-dup components (doc_id, component representative)."""
    from knowledgegraphs_ray.dedup.minhash import (
        components_from_pairs,
        minhash_candidate_pairs,
    )

    pairs = minhash_candidate_pairs(_docs(sf_dir, ["doc_id", "text"]), threshold=0.7)
    return components_from_pairs(pairs)


def q_dedup_resolved_corpus(sf_dir: str):
    """Full dedup story: minhash pairs -> components -> resolve (keep the
    longest member per near-dup component, drop the rest) -> surviving
    corpus. Oracle = recursive-CTE components + window-rank survivors."""
    from knowledgegraphs_ray.dedup.minhash import (
        components_from_pairs,
        minhash_candidate_pairs,
    )
    from knowledgegraphs_ray.dedup.resolve import resolve_duplicates

    corpus = _docs(sf_dir, ["doc_id", "text"])
    pairs = minhash_candidate_pairs(_docs(sf_dir, ["doc_id", "text"]), threshold=0.7)
    comp = components_from_pairs(pairs)
    return resolve_duplicates(corpus, comp, keep="longest")


def q_score_percentiles(sf_dir: str):
    """Per-group percentile normalization: each document's token count
    rescaled to its within-language percentile (integer micro units) — the
    calibration step before a cross-lingual 'keep the top X% per language'
    filter. Count partials + one slim sort + map-only division."""
    from knowledgegraphs_ray.util.topk import percentile_per_group

    docs = _docs_with_tokens(sf_dir, ["doc_id", "lang", "text"])
    return percentile_per_group(
        docs, key_cols=["lang"], score_col="n_tokens", id_col="doc_id"
    )


def q_corpus_splits(sf_dir: str):
    """Deterministic train/val/test assignment (hash-range buckets): pure
    function of (seed, id), map-only, stable under re-runs and new data."""
    from knowledgegraphs_ray.pipelines.training_data import assign_splits

    return assign_splits(_docs(sf_dir, ["doc_id"]), seed=17)


def q_corpus_overlap(sf_dir: str):
    """Corpus-level n-gram contamination measurement: Jaccard of the
    shingle sets of two document slices (A = doc_id % 3 == 0, B = rest).
    Exact tier — only per-block-unique 16 B (gram, side) rows move; the
    HLL sketch tier is the 100-TB path (tests pin its error)."""
    from knowledgegraphs_ray.text.overlap import corpus_ngram_overlap

    docs = _docs(sf_dir, ["doc_id", "text"])
    a = docs.map_batches(
        lambda df: df[df["doc_id"] % 3 == 0], batch_format="pandas"
    )
    b = docs.map_batches(
        lambda df: df[df["doc_id"] % 3 != 0], batch_format="pandas"
    )
    return corpus_ngram_overlap(a, b)


def q_pca_projection(sf_dir: str):
    """PCA dimensionality reduction: project every embedding onto the 8
    frozen principal components (trained distributed, integer-invariant).
    Map-only int64 matmul; proj_micro is an INTEGER — the oracle match is
    structural, no float-parity caveat (see sim/pca.py docstring)."""
    from knowledgegraphs_ray.sim.pca import project_pca

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return project_pca(emb)


def q_cluster_balanced_sample(sf_dir: str):
    """Cluster-balanced coreset: top-10 per frozen-centroid cluster by the
    integer quantized-norm energy score. Fused map-only assign+score kernel
    -> per-batch prune -> slim survivor rank; the embeddings never shuffle."""
    from knowledgegraphs_ray.sim.clusters import cluster_balanced_sample

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return cluster_balanced_sample(emb, k_per_cluster=10)


def q_resolve_best_score(sf_dir: str):
    """Quality-priority dedup: minhash pairs -> components -> resolve
    keeping the member with the HIGHEST quality score (here n_chars as the
    stand-in score column; in production a classifier logit) per near-dup
    component. Oracle = window-rank survivors ordered by score DESC, id."""
    from knowledgegraphs_ray.dedup.minhash import (
        components_from_pairs,
        minhash_candidate_pairs,
    )
    from knowledgegraphs_ray.dedup.resolve import resolve_duplicates

    corpus = _docs(sf_dir, ["doc_id", "text", "n_chars"])
    pairs = minhash_candidate_pairs(_docs(sf_dir, ["doc_id", "text"]), threshold=0.7)
    comp = components_from_pairs(pairs)
    return resolve_duplicates(
        corpus, comp, keep="best_score", score_col="n_chars"
    )


def q_simhash_pairs(sf_dir: str):
    """SimHash pairs with the md5 token hash — every stage (fingerprint,
    pigeonhole banding, first-band dedup, Hamming verify) value-checked
    against a pure-SQL SimHash in DuckDB. The seeded-polars-hash fast path
    is property-tested separately (tests/test_dedup.py)."""
    from knowledgegraphs_ray.dedup.simhash import simhash_near_dup_pairs

    return simhash_near_dup_pairs(
        _docs(sf_dir, ["doc_id", "text"]), max_distance=3, hash_fn="md5"
    )


def q_embedding_near_dups(sf_dir: str):
    from knowledgegraphs_ray.dedup.embed import embedding_near_dup_pairs

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    out = embedding_near_dup_pairs(ds, dim=64, threshold=0.95)
    # pair output is tiny; materialize and enforce the schema (Ray loses the
    # schema of an all-empty map_groups result)
    import pandas as pd

    df = out.to_pandas()
    if df.empty:
        df = pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64")}
        )
    return df[["doc_a", "doc_b"]]


def q_embedding_pairs_exact(sf_dir: str):
    """Exact tiled all-pairs cosine (guaranteed recall) at a threshold the
    random testdata actually crosses — the verifier tier next to the LSH
    near-dup pass."""
    from knowledgegraphs_ray.sim.allpairs import exact_cosine_pairs

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return exact_cosine_pairs(ds, threshold=0.4).select_columns(["doc_a", "doc_b"])


def q_incremental_dedup(sf_dir: str):
    """Cross-corpus novelty filter (streaming-ingestion dedup): history =
    docs with doc_id % 5 == 0, arriving shard = doc_id % 2 == 0; keep shard
    rows whose text no history doc carries. ``broadcast_limit=0`` forces the
    scale tier — Bloom probe over the history + exact verify join — so the
    gate exercises the 100 TB path, which is exact by construction."""
    from knowledgegraphs_ray.dedup.incremental import novel_rows

    docs = _docs(sf_dir, ["doc_id", "text"])
    seen = docs.map_batches(
        lambda df: df[df["doc_id"] % 5 == 0], batch_format="pandas"
    )
    new = docs.map_batches(
        lambda df: df[df["doc_id"] % 2 == 0], batch_format="pandas"
    )
    return novel_rows(new, seen, column="text", broadcast_limit=0)


def q_incremental_minhash(sf_dir: str):
    """Cross-corpus NEAR-dup probe (streaming-ingestion fuzzy dedup):
    history = even doc_ids sketched into a persisted-shape MinHash-LSH band
    index, arriving shard = odd doc_ids probed against it. Emits
    (new_doc, hist_doc, est_jaccard >= 0.7); the history text is touched
    exactly once (index build), never on probe."""
    from knowledgegraphs_ray.dedup.incremental_minhash import (
        build_minhash_index,
        probe_minhash_index,
    )

    docs = _docs(sf_dir, ["doc_id", "text"])
    hist = docs.map_batches(
        lambda df: df[df["doc_id"] % 2 == 0], batch_format="pandas"
    )
    new = docs.map_batches(
        lambda df: df[df["doc_id"] % 2 == 1], batch_format="pandas"
    )
    index = build_minhash_index(hist)
    return probe_minhash_index(index, new, threshold=0.7)


def q_decontaminated_docs(sf_dir: str):
    """Benchmark decontamination: docs with doc_id % 20 == 0 act as the
    held-out eval set; every other doc is annotated with its distinct
    shared-4-gram count against that set (GPT-3-style n-gram overlap)."""
    import numpy as np

    from knowledgegraphs_ray.text.decontam import decontaminate

    docs = _docs(sf_dir, ["doc_id", "text"])

    def split(keep_bench: bool):
        def f(df):
            m = (df["doc_id"].to_numpy() % 20 == 0) == keep_bench
            return df[m]

        return f

    bench = docs.map_batches(split(True), batch_format="pandas")
    corpus = docs.map_batches(split(False), batch_format="pandas")
    return decontaminate(corpus, bench, n=4).select_columns(
        ["doc_id", "n_contaminated", "contaminated"]
    )


def q_gopher_quality(sf_dir: str):
    from knowledgegraphs_ray.text.gopher import gopher_stats

    return gopher_stats(_docs(sf_dir, ["doc_id", "text"]))


def q_chat_pairs(sf_dir: str):
    """SFT-pair extraction: adjacent (user turn -> assistant turn) pairs per
    conversation. lead() via util.segrank.lead_within_group — the transcript
    table arrives already sorted by (conv_id, turn_idx) from the segrank
    path, so the lead pass is O(num_blocks) single-row halos with NO extra
    sort or shuffle."""
    from knowledgegraphs_ray.util.segrank import lead_within_group

    t = transcripts_from_events(sf_dir)
    led = lead_within_group(
        t,
        key_cols=["conv_id"],
        order_cols=["turn_idx"],
        cols=["text", "role"],
        assume_sorted=True,  # segrank emits (user_id==conv_id, turn_idx) order
    )

    def pairs(b: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.equal(b["role"], "user"), pc.equal(b["lead_role"], "assistant")
        )
        f = b.filter(pc.fill_null(keep, False))
        return pa.table(
            {
                "conv_id": f["conv_id"],
                "turn_idx": f["turn_idx"].cast(pa.int32()),
                "prompt": f["text"],
                "response": f["lead_text"],
            }
        )

    return led.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)


def q_lm_bigram_ppl(sf_dir: str):
    """Interpolated bigram-LM perplexity (pruned-KenLM direction): two
    combine-before-shuffle count passes train the model, scoring is one
    broadcast-join map over doc blocks. Integer micro-nat surprisals keep
    the double ppl column bit-identical to the DuckDB twin."""
    from knowledgegraphs_ray.text.lm import bigram_perplexity

    return bigram_perplexity(_docs(sf_dir, ["doc_id", "text"]))


def q_embedding_clusters(sf_dir: str):
    """K-means cluster assignment over the embeddings table: frozen
    distributed-Lloyd centroids (sim/clusters.py, micro-quantized,
    parallelism-invariant provenance in tests/test_clusters.py); assignment
    is one matmul per batch — map-only, shuffle-free."""
    from knowledgegraphs_ray.sim.clusters import assign_clusters

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return assign_clusters(ds)


def q_corpus_diff(sf_dir: str):
    """Snapshot delta between two corpus versions (state/diff.py): old =
    doc_id % 7 != 0, new = doc_id % 5 != 0 with text perturbed at
    doc_id % 11 == 0 — exercises all four statuses. Text never shuffles;
    the delta is one full-outer join of (id, md5) rows."""
    from knowledgegraphs_ray.state.diff import corpus_diff

    docs = _docs(sf_dir, ["doc_id", "text"])
    old = docs.map_batches(lambda df: df[df["doc_id"] % 7 != 0], batch_format="pandas")

    def perturb(df):
        df = df[df["doc_id"] % 5 != 0].copy()
        m = df["doc_id"] % 11 == 0
        df.loc[m, "text"] = df.loc[m, "text"] + "!"
        return df

    new = docs.map_batches(perturb, batch_format="pandas")
    return corpus_diff(old, new)


def q_weighted_sample(sf_dir: str):
    """Weighted sample without replacement (Efraimidis-Spirakis exponential
    keys, weight = n_chars): per-block prune to k then one (blocks x k)-row
    sort — the corpus never shuffles. Selection is a pure function of
    (seed, ids, weights); the SQL twin reproduces it bit-for-bit."""
    from knowledgegraphs_ray.pipelines.training_data import weighted_sample

    return weighted_sample(
        _docs(sf_dir, ["doc_id", "n_chars"]), k=100, weight_col="n_chars", seed=7
    )


def q_temperature_sample(sf_dir: str):
    """Temperature-flattened source mixing (mT5/XLM-R): per-lang keep rates
    derived from the corpus's own counts via q_i = n_i^tau / sum n_j^tau,
    selection by seeded-hash integer threshold. Counts move as (lang, n)
    partials only; the filter is map-only."""
    from knowledgegraphs_ray.pipelines.training_data import temperature_sample

    return temperature_sample(
        _docs(sf_dir, ["doc_id", "lang"]), tau=0.5, total_k=400
    )


def q_quality_classifier(sf_dir: str):
    """Trained (distributed logistic regression) quality-filter scores: the
    frozen micro-weights are the output of
    ``text.classifier.train_quality_weights()`` (seeded synthetic wiki-vs-noise
    corpus; per-block gradient partials), reproduced bit-for-bit in
    tests/test_quality_classifier.py. Inference is map-only."""
    from knowledgegraphs_ray.text import classifier as qc

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(qc.score, batch_format="pyarrow", zero_copy_batch=True)
        .select_columns(["doc_id", "score_micro", "keep"])
    )


def q_corpus_shuffle(sf_dir: str):
    """Deterministic training-order shuffle: pos = rank under
    ORDER BY md5('42:'||doc_id) — a pure function of (seed, id), identical
    at any parallelism."""
    from knowledgegraphs_ray.pipelines.training_data import seeded_shuffle

    return seeded_shuffle(_docs(sf_dir, ["doc_id"]), seed=42)


def q_paragraph_dedup(sf_dir: str):
    """Boilerplate-paragraph removal: drop paragraphs repeated >= 2 times
    across the corpus, keeping document order (dedup/paragraphs.py). The
    testdata texts are single-paragraph and (at small sf) all distinct, so
    a deterministic repeated footer is appended first — same expression in
    the oracle SQL — making the removal path do real work at every sf."""
    from knowledgegraphs_ray.dedup.paragraphs import PARA_SEP, dedup_paragraphs

    def add_footer(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        mod5 = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64) % 5
        footer = pc.binary_join_element_wise(
            pc.coalesce(batch["text"].combine_chunks(), pa.scalar("")),
            pc.binary_join_element_wise(
                pa.scalar("footer "),
                pa.array(mod5.astype(str), pa.string()),
                pa.scalar(""),
            ),
            pa.scalar(PARA_SEP),
        )
        return batch.set_column(
            batch.schema.get_field_index("text"), "text", footer
        )

    docs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        add_footer, batch_format="pyarrow", zero_copy_batch=True
    )
    return dedup_paragraphs(docs, min_count=2)


def q_frequent_tokens(sf_dir: str):
    """Exact corpus heavy hitters: tokens appearing >= 500 times
    (text/heavyhitters.py two-pass design)."""
    from knowledgegraphs_ray.text.heavyhitters import frequent_tokens

    return frequent_tokens(_docs(sf_dir, ["doc_id", "text"]), min_count=500)


def q_bm25_topk(sf_dir: str):
    """BM25 lexical top-10 for a fixed query; scores bit-match DuckDB
    (math.log == ln, fixed expression tree — text/bm25.py)."""
    from knowledgegraphs_ray.text.bm25 import bm25_topk

    return bm25_topk(_docs(sf_dir, ["doc_id", "text"]), "hash join customer", k=10)


def q_token_quantiles(sf_dir: str):
    """Exact token-count quantiles via mergeable histogram partials
    (text/quantiles.py; the quantile_disc rule)."""
    from knowledgegraphs_ray.text.quantiles import token_count_quantiles

    return token_count_quantiles(
        _docs(sf_dir, ["doc_id", "text"]), [0.25, 0.5, 0.75, 0.9, 0.99]
    )


def q_lm_perplexity(sf_dir: str):
    """CCNet-style unigram-LM perplexity per document (text/lm.py): integer
    micro-nat surprisal sums + a bit-exact libm ppl column."""
    from knowledgegraphs_ray.text.lm import perplexity

    return perplexity(_docs(sf_dir, ["doc_id", "text"]))


def q_dup_window_stats(sf_dir: str):
    """Cross-document duplicated 8-token windows per doc (dedup/spans.py,
    the Lee et al. exact-substring-dedup approximation)."""
    from knowledgegraphs_ray.dedup.spans import duplicated_window_stats

    return duplicated_window_stats(_docs(sf_dir, ["doc_id", "text"]), w=8)


def q_dsir_weights(sf_dir: str):
    """DSIR importance weights (text/dsir.py): integer micro-nat log ratio
    of target-LM vs raw-LM token likelihoods; target domain = docs with
    doc_id % 10 == 0 (deterministic proxy for a quality subset)."""
    from knowledgegraphs_ray.text.dsir import dsir_weights

    raw = _docs(sf_dir, ["doc_id", "text"])
    # single-pass tier: raw + target tallies in one corpus read
    return dsir_weights(
        raw, target_mask=lambda t: t["doc_id"].to_numpy() % 10 == 0
    )


def _docs_with_tokens(sf_dir: str, columns: list[str]) -> ray.data.Dataset:
    """documents with text replaced by its TOKEN_RE match count (n_tokens) —
    shared front end for the token-accounting operators (mixture_budget,
    chunk_sequences); text is dropped so downstream shuffles move 8 bytes,
    not documents."""
    from knowledgegraphs_ray.text.analysis import TOKEN_RE

    def tok(batch: pa.Table) -> pa.Table:
        out = batch.filter(pc.is_valid(batch["text"].combine_chunks()))
        n = pc.cast(
            pc.count_substring_regex(out["text"].combine_chunks(), TOKEN_RE),
            pa.int64(),
        )
        return out.append_column("n_tokens", n).drop_columns(["text"])

    return _docs(sf_dir, columns).map_batches(
        tok, batch_format="pyarrow", zero_copy_batch=True
    )


MIXTURE_BUDGETS = {"en": 5000, "de": 2000, "fr": 1500}


def q_mixture_budget(sf_dir: str):
    """Token-budget source mixing (training_data.py:mixture_budget): per-lang
    token budgets filled in seeded-md5 priority order; es/zh ride the default
    budget. One sort on (lang, hash) + segment-cumsum scan + map-only cut."""
    from knowledgegraphs_ray.pipelines.training_data import mixture_budget

    return mixture_budget(
        _docs_with_tokens(sf_dir, ["doc_id", "text", "lang"]),
        budgets=MIXTURE_BUDGETS,
        default_budget=500,
        seed=7,
    )


def q_chunk_sequences(sf_dir: str):
    """Document -> overlapping training-sequence chunks
    (training_data.py:chunk_sequences): 40-token windows at stride 30.
    Map-only arange row expansion, no shuffle."""
    from knowledgegraphs_ray.pipelines.training_data import chunk_sequences

    return chunk_sequences(
        _docs_with_tokens(sf_dir, ["doc_id", "text"]), chunk_size=40, stride=30
    )


def q_top_docs_per_lang(sf_dir: str):
    """Per-group top-k (util/topk.py): the 5 longest documents per language
    (score = TOKEN_RE count, ties on doc_id). Partial per-batch prune ->
    sort of the survivors -> segment-rank cut; never a full-corpus
    map_groups."""
    from knowledgegraphs_ray.util.topk import topk_per_group

    docs = _docs_with_tokens(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        lambda df: df.rename(columns={"n_tokens": "score"}), batch_format="pandas"
    )
    return topk_per_group(
        docs, key_cols=["lang"], score_col="score", id_col="doc_id", k=5
    )


def q_customers_without_orders(sf_dir: str):
    """Distributed anti join (Ray Dataset.join left_anti): customers with
    no PENDING orders — the retention/QA staple. Hash-partitioned both
    sides (no broadcast assumption); the status filter is pushed into the
    orders scan."""
    import pyarrow.dataset as pads

    from knowledgegraphs_ray.extract.joins import native_join

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    pending = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey"],
        filter=pads.field("o_orderstatus") == "P",
    )
    return native_join(
        cust, pending, left_on="c_custkey", right_on="o_custkey", how="left_anti"
    )


def q_c4_clean(sf_dir: str):
    """C4 line-level cleaning (text/c4.py) over a multi-line augmentation
    of the documents table (the raw testdata is single-line): each doc
    gains two good lines, a short line, a javascript line, and every 7th
    (brace) / 11th (lorem ipsum) doc a poison line — mirrored exactly in
    the oracle's derived table."""
    import polars as pl

    from knowledgegraphs_ray.text.c4 import c4_clean

    def augment(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["doc_id", "text"]))
        base = pl.col("text").fill_null("")
        tail = (
            pl.when(pl.col("doc_id") % 7 == 0)
            .then(pl.lit("brace { line"))
            .when(pl.col("doc_id") % 11 == 0)
            .then(pl.lit("has lorem ipsum inside."))
            .otherwise(pl.lit("Another good line here!"))
        )
        text = (
            base
            + pl.lit(" end.\ntoo short\n")
            + base
            + pl.lit(" tail?\nLines with javascript get dropped.\n")
            + tail
        )
        return df.select(pl.col("doc_id"), text.alias("text")).to_arrow()

    docs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        augment, batch_format="pyarrow", zero_copy_batch=True
    )
    return c4_clean(docs)


def q_bpe_token_counts(sf_dir: str):
    """Per-doc token counts under a corpus-trained BPE tokenizer
    (text/bpe.py). No SQL oracle: BPE's iterative merge training is not
    SQL-expressible; correctness is pinned by the brute-force reference
    equivalence in tests/test_bpe.py (driver records rows-only)."""
    from knowledgegraphs_ray.text.bpe import bpe_token_counts, train_bpe_from_corpus

    docs = _docs(sf_dir, ["doc_id", "text"])
    tok = train_bpe_from_corpus(docs, num_merges=200)
    return bpe_token_counts(docs, tok)


def q_semantic_dedup(sf_dir: str):
    """SemDeDup survivors (sim/semdedup.py, exact tier): embedding-space
    near-duplicate components at cosine >= 0.4 (the threshold this
    synthetic testdata actually crosses), min-id member kept."""
    from knowledgegraphs_ray.sim.semdedup import semantic_dedup

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return semantic_dedup(ds, threshold=0.4).select_columns(["vec_id"])


def q_mentions_documents(sf_dir: str):
    return lp.document_mentions(sf_dir)


def q_link_exact_documents(sf_dir: str):
    return lp.link_exact(sf_dir)


def q_link_scored_documents(sf_dir: str):
    sel = lp.link_scored(sf_dir)
    return sel.select_columns(["mention", "cand_iri", "bes", "pj"])


def q_canonical_mentions(sf_dir: str):
    # widen the surface with a known near-duplicate pair (order/orders) so
    # the union-find path does real work on real data
    forms = set(lp.single_token_class_labels(lp.star_ontology_index())) | {"order"}
    from knowledgegraphs_ray.canon.canonicalize import canonicalize_mentions

    mentions = lp.document_mentions(sf_dir, forms)
    return canonicalize_mentions(mentions.select_columns(["mention"]))


def q_ann_ivf_topk(sf_dir: str):
    """IVF ANN with n_probe == n_list: every centroid list is scanned, so
    the result is EXACT and shares the brute-force DuckDB oracle while still
    exercising the full IVF path (train, assign, per-list scan, merge).
    The reduced-probe approximate tier is recall-tested in tests/test_ivf.py."""
    from knowledgegraphs_ray.sim.ivf import ivf_topk

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return ivf_topk(ds, query_ids=[0, 1, 2], k=10, n_list=16, n_probe=16)


def q_doc_fingerprints(sf_dir: str):
    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(ta.fingerprint, batch_format="pyarrow", zero_copy_batch=True)
        .select_columns(["doc_id", "fingerprint"])
    )


def q_dsir_bigram_weights(sf_dir: str):
    """Hashed uni+bigram DSIR tier (the paper's estimator): fixed 8192-bucket
    feature space keeps the broadcast model O(n_buckets) for any vocabulary;
    md5 bucket hash for DuckDB parity (text/dsir.py:dsir_hashed_weights)."""
    from knowledgegraphs_ray.text.dsir import dsir_hashed_weights

    raw = _docs(sf_dir, ["doc_id", "text"])
    return dsir_hashed_weights(
        raw, target_mask=lambda t: t["doc_id"].to_numpy() % 10 == 0
    )


def q_curation_chain(sf_dir: str):
    """The composed curation chain (quality filter -> exact dedup -> minhash
    near-dup resolve -> stratified sample) run end-to-end through the real
    checkpointed pipeline; md5 sample tier so the DuckDB composition twin
    (curation.curation_oracle_sql) value-checks the survivor set."""
    import tempfile

    from knowledgegraphs_ray.pipelines.curation import curate_run

    root = tempfile.mkdtemp(prefix="curation_gate_", dir="/tmp")
    p = curate_run(
        root,
        lambda: _docs(sf_dir, ["doc_id", "text", "lang"]),
        min_tokens=20,
        rates={"en": 0.5, "de": 0.25, "es": 1.0},
        default_rate=0.1,
        minhash_threshold=0.7,
        sample_hash_fn="md5",
    )
    return p.dataset("sampled", columns=["doc_id", "lang", "n_tokens", "n_copies"])


def q_mapping_selection(sf_dir: str):
    """T2/T3/T4 + H4 mapping-selection cascade over a deterministic synthetic
    candidate table — every branch oracle-checked (selection_gate docstring)."""
    from knowledgegraphs_ray.linking.selection_gate import mapping_selection

    return mapping_selection(sf_dir)


def q_copurchase_triangles(sf_dir: str):
    """Per-node triangle counts over the part co-purchase graph (parts
    sharing a lineitem order): basket edge construction + degree-oriented
    distributed wedge enumeration (graph/triangles.py), bit-exact vs the
    DuckDB 3-way self-join twin."""
    from knowledgegraphs_ray.graph.triangles import (
        cooccurrence_edges,
        triangle_counts,
    )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    edges = cooccurrence_edges(li, group_col="l_orderkey", item_col="l_partkey")
    return triangle_counts(edges, src="u", dst="v", assume_canonical=True)


def q_source_quota_cap(sf_dir: str):
    """Per-source document quota (web-curation "at most N pages per
    domain"): keep the 10 smallest-seeded-hash docs per source —
    deterministic uniform survivors, per-block prune before the exchange
    (pipelines/training_data.py:quota_cap)."""
    from knowledgegraphs_ray.pipelines.training_data import quota_cap

    return quota_cap(
        _docs(sf_dir, ["doc_id", "source"]),
        key_col="source",
        id_col="doc_id",
        cap=10,
        seed=11,
    )


def q_leakage_safe_splits(sf_dir: str):
    """Leakage-safe train/val/test assignment: near-dup families (minhash
    components at 0.7) move as a unit — the split hash is over the
    component representative, so a train doc's near-copy can never land in
    val/test (pipelines/training_data.py:leakage_safe_splits)."""
    from knowledgegraphs_ray.dedup.minhash import (
        components_from_pairs,
        minhash_candidate_pairs,
    )
    from knowledgegraphs_ray.pipelines.training_data import leakage_safe_splits

    pairs = minhash_candidate_pairs(_docs(sf_dir, ["doc_id", "text"]), threshold=0.7)
    comp = components_from_pairs(pairs)
    return leakage_safe_splits(_docs(sf_dir, ["doc_id"]), comp, seed=17)


def q_copurchase_kcore(sf_dir: str):
    """2-core of the support-≥2 co-purchase graph (parts sharing at least
    two orders). k=2 instead of 3 so the BENCH scale exercises the
    non-empty path too: the support-2 graph thins as sf grows (key-space
    dilution), and at sf0.1 its 3-core is empty while the 2-core
    survives. Iterative delta-broadcast peeling
    (graph/kcore.py; at sf0.01 the peel strips nodes over
    multiple cascading rounds), integer-exact vs the unrolled-CTE twin."""
    from knowledgegraphs_ray.graph.kcore import kcore
    from knowledgegraphs_ray.graph.triangles import cooccurrence_edges

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    edges = cooccurrence_edges(
        li, group_col="l_orderkey", item_col="l_partkey", min_count=2
    )
    return kcore(edges, src="u", dst="v", assume_canonical=True, k=2)


def q_link_prediction(sf_dir: str):
    """Common-neighbor / Adamic-Adar link prediction over the support-≥2
    co-purchase graph (graph/linkpred.py): non-adjacent part pairs sharing
    ≥1 neighbor (min_cn=1 so the thinned sf0.1 graph still produces
    rows at bench scale), AA in integer micro units (floor(1e6/ln(deg))
    per shared neighbor — libm-bit-exact vs the DuckDB twin)."""
    from knowledgegraphs_ray.graph.linkpred import link_prediction
    from knowledgegraphs_ray.graph.triangles import cooccurrence_edges

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    edges = cooccurrence_edges(
        li, group_col="l_orderkey", item_col="l_partkey", min_count=2
    )
    return link_prediction(edges, min_cn=1, assume_canonical=True)


def q_copurchase_jaccard(sf_dir: str):
    """Neighborhood-Jaccard ER blocking over the support-≥2 co-purchase
    graph: non-adjacent part pairs scored by |N(u)∩N(v)| / |N(u)∪N(v)| in
    integer micro units — the wedge kernel plus two node-sized degree
    joins, pure int64 arithmetic end to end (graph/linkpred.py)."""
    from knowledgegraphs_ray.graph.linkpred import link_prediction
    from knowledgegraphs_ray.graph.triangles import cooccurrence_edges

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )
    edges = cooccurrence_edges(
        li, group_col="l_orderkey", item_col="l_partkey", min_count=2
    )
    return link_prediction(
        edges, min_cn=1, assume_canonical=True, include_jaccard=True
    )


def q_rolling_events(sf_dir: str):
    """Per-user sliding-frame aggregates over the events stream: ROWS frame
    (last 3 events: spend sum/cnt/min/max) and RANGE frame (trailing 1 h:
    spend sum/cnt) in one pass — streaming/rolling.py halo scan, exact
    int64 vs the SQL window-function twin."""
    from knowledgegraphs_ray.streaming.rolling import sorted_rolling_agg

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts_us": pc.cast(t["ts"], pa.int64()),
                "cents": pc.cast(pc.round(pc.multiply(t["value"], 100)), pa.int64()),
            }
        )

    return sorted_rolling_agg(
        ev.map_batches(prep, batch_format="pyarrow"),
        key_cols=["user_id"],
        order_cols=["ts_us", "event_id"],
        val_col="cents",
        rows_window=3,
        range_window=3_600_000_000,
        range_col="ts_us",
    )


def q_spend_outliers(sf_dir: str):
    """Per-user spend anomaly flags: is_outlier iff the event's cents
    deviate from the user's mean by more than two population sigmas,
    decided by the division/sqrt-free integer inequality
    (n*x - S)^2 > 4*(n*Q - S^2) — util/outliers.py, HUGEINT SQL twin."""
    from knowledgegraphs_ray.util.outliers import group_zscore_outliers

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "cents": pc.cast(pc.round(pc.multiply(t["value"], 100)), pa.int64()),
            }
        )

    return group_zscore_outliers(
        ev.map_batches(prep, batch_format="pyarrow"),
        key_cols=["user_id"],
        val_col="cents",
        z2=4,
    )


def q_event_funnel(sf_dir: str):
    """Ordered funnel over the events stream (view -> click -> purchase):
    per-step reach counts under strict-ordering semantics
    (streaming/funnel.py), integer-exact vs the chained-CTE DuckDB twin."""
    from knowledgegraphs_ray.streaming.funnel import funnel_counts

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    return funnel_counts(ev, steps=["view", "click", "purchase"])


def q_repeated_spans(sf_dir: str):
    """Maximal duplicated character spans per document (text/substrdup.py —
    Lee et al. exact substring dedup's removal list): 25-char windows at
    stride 5, 128-bit double-Horner grouping, broadcast dup filter,
    gaps-and-islands span merge. The character-coordinate complement to
    the token-window dup_window_stats."""
    from knowledgegraphs_ray.text.substrdup import repeated_substring_spans

    return repeated_substring_spans(_docs(sf_dir, ["doc_id", "text"]))


def q_er_canonical_ids(sf_dir: str):
    """End-to-end entity resolution (pipelines/er.py): SNM blocking on the
    16-char prefix -> exact join-shaped token-Jaccard verify at 0.7 ->
    components -> (doc_id, canon_id) for every record. The composed
    record-linkage chain (Hernandez-Stolfo shape)."""
    from knowledgegraphs_ray.pipelines.er import er_resolve

    return er_resolve(_docs(sf_dir, ["doc_id", "text"]))


def q_user_event_pivot(sf_dir: str):
    """Long->wide pivot of the event log (pipelines/pivot.py): one row per
    user, per-event-type counts + integer-cent sums over a FIXED category
    vocabulary ('error' pools into other); (groups x categories)-bounded
    partials, one slim exchange."""
    from knowledgegraphs_ray.pipelines.pivot import pivot_counts

    def cents(t: pa.Table) -> pa.Table:
        return t.append_column(
            "cents", pc.cast(pc.round(pc.multiply(t["value"], 100)), pa.int64())
        )

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "value"]
    ).map_batches(cents, batch_format="pyarrow")
    return pivot_counts(
        ev,
        group_col="user_id",
        pivot_col="event_type",
        categories=["view", "click", "purchase", "signup"],
        value_cents_col="cents",
    )


def q_snm_candidate_pairs(sf_dir: str):
    """Sorted-neighborhood blocking over documents keyed on the 16-char
    text prefix (linking/blocking.py): ONE sort + an id-only positional
    halo; window-4 candidate pairs for record linkage. Near-dup template
    docs share prefixes, so real candidates land adjacent."""
    from knowledgegraphs_ray.linking.blocking import sorted_neighborhood_pairs

    def key(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bkey", pc.utf8_slice_codeunits(t["text"], 0, 16)
        ).drop_columns(["text"])

    docs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        key, batch_format="pyarrow"
    )
    return sorted_neighborhood_pairs(
        docs, key_cols=["bkey"], id_col="doc_id", window=4
    )


def q_setjoin_pairs(sf_dir: str):
    """Exact set-similarity self-join at Jaccard ≥ 0.9 over the documents
    corpus (AllPairs/PPJoin prefix filtering: rarity-ordered prefixes are
    the only rows that shuffle, pairs emitted per prefix-token group, exact
    integer floor-division verify — dedup/setjoin.py). The exact
    complement to the probabilistic minhash tier. Jaccard is over 3-token
    shingle sets: the fixture's 31-unigram vocabulary makes every unigram
    corpus-hot (prefix filtering would degrade to the quadratic join).
    k=3 is PINNED here because the static oracle SQL must match the
    engine's shingle semantics — but ``shingle_k="auto"`` derives the
    same k=3 from the prefix-group volume probe
    (``dedup/setjoin.choose_shingle_k``), so no hand-tuning is needed
    outside oracle-twinned contexts."""
    from knowledgegraphs_ray.dedup.setjoin import set_similarity_join

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return set_similarity_join(docs, threshold_micro=900_000, shingle_k=3)


def q_dq_orders(sf_dir: str):
    """Declarative data-quality report over orders: not_null / unique /
    accepted_values / in_range / regex rules in ONE vectorized pass
    (|rules|-row partials per block), plus an fk-containment rule against
    the broadcast distinct customer keys (schema/validate.py)."""
    from knowledgegraphs_ray.schema.validate import Rule, validate

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=[
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderpriority",
        ],
    )
    customer = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    )
    return validate(
        orders,
        [
            Rule("orderkey_not_null", "not_null", "o_orderkey"),
            Rule("orderkey_unique", "unique", "o_orderkey"),
            Rule(
                "status_domain",
                "accepted_values",
                "o_orderstatus",
                {"values": ["O", "F", "P"]},
            ),
            Rule(
                "price_range",
                "in_range",
                "o_totalprice",
                {"lo": 0, "hi": 300000},
            ),
            Rule(
                "priority_format",
                "matches_regex",
                "o_orderpriority",
                {"pattern": "^[1-5]-"},
            ),
            Rule(
                "custkey_fk",
                "fk",
                "o_custkey",
                {"ref": customer, "ref_col": "c_custkey"},
            ),
        ],
    )


def q_orders_rollup(sf_dir: str):
    """Multi-grain order totals via GROUP BY ROLLUP(o_orderpriority,
    o_orderstatus): one map-side pass computes all three grains' partials
    (combine-before-shuffle ×3), one slim grain-bounded exchange; gid is
    the SQL GROUPING() bitmask, money in integer cents
    (pipelines/analytics.py:grouping_sets_agg)."""
    from knowledgegraphs_ray.pipelines.analytics import grouping_sets_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
    )

    def cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "o_orderstatus": t["o_orderstatus"],
                "cents": pc.cast(
                    pc.round(pc.multiply(t["o_totalprice"], 100)), pa.int64()
                ),
            }
        )

    return grouping_sets_agg(
        ds.map_batches(cents, batch_format="pyarrow"),
        key_cols=["o_orderpriority", "o_orderstatus"],
        sets=[["o_orderpriority", "o_orderstatus"], ["o_orderpriority"], []],
        sum_cols={"total_cents": "cents"},
        count_col="n_orders",
    )


def q_pmi_collocations(sf_dir: str):
    """PMI collocation scores over the top-200 document-frequency tokens:
    integer co-occurrence counts (text/cooccur.py) plus
    pmi_micro = floor(1e6·ln(N·c_xy/(c_x·c_y))) — exact int64 products cast
    to double on both sides, one libm ln, bit-exact vs the twin."""
    from knowledgegraphs_ray.text.cooccur import pmi_collocations

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return pmi_collocations(docs, vocab_size=200, min_pair_count=2)


def q_changelog_upsert(sf_dir: str):
    """CDC latest-wins upsert: user profile = latest event per user,
    'error' events tombstone the profile. Applied in TWO incremental
    batches (event_id parity split, tombstones kept between batches) so
    the snapshot+changelog merge path and the out-of-order tombstone
    guard are both exercised; each batch is one pre-pruned hash exchange
    (state/upsert.py)."""
    import numpy as np
    import pandas as pd

    from knowledgegraphs_ray.state.upsert import changelog_upsert

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )

    def to_log(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["user_id"],
                "last_value": df["value"],
                "last_event": df["event_type"],
                "ts": df["ts"],
                "seq": df["event_id"],
                "op": np.where(df["event_type"] == "error", "delete", "upsert"),
            }
        )

    log = ev.map_batches(to_log, batch_format="pandas").materialize()
    even = log.map_batches(lambda df: df[df["seq"] % 2 == 0], batch_format="pandas")
    odd = log.map_batches(lambda df: df[df["seq"] % 2 == 1], batch_format="pandas")
    snap = changelog_upsert(
        None, even, key="user_id", keep_tombstones=True
    ).materialize()
    return changelog_upsert(snap, odd, key="user_id")


def q_retention_cohorts(sf_dir: str):
    """Weekly cohort retention over the events stream: distinct users per
    (first-event week, week offset) — int64 floor-divided week index,
    one user-hash exchange (streaming/retention.py)."""
    from knowledgegraphs_ray.streaming.retention import retention_cohorts

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    return retention_cohorts(ev)


def q_hybrid_search(sf_dir: str):
    """Hybrid retrieval: reciprocal-rank fusion of the BM25 leg and the
    dense cosine leg with integer floor-division weights (sim/hybrid.py);
    both legs are per-block top-k scans, fusion is 2k driver rows."""
    from knowledgegraphs_ray.sim.hybrid import hybrid_rrf_topk

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    return hybrid_rrf_topk(
        _docs(sf_dir, ["doc_id", "text"]),
        emb,
        query_text="hash join customer",
        query_vec_id=0,
        k=15,
    )


def q_ngram_diversity(sf_dir: str):
    """Per-language distinct-n shingle diversity (text/diversity.py):
    per-block-unique (lang, gram) partials, integer ratio, shared
    tok/sh-CTE gram identity with the minhash family."""
    from knowledgegraphs_ray.text.diversity import ngram_diversity

    return ngram_diversity(_docs(sf_dir, ["doc_id", "lang", "text"]))


def q_token_cooccurrence(sf_dir: str):
    """Distinct-per-document token co-occurrence counts with document
    frequencies over the documents corpus (text/cooccur.py) — the integer
    inputs to PMI / association scoring, bit-exact vs the self-join twin."""
    from knowledgegraphs_ray.text.cooccur import token_cooccurrence

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return token_cooccurrence(docs, vocab_size=200, min_pair_count=2)


def q_image_phash_pairs(sf_dir: str):
    """Perceptual image near-dup pairs over a deterministic mixed
    PNG/JPEG corpus (multimodal/phash.py + both from-scratch codecs):
    320 seeded gradient images, every 8th re-encoded as a
    brightness-shifted JPEG near-duplicate — decode is container-sniffed
    (baseline+progressive JPEG / PNG), aHash fingerprints (8 bytes/row
    after the actor-pool stage), simhash pigeonhole pair kernel. Binary
    payloads are not SQL-expressible, so this is a rows-only driver
    check (like bpe_token_counts); determinism is pinned by pytest.
    Corpus size is fixed (sf-independent) — the multimodal contract
    check, not a throughput benchmark."""
    import numpy as np

    from knowledgegraphs_ray.multimodal.jpeg import encode_jpeg
    from knowledgegraphs_ray.multimodal.phash import image_near_dup_pairs
    from knowledgegraphs_ray.multimodal.png import encode_png

    rng = np.random.default_rng(1234)
    ids, payloads = [], []
    n = 320
    for i in range(n):
        h, w = 24 + int(rng.integers(0, 17)), 24 + int(rng.integers(0, 17))
        # noise images: aHash is near-uniform over 64 bits, so incidental
        # collisions at distance<=3 are rare and the planted pairs dominate
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        ids.append(i)
        payloads.append(encode_png(img))
        if i % 8 == 0:  # planted near-duplicate, other container
            ids.append(n + i)
            shifted = np.clip(img.astype(np.int16) + 6, 0, 255).astype(
                np.uint8
            )
            payloads.append(
                encode_jpeg(shifted, quality=95, progressive=(i % 16 == 0))
            )
    t = pa.table(
        {
            "item_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )
    pairs = image_near_dup_pairs(
        ray.data.from_arrow(t), codec="real", max_distance=3
    )
    return pairs.sort(["doc_a", "doc_b"])


def queries() -> dict[str, Callable[[str], Any]]:
    # Ordering contract: the driver's correctness gate checks the FIRST 50
    # entries in dict order.  Round-5 window: the 13 round-3-tail queries
    # that had never had a driver-side green row, the new
    # watermark_sessions operator, every query whose code changed this
    # round (ER halo verify, setjoin auto-steering, pivot NULL semantics,
    # substrdup offsets, the co-purchase trio thresholds), and the
    # heaviest users of the newly-centralized native_join compaction.
    # Entries 51+ were all green in the r1-r4 driver union with code
    # unchanged since; the displaced ones are additionally pinned in
    # tests/test_oracle_gate.py's sf0.001 pytest gate.
    return {
        # --- the 50-entry driver window (r5) ---
        "frequent_tokens": q_frequent_tokens,
        "bm25_topk": q_bm25_topk,
        "token_quantiles": q_token_quantiles,
        "lm_perplexity": q_lm_perplexity,
        "dup_window_stats": q_dup_window_stats,
        "dsir_weights": q_dsir_weights,
        "semantic_dedup": q_semantic_dedup,
        "bpe_token_counts": q_bpe_token_counts,
        "c4_clean": q_c4_clean,
        "mixture_budget": q_mixture_budget,
        "chunk_sequences": q_chunk_sequences,
        "top_docs_per_lang": q_top_docs_per_lang,
        "customers_without_orders": q_customers_without_orders,
        "watermark_sessions": q_watermark_sessions,
        "er_canonical_ids": q_er_canonical_ids,
        "setjoin_pairs": q_setjoin_pairs,
        "user_event_pivot": q_user_event_pivot,
        "repeated_spans": q_repeated_spans,
        "copurchase_kcore": q_copurchase_kcore,
        "copurchase_jaccard": q_copurchase_jaccard,
        "link_prediction": q_link_prediction,
        "incremental_minhash": q_incremental_minhash,
        "incremental_dedup": q_incremental_dedup,
        "minhash_dedup_pairs": q_minhash_dedup_pairs,
        "minhash_components": q_minhash_components,
        "dedup_resolved_corpus": q_dedup_resolved_corpus,
        "decontaminated_docs": q_decontaminated_docs,
        "simhash_pairs": q_simhash_pairs,
        "embedding_near_dups": q_embedding_near_dups,
        "ann_ivf_pq_topk": q_ann_ivf_pq_topk,
        "kg_bfs_depths": q_kg_bfs_depths,
        "kg_random_walks": q_kg_random_walks,
        "kg_ppr": q_kg_ppr,
        "kg_pagerank": q_kg_pagerank,
        "kg_components": q_kg_components,
        "copurchase_triangles": q_copurchase_triangles,
        "curation_chain": q_curation_chain,
        "kg_triples_star": q_kg_triples_star,
        "kg_transcripts": q_kg_transcripts,
        "kg_triples_events": q_kg_triples_events,
        "kg_triples_dedup": q_kg_triples_dedup,
        "discovered_fks": q_discovered_fks,
        "fk_containment": q_fk_containment,
        "lineitem_orders_join": q_lineitem_orders_join,
        "orders_customer_join": q_orders_customer_join,
        "purchases_last_view": q_purchases_last_view,
        "purchase_sessions": q_purchase_sessions,
        "dq_orders": q_dq_orders,
        "hybrid_search": q_hybrid_search,
        "image_phash_pairs": q_image_phash_pairs,  # rows-only (binary)
        # --- green in the r1-r4 driver union, code unchanged ---
        "mapping_selection": q_mapping_selection,
        "snm_candidate_pairs": q_snm_candidate_pairs,
        "orders_rollup": q_orders_rollup,
        "pmi_collocations": q_pmi_collocations,
        "changelog_upsert": q_changelog_upsert,
        "watermark_windows": q_watermark_windows,
        "tool_transitions": q_tool_transitions,
        "conv_stats": q_conv_stats,
        "conv_fingerprints": q_conv_fingerprints,
        "rolling_events": q_rolling_events,
        "spend_outliers": q_spend_outliers,
        "retention_cohorts": q_retention_cohorts,
        "ngram_diversity": q_ngram_diversity,
        "source_quota_cap": q_source_quota_cap,
        "leakage_safe_splits": q_leakage_safe_splits,
        "event_funnel": q_event_funnel,
        "token_cooccurrence": q_token_cooccurrence,
        "dsir_bigram_weights": q_dsir_bigram_weights,
        "gopher_quality": q_gopher_quality,
        "chat_pairs": q_chat_pairs,
        "lm_bigram_ppl": q_lm_bigram_ppl,
        "embedding_clusters": q_embedding_clusters,
        "corpus_diff": q_corpus_diff,
        "weighted_sample": q_weighted_sample,
        "temperature_sample": q_temperature_sample,
        "resolve_best_score": q_resolve_best_score,
        "pca_projection": q_pca_projection,
        "cluster_balanced_sample": q_cluster_balanced_sample,
        "corpus_overlap": q_corpus_overlap,
        "corpus_splits": q_corpus_splits,
        "score_percentiles": q_score_percentiles,
        "quality_classifier": q_quality_classifier,
        "corpus_shuffle": q_corpus_shuffle,
        "paragraph_dedup": q_paragraph_dedup,
        "kg_pred_stats": q_kg_pred_stats,
        "dedup_exact_documents": q_dedup_exact_documents,
        "ngram_dedup_pairs": q_ngram_dedup_pairs,
        "link_scored_documents": q_link_scored_documents,
        "canonical_mentions": q_canonical_mentions,
        "pii_scan_documents": q_pii_scan_documents,
        "pii_redact_documents": q_pii_redact_documents,
        "events_sessionize": q_events_sessionize,
        "candidate_keys_customer": q_candidate_keys_customer,
        "kg_triples_customer": q_kg_triples_customer,
        "kg_triples_orders": q_kg_triples_orders,
        "kg_attr_classes_customer": q_kg_attr_classes_customer,
        "kg_triples_bridge": q_kg_triples_bridge,
        "text_token_stats": q_text_token_stats,
        "text_quality": q_text_quality,
        "lang_id": q_lang_id,
        "ann_topk": q_ann_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "doc_fingerprints": q_doc_fingerprints,
        "mentions_documents": q_mentions_documents,
        "link_exact_documents": q_link_exact_documents,
        "clean_corpus": q_clean_corpus,
        "corpus_sample": q_corpus_sample,
        "pricing_summary": q_pricing_summary,
        "top_customers": q_top_customers,
        "pii_schema": q_pii_schema,
        "events_tumbling": q_events_tumbling,
        "events_hopping": q_events_hopping,
        "events_sessionize_incremental": q_events_sessionize_incremental,
        "json_triples_events": q_json_triples_events,
        "embedding_pairs_exact": q_embedding_pairs_exact,
    }


# --- DuckDB oracle twins ----------------------------------------------------


def _plan_sql(tables: list[str], **kw) -> str:
    g = tpch_schema(tables)
    rules = compile_rules(g, **kw)
    return sqlgen.kg_sql(rules, g, tables)


def _events_vdim_sql() -> str:
    """Oracle twin of ``extract_events_kg``: the fact-table triples come from
    the SAME compiled plan via sqlgen; the virtual-dimension individuals are
    the distinct-user type triples."""
    from knowledgegraphs_ray.pipelines.relational import events_schema
    from knowledgegraphs_ray.rules.compiler import KG, RDF_TYPE, class_iri

    g = events_schema()
    rules = compile_rules(g)
    facts = sqlgen.triples_sql(rules.plans["events"], g["events"].columns)
    users = (
        f"SELECT '{KG}user/' || CAST(user_id AS VARCHAR) AS subj, "
        f"'{RDF_TYPE}' AS pred, '{class_iri('user')}' AS obj "
        "FROM (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL)"
    )
    return facts + "\nUNION ALL\n" + users


# DuckDB single-quoted strings keep backslashes literal — pass regexes as-is.
_STOP_RE_SQL = ta.STOP_RE
_TOKEN_RE_SQL = ta.TOKEN_RE

_SESSIONIZE_SQL = (
    "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ep, "
    "  CAST(round(value * 100) AS BIGINT) AS cents FROM events), "
    "s AS (SELECT *, CASE WHEN ep - lag(ep) OVER "
    "  (PARTITION BY user_id ORDER BY ep, event_id) > 1800 * 1000000 "
    "  THEN 1 ELSE 0 END AS brk FROM e), "
    "t AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ep, event_id "
    "  ROWS UNBOUNDED PRECEDING) AS session_idx FROM s) "
    "SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx, "
    "count(*) AS n_events, CAST(sum(cents) AS BIGINT) AS sum_cents, "
    "min(ep) AS start_us, max(ep) AS end_us "
    "FROM t GROUP BY user_id, session_idx"
)

_ANN_TOPK_SQL = (
    "WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id IN (0,1,2)), "
    "scored AS (SELECT q.query_id, e.vec_id AS neighbor_id, "
    "  list_cosine_similarity(q.qe, e.embedding) AS score FROM q CROSS JOIN embeddings e) "
    "SELECT query_id, neighbor_id, "
    "  CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS BIGINT) AS rank "
    "FROM scored QUALIFY rank <= 10"
)


def _dq_orders_oracle() -> str:
    from knowledgegraphs_ray.schema.validate import Rule, validate_oracle_sql

    rules = [
        Rule("orderkey_not_null", "not_null", "o_orderkey"),
        Rule("orderkey_unique", "unique", "o_orderkey"),
        Rule(
            "status_domain",
            "accepted_values",
            "o_orderstatus",
            {"values": ["O", "F", "P"]},
        ),
        Rule("price_range", "in_range", "o_totalprice", {"lo": 0, "hi": 300000}),
        Rule(
            "priority_format",
            "matches_regex",
            "o_orderpriority",
            {"pattern": "^[1-5]-"},
        ),
        Rule("custkey_fk", "fk", "o_custkey", {"ref": None, "ref_col": "c_custkey"}),
    ]
    return validate_oracle_sql(
        "SELECT * FROM orders",
        rules,
        ref_sqls={"custkey_fk": "SELECT c_custkey FROM customer"},
    )


def oracle_sql() -> dict[str, str]:
    lang_score_cols = ",\n  ".join(
        "len(regexp_extract_all(lower(text), '\\b("
        + "|".join(m)
        + ")\\b')) AS score_"
        + l
        for l, m in ta.LANG_MARKERS.items()
    )
    lang_pred = (
        "CASE WHEN greatest(score_en, score_de, score_es, score_fr) = 0 THEN 'und' "
        "WHEN score_en >= score_de AND score_en >= score_es AND score_en >= score_fr THEN 'en' "
        "WHEN score_de >= score_es AND score_de >= score_fr THEN 'de' "
        "WHEN score_es >= score_fr THEN 'es' ELSE 'fr' END"
    )
    from knowledgegraphs_ray.linking.selection_gate import mapping_selection_sql

    return {
        # repeated_spans: window generation via scalar range()+unnest, dup
        # filter counts the gram STRING (engine: 128-bit byte fold of the
        # same grams), identical lag/cumsum island rule with gap = length
        "repeated_spans": __import__(
            "knowledgegraphs_ray.text.substrdup",
            fromlist=["repeated_spans_oracle_sql"],
        ).repeated_spans_oracle_sql(),
        # snm_candidate_pairs: row_number over the identical (prefix, id)
        # total order, rank-gap self-join in [1, window-1]
        "snm_candidate_pairs": __import__(
            "knowledgegraphs_ray.linking.blocking", fromlist=["snm_oracle_sql"]
        ).snm_oracle_sql(
            table="documents",
            id_expr="doc_id",
            key_exprs=["substr(text, 1, 16)"],
            window=4,
        ),
        # er_canonical_ids: composed twin — rank-gap blocking + distinct-
        # token intersection + floor-division threshold + recursive-CTE
        # components + coalesce(self) for singletons
        "er_canonical_ids": __import__(
            "knowledgegraphs_ray.pipelines.er", fromlist=["er_resolve_oracle_sql"]
        ).er_resolve_oracle_sql(),
        # user_event_pivot: SUM(CASE ...) twin, identical column naming,
        # cents via the shared round(x*100) rule, OOV pool = NOT IN list
        "user_event_pivot": __import__(
            "knowledgegraphs_ray.pipelines.pivot", fromlist=["pivot_oracle_sql"]
        ).pivot_oracle_sql(
            table="events",
            group_col="user_id",
            pivot_col="event_type",
            categories=["view", "click", "purchase", "signup"],
            value_cents_expr="CAST(round(value * 100) AS BIGINT)",
        ),
        "mapping_selection": mapping_selection_sql(),
        "dsir_bigram_weights": __import__(
            "knowledgegraphs_ray.text.dsir", fromlist=["dsir_hashed_oracle_sql"]
        ).dsir_hashed_oracle_sql(),
        "curation_chain": __import__(
            "knowledgegraphs_ray.pipelines.curation", fromlist=["curation_oracle_sql"]
        ).curation_oracle_sql(rates={"en": 0.5, "de": 0.25, "es": 1.0}),
        "kg_triples_customer": _plan_sql(["customer"]),
        "kg_triples_orders": _plan_sql(["orders"]),
        "kg_triples_star": _plan_sql(STAR_TABLES),
        "kg_attr_classes_customer": _plan_sql(["customer"], attrs_to_classes=True),
        "kg_transcripts": sqlgen.transcript_triples_sql(),
        # tool_transitions / conv_stats: the transcript derivation (conv =
        # user, order = (ts, event_id), role = EVENT_ROLE case) re-expressed
        # as lead() / grouped-CASE windows over the raw events view
        "tool_transitions": __import__(
            "knowledgegraphs_ray.pipelines.transcripts",
            fromlist=["tool_transitions_oracle_sql"],
        ).tool_transitions_oracle_sql(),
        # kg_bfs_depths: depth-capped recursive CTE — polynomial states
        # (node, depth<=6); min(depth) == BFS layer on both sides
        "kg_bfs_depths": __import__(
            "knowledgegraphs_ray.graph.bfs", fromlist=["bfs_oracle_sql"]
        ).bfs_oracle_sql(
            "SELECT subj AS src, obj AS dst FROM ("
            + _plan_sql(STAR_TABLES)
            + ") WHERE pred LIKE 'kg:p~_%' ESCAPE '~'",
            seed_prefix="kg:region/",
            max_depth=6,
        ),
        # link_prediction: integer cn + micro-unit AA (same libm ln(double)
        # + floor(double division) on both sides); edges twin == kcore's
        # support-2 co-purchase SQL
        "link_prediction": __import__(
            "knowledgegraphs_ray.graph.linkpred",
            fromlist=["link_prediction_oracle_sql"],
        ).link_prediction_oracle_sql(
            "SELECT src AS u, dst AS v FROM ("
            "SELECT a.l_partkey AS src, b.l_partkey AS dst, "
            "COUNT(DISTINCT a.l_orderkey) AS c FROM lineitem a "
            "JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
            "AND a.l_partkey < b.l_partkey GROUP BY src, dst"
            ") WHERE c >= 2",
            min_cn=1,
        ),
        # copurchase_jaccard: same wedge twin + two degree joins, jac via
        # DuckDB BIGINT // (floor division on non-negative operands)
        "copurchase_jaccard": __import__(
            "knowledgegraphs_ray.graph.linkpred",
            fromlist=["link_prediction_oracle_sql"],
        ).link_prediction_oracle_sql(
            "SELECT src AS u, dst AS v FROM ("
            "SELECT a.l_partkey AS src, b.l_partkey AS dst, "
            "COUNT(DISTINCT a.l_orderkey) AS c FROM lineitem a "
            "JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
            "AND a.l_partkey < b.l_partkey GROUP BY src, dst"
            ") WHERE c >= 2",
            min_cn=1,
            include_jaccard=True,
        ),
        "conv_stats": __import__(
            "knowledgegraphs_ray.pipelines.transcripts",
            fromlist=["conversation_stats_oracle_sql"],
        ).conversation_stats_oracle_sql(),
        # conv_fingerprints: both sides md5 the same \x1f-joined ordered
        # turn texts — value-exact hex digests
        "conv_fingerprints": __import__(
            "knowledgegraphs_ray.pipelines.transcripts",
            fromlist=["conversation_fingerprints_oracle_sql"],
        ).conversation_fingerprints_oracle_sql(),
        "kg_triples_events": _events_vdim_sql(),
        # kg_pagerank: integer fixed-point iteration — identical floor-div
        # arithmetic on both sides, so the CTE unroll is a true value oracle
        "kg_pagerank": __import__(
            "knowledgegraphs_ray.graph.pagerank", fromlist=["pagerank_oracle_sql"]
        ).pagerank_oracle_sql(
            "SELECT subj AS src, obj AS dst FROM ("
            + _plan_sql(STAR_TABLES)
            + ") WHERE pred LIKE 'kg:p~_%' ESCAPE '~'",
            iters=5,
        ),
        # kg_ppr: same unrolled-CTE twin with the seed-masked CASE init +
        # base term (LIKE 'kg:region/%' — no wildcards in the prefix)
        "kg_ppr": __import__(
            "knowledgegraphs_ray.graph.pagerank", fromlist=["pagerank_oracle_sql"]
        ).pagerank_oracle_sql(
            "SELECT subj AS src, obj AS dst FROM ("
            + _plan_sql(STAR_TABLES)
            + ") WHERE pred LIKE 'kg:p~_%' ESCAPE '~'",
            iters=5,
            seed_prefix="kg:region/",
        ),
        # watermark_windows: per-shard watermark CTEs — an event is kept
        # iff its window end clears the watermark standing when its shard
        # arrived; kept events then aggregate exactly once
        "watermark_windows": __import__(
            "knowledgegraphs_ray.streaming.watermark",
            fromlist=["watermark_tumbling_oracle_sql"],
        ).watermark_tumbling_oracle_sql(
            [
                "SELECT user_id, ts, value FROM events "
                "WHERE event_id % 20 != 0 AND epoch_us(ts) < 1705363200000000",
                "SELECT user_id, ts, value FROM events "
                "WHERE event_id % 20 != 0 AND epoch_us(ts) >= 1705363200000000",
                "SELECT user_id, ts, value FROM events WHERE event_id % 20 = 0",
            ],
            window_sec=3600,
            lateness_sec=2 * 86400,
        ),
        # watermark_sessions: same per-shard watermark CTEs; the kept
        # union sessionizes with the batch gaps-and-islands twin (equal
        # to the incremental emission by the finalization safety
        # argument in streaming/watermark.py)
        "watermark_sessions": __import__(
            "knowledgegraphs_ray.streaming.watermark",
            fromlist=["watermark_sessions_oracle_sql"],
        ).watermark_sessions_oracle_sql(
            [
                "SELECT user_id, ts, value FROM events "
                "WHERE event_id % 20 != 0 AND epoch_us(ts) < 1705363200000000",
                "SELECT user_id, ts, value FROM events "
                "WHERE event_id % 20 != 0 AND epoch_us(ts) >= 1705363200000000",
                "SELECT user_id, ts, value FROM events WHERE event_id % 20 = 0",
            ],
            gap_sec=6 * 3600,
            lateness_sec=2 * 86400,
        ),
        # kg_random_walks: unrolled per-step joins on rnk = md5-u64 % deg
        # over the row_number-ranked distinct adjacency — bit-identical
        # md5 choice on both sides
        "kg_random_walks": __import__(
            "knowledgegraphs_ray.graph.walks",
            fromlist=["random_walks_oracle_sql"],
        ).random_walks_oracle_sql(
            "SELECT subj AS src, obj AS dst FROM ("
            + _plan_sql(STAR_TABLES)
            + ") WHERE pred LIKE 'kg:p~_%' ESCAPE '~'",
            start_prefix="kg:lineitem/",
            walk_len=4,
        ),
        # rolling_events: sliding ROWS + RANGE frames — exact int64 cents
        # sums/counts/min/max on both sides; DuckDB window SUM over BIGINT
        # returns HUGEINT, hence the CASTs
        "rolling_events": (
            "WITH t AS (SELECT event_id, user_id, "
            "  CAST(epoch_us(ts) AS BIGINT) AS ts_us, "
            "  CAST(round(value * 100) AS BIGINT) AS cents FROM events) "
            "SELECT event_id, user_id, ts_us, cents, "
            "  CAST(SUM(cents) OVER rw AS BIGINT) AS roll_sum, "
            "  COUNT(*) OVER rw AS roll_cnt, "
            "  MIN(cents) OVER rw AS roll_min, "
            "  MAX(cents) OVER rw AS roll_max, "
            "  CAST(SUM(cents) OVER gw AS BIGINT) AS range_sum, "
            "  COUNT(*) OVER gw AS range_cnt "
            "FROM t WINDOW "
            "  rw AS (PARTITION BY user_id ORDER BY ts_us, event_id "
            "         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), "
            "  gw AS (PARTITION BY user_id ORDER BY ts_us "
            "         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)"
        ),
        # spend_outliers: z-score test as a pure-integer inequality —
        # HUGEINT products on the SQL side, float-with-exact-fallback on
        # the Ray side decide identically at any magnitude
        "spend_outliers": (
            "WITH t AS (SELECT event_id, user_id, "
            "  CAST(round(value * 100) AS BIGINT) AS cents FROM events), "
            "g AS (SELECT user_id, COUNT(*) AS n, "
            "  CAST(SUM(cents) AS BIGINT) AS s, "
            "  CAST(SUM(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS q "
            "  FROM t GROUP BY user_id) "
            "SELECT t.event_id, t.user_id, t.cents, "
            "  (CAST(g.n AS HUGEINT) * t.cents - g.s) "
            "    * (CAST(g.n AS HUGEINT) * t.cents - g.s) "
            "  > 4 * (CAST(g.n AS HUGEINT) * g.q - CAST(g.s AS HUGEINT) * g.s) "
            "  AS is_outlier "
            "FROM t JOIN g USING (user_id)"
        ),
        # event_funnel: strict-ordering reach via chained CTEs — pure
        # integer timestamp comparisons on both sides
        "event_funnel": __import__(
            "knowledgegraphs_ray.streaming.funnel",
            fromlist=["funnel_oracle_sql"],
        ).funnel_oracle_sql(["view", "click", "purchase"]),
        # token_cooccurrence: integer-count co-occurrence (PMI left to the
        # caller — float logs are reassociation hazards), distinct-per-doc
        # self-join twin with (df DESC, token) vocabulary tie-break
        "token_cooccurrence": __import__(
            "knowledgegraphs_ray.text.cooccur",
            fromlist=["cooccurrence_oracle_sql"],
        ).cooccurrence_oracle_sql(vocab_size=200, min_pair_count=2),
        # copurchase_triangles: pure-integer counts — the 3-way self-join
        # twin lists each triangle once at a < b < c, same as the engine's
        # degree-oriented enumeration (one count per unique lowest vertex)
        "copurchase_triangles": __import__(
            "knowledgegraphs_ray.graph.triangles",
            fromlist=["triangles_oracle_sql"],
        ).triangles_oracle_sql(
            "SELECT a.l_partkey AS src, b.l_partkey AS dst FROM lineitem a "
            "JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
            "AND a.l_partkey < b.l_partkey"
        ),
        # copurchase_kcore: integer degree peeling — the unrolled-CTE twin
        # (MATERIALIZED per round) is exact at any unroll depth >= the
        # engine's round count (extra rounds are fixpoint no-ops); the
        # support-2 edge filter is a COUNT(DISTINCT order) HAVING on both
        # sides
        # setjoin_pairs: brute-force token self-join twin — the engine's
        # prefix filter is completeness-preserving, so the sets are equal
        "setjoin_pairs": __import__(
            "knowledgegraphs_ray.dedup.setjoin",
            fromlist=["set_similarity_oracle_sql"],
        ).set_similarity_oracle_sql(threshold_micro=900_000, shingle_k=3),
        # dq_orders: UNION ALL of per-rule filtered counts with SQL null
        # discipline (NULL violates only not_null; unique over non-nulls)
        "dq_orders": _dq_orders_oracle(),
        # orders_rollup: GROUP BY GROUPING SETS twin with the identical
        # GROUPING() bitmask; cents via the shared round(x*100) rule
        "orders_rollup": __import__(
            "knowledgegraphs_ray.pipelines.analytics",
            fromlist=["grouping_sets_oracle_sql"],
        ).grouping_sets_oracle_sql(
            "SELECT o_orderpriority, o_orderstatus, "
            "CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders",
            key_cols=["o_orderpriority", "o_orderstatus"],
            sets=[["o_orderpriority", "o_orderstatus"], ["o_orderpriority"], []],
            sum_cols={"total_cents": "cents"},
            count_col="n_orders",
        ),
        # pmi_collocations: co-occurrence twin + identical int64-product →
        # double → ln → floor pipeline (single libm call on both sides)
        "pmi_collocations": __import__(
            "knowledgegraphs_ray.text.cooccur", fromlist=["pmi_oracle_sql"]
        ).pmi_oracle_sql(vocab_size=200, min_pair_count=2),
        # changelog_upsert: latest-wins row_number twin over the one-shot
        # log — equals the engine's two-batch incremental application
        # because tombstones are kept between batches
        "changelog_upsert": __import__(
            "knowledgegraphs_ray.state.upsert",
            fromlist=["changelog_upsert_oracle_sql"],
        ).changelog_upsert_oracle_sql(
            None,
            "SELECT user_id, value AS last_value, event_type AS last_event, "
            "ts, event_id AS seq, "
            "CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END "
            "AS op FROM events",
            key="user_id",
            out_cols="user_id, last_value, last_event, ts, seq",
        ),
        # retention_cohorts: int64 floor-divided week index on both sides
        "retention_cohorts": __import__(
            "knowledgegraphs_ray.streaming.retention",
            fromlist=["retention_oracle_sql"],
        ).retention_oracle_sql(),
        # hybrid_search: bm25 twin + cosine rank list, fused with the same
        # integer floor-division RRF weights
        "hybrid_search": __import__(
            "knowledgegraphs_ray.sim.hybrid", fromlist=["hybrid_rrf_oracle_sql"]
        ).hybrid_rrf_oracle_sql(
            query_text="hash join customer", query_vec_id=0, k=15
        ),
        # ngram_diversity: shared tok/sh CTE, COUNT vs COUNT DISTINCT per lang
        "ngram_diversity": __import__(
            "knowledgegraphs_ray.text.diversity",
            fromlist=["ngram_diversity_oracle_sql"],
        ).ngram_diversity_oracle_sql(),
        # source_quota_cap: row_number over the identical signed-shifted
        # md5 hash — pure integer order on both sides
        "source_quota_cap": __import__(
            "knowledgegraphs_ray.pipelines.training_data",
            fromlist=["quota_cap_oracle_sql"],
        ).quota_cap_oracle_sql(cap=10, seed=11),
        # leakage_safe_splits: COALESCE(component, doc_id) representative +
        # the assign_splits integer-threshold CASE, components via the
        # recursive-CTE minhash twin
        "leakage_safe_splits": __import__(
            "knowledgegraphs_ray.pipelines.training_data",
            fromlist=["leakage_safe_splits_oracle_sql"],
        ).leakage_safe_splits_oracle_sql(
            __import__(
                "knowledgegraphs_ray.dedup.minhash",
                fromlist=["minhash_components_oracle_sql"],
            ).minhash_components_oracle_sql(threshold=0.7),
            seed=17,
        ),
        "copurchase_kcore": __import__(
            "knowledgegraphs_ray.graph.kcore", fromlist=["kcore_oracle_sql"]
        ).kcore_oracle_sql(
            "SELECT src, dst FROM ("
            "SELECT a.l_partkey AS src, b.l_partkey AS dst, "
            "COUNT(DISTINCT a.l_orderkey) AS c FROM lineitem a "
            "JOIN lineitem b ON a.l_orderkey = b.l_orderkey "
            "AND a.l_partkey < b.l_partkey GROUP BY src, dst"
            ") WHERE c >= 2",
            k_sql="2",
            rounds=24,
        ),
        # kg_components: undirected reachability, representative = min
        # reachable IRI on both sides (UnionFind rule == CTE min(label))
        "kg_components": __import__(
            "knowledgegraphs_ray.graph.components",
            fromlist=["components_oracle_sql"],
        ).components_oracle_sql(
            "SELECT subj AS src, obj AS dst FROM ("
            + _plan_sql(_COMPONENT_TABLES)
            + ") WHERE pred LIKE 'kg:p~_%' ESCAPE '~'"
        ),
        "fk_containment": (
            "SELECT count(*) AS n_src_rows, "
            "CAST(coalesce(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_dangling, "
            "coalesce(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END), 0) = 0 AS contained "
            "FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey"
        ),
        "dedup_exact_documents": (
            "SELECT min(doc_id) AS doc_id, count(*) AS n_copies, text "
            "FROM documents GROUP BY text"
        ),
        "text_token_stats": (
            f"SELECT doc_id, len(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS n_tokens, "
            "length(text) AS n_chars_actual FROM documents"
        ),
        "text_quality": (
            "SELECT doc_id, "
            "CASE WHEN length(text) > 0 THEN "
            "  len(regexp_extract_all(text, '[.,;:!?]')) / CAST(length(text) AS DOUBLE) ELSE 0.0 END AS punct_ratio, "
            f"CASE WHEN len(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) > 0 THEN "
            f"  len(regexp_extract_all(lower(text), '{_STOP_RE_SQL}')) "
            f"  / CAST(len(regexp_extract_all(text, '{_TOKEN_RE_SQL}')) AS DOUBLE) ELSE 0.0 END AS stop_ratio "
            "FROM documents"
        ),
        "lang_id": (
            "SELECT doc_id, score_en, score_de, score_es, score_fr, "
            + lang_pred
            + " AS lang_pred FROM (SELECT doc_id,\n  "
            + lang_score_cols
            + " FROM documents)"
        ),
        "ann_topk": _ANN_TOPK_SQL,
        # ann_ivf_topk probes ALL lists (n_probe == n_list) -> exact: the
        # brute-force SQL is a true oracle for the full IVF path
        "ann_ivf_topk": _ANN_TOPK_SQL,
        # ann_ivf_pq_topk probes ALL lists and exact-reranks the full
        # corpus -> exact: the brute-force SQL is a true oracle for the
        # complete IVF-PQ path
        "ann_ivf_pq_topk": _ANN_TOPK_SQL,
        # doc_fingerprints: the byte-level polynomial rolling hash IS
        # SQL-expressible as a Horner fold over codepoints (== bytes for the
        # ASCII testdata; a non-ASCII doc would surface as a value mismatch,
        # not a silent pass). HUGEINT carries acc*BASE+byte < 2^104.
        "doc_fingerprints": (
            "SELECT doc_id, CAST(list_reduce(list_concat([0::HUGEINT], "
            "  list_transform(regexp_extract_all(coalesce(text, ''), '.', 0, 's'), "
            "    c -> unicode(c)::HUGEINT)), "
            "  (acc, x) -> (acc * 1099511628211::HUGEINT + x) % 18446744073709551616::HUGEINT) "
            "AS UBIGINT) AS fingerprint FROM documents"
        ),
        # link_scored_documents: the surrogate scorer's selected links are a
        # pure function of the LABEL VOCABULARY present in the corpus (scores
        # depend on mention/candidate strings, not corpus size) — verified
        # identical at sf0.001/0.01/0.1 — so the expected rows are inlined as
        # VALUES, same technique as pii_schema
        "link_scored_documents": (
            "SELECT * FROM (VALUES "
            "('customer', 'kg:Customer', 1.0, 1.0), "
            "('part', 'kg:Part', 1.0, 1.0)"
            ") AS t(mention, cand_iri, bes, pj)"
        ),
        # minhash: every hash in the pipeline is the SQL-expressible
        # byte-polynomial fold, so the FULL seeded sketch admits an exact
        # DuckDB oracle (generated with the identical permutation constants)
        "minhash_dedup_pairs": __import__(
            "knowledgegraphs_ray.dedup.minhash", fromlist=["minhash_oracle_sql"]
        ).minhash_oracle_sql(threshold=0.7),
        "minhash_components": __import__(
            "knowledgegraphs_ray.dedup.minhash",
            fromlist=["minhash_components_oracle_sql"],
        ).minhash_components_oracle_sql(threshold=0.7),
        "dedup_resolved_corpus": __import__(
            "knowledgegraphs_ray.dedup.resolve", fromlist=["resolve_oracle_sql"]
        ).resolve_oracle_sql(
            __import__(
                "knowledgegraphs_ray.dedup.minhash",
                fromlist=["minhash_components_oracle_sql"],
            ).minhash_components_oracle_sql(threshold=0.7),
            keep="longest",
        ),
        "pca_projection": __import__(
            "knowledgegraphs_ray.sim.pca", fromlist=["oracle_sql"]
        ).oracle_sql(),
        "cluster_balanced_sample": __import__(
            "knowledgegraphs_ray.sim.clusters",
            fromlist=["cluster_balanced_sample_oracle_sql"],
        ).cluster_balanced_sample_oracle_sql(k_per_cluster=10),
        "corpus_overlap": __import__(
            "knowledgegraphs_ray.text.overlap",
            fromlist=["corpus_ngram_overlap_oracle_sql"],
        ).corpus_ngram_overlap_oracle_sql(side_a_pred="doc_id % 3 = 0"),
        "corpus_splits": __import__(
            "knowledgegraphs_ray.pipelines.training_data",
            fromlist=["assign_splits_oracle_sql"],
        ).assign_splits_oracle_sql(seed=17),
        "score_percentiles": __import__(
            "knowledgegraphs_ray.util.topk",
            fromlist=["percentile_per_group_oracle_sql"],
        ).percentile_per_group_oracle_sql(
            table=(
                "(SELECT doc_id, lang, CAST(len(regexp_extract_all(text, '"
                + _TOKEN_RE_SQL
                + "')) AS BIGINT) AS n_tokens FROM documents "
                "WHERE text IS NOT NULL)"
            ),
            key_cols=["lang"],
            score_col="n_tokens",
            id_col="doc_id",
            out_cols="doc_id, lang, n_tokens",
        ),
        "resolve_best_score": __import__(
            "knowledgegraphs_ray.dedup.resolve", fromlist=["resolve_oracle_sql"]
        ).resolve_oracle_sql(
            __import__(
                "knowledgegraphs_ray.dedup.minhash",
                fromlist=["minhash_components_oracle_sql"],
            ).minhash_components_oracle_sql(threshold=0.7),
            keep="best_score",
            score_col="n_chars",
            out_cols="doc_id, text, n_chars",
        ),
        "simhash_pairs": _simhash_sql(max_distance=3),
        "kg_triples_bridge": _bridge_sql(),
        "kg_triples_dedup": (
            "WITH kg AS ("
            + _plan_sql(["nation", "region"])
            + "), d AS (SELECT * FROM kg UNION ALL SELECT * FROM kg) "
            "SELECT subj, pred, obj, count(*) AS n_copies FROM d GROUP BY subj, pred, obj"
        ),
        "clean_corpus": __import__(
            "knowledgegraphs_ray.pipelines.training_data", fromlist=["clean_corpus_oracle_sql"]
        ).clean_corpus_oracle_sql(),
        "corpus_sample": __import__(
            "knowledgegraphs_ray.pipelines.training_data",
            fromlist=["stratified_sample_oracle_sql"],
        ).stratified_sample_oracle_sql(
            rates={"en": 0.5, "de": 0.25, "es": 1.0}, default_rate=0.1
        ),
        "kg_pred_stats": (
            "WITH kg AS (" + _plan_sql(STAR_TABLES) + ") "
            "SELECT pred, count(*) AS n_triples FROM kg GROUP BY pred"
        ),
        "purchases_last_view": (
            "SELECT p.event_id, "
            "(SELECT max(epoch_us(v.ts)) FROM events v "
            " WHERE v.user_id = p.user_id AND v.event_type = 'view' AND v.ts < p.ts) "
            "AS last_view_us "
            "FROM events p WHERE p.event_type = 'purchase'"
        ),
        "lineitem_orders_join": (
            "SELECT l.l_orderkey, l.l_linenumber, o.o_orderstatus "
            "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey"
        ),
        "candidate_keys_customer": " UNION ALL ".join(
            f"SELECT '{c}' AS column, count(DISTINCT {c}) AS n_distinct, "
            f"count(*) AS n_rows, count(DISTINCT {c}) = count(*) AS is_candidate_key "
            "FROM customer"
            for c in tpch_schema(["customer"])["customer"].columns
        ),
        "discovered_fks": _discovered_fks_sql(),
        "pricing_summary": (
            "SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents, "
            "count(*) AS n_rows FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "orders_customer_join": (
            "SELECT o.o_orderkey, c.c_name, c.c_mktsegment "
            "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"
        ),
        "top_customers": (
            "WITH a AS (SELECT o_custkey, "
            "  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents, "
            "  count(*) AS n_orders FROM orders GROUP BY o_custkey) "
            "SELECT CAST(row_number() OVER (ORDER BY total_cents DESC, o_custkey) AS BIGINT) AS rank, "
            "o_custkey, total_cents, n_orders FROM a "
            "ORDER BY total_cents DESC, o_custkey LIMIT 10"
        ),
        "pii_schema": _pii_schema_sql(),
        "pii_scan_documents": __import__(
            "knowledgegraphs_ray.pii.scan", fromlist=["pii_scan_oracle_sql"]
        ).pii_scan_oracle_sql(),
        "pii_redact_documents": __import__(
            "knowledgegraphs_ray.pii.scan", fromlist=["pii_redact_oracle_sql"]
        ).pii_redact_oracle_sql(),
        "events_tumbling": (
            "SELECT user_id, (epoch_us(ts) // 3600000000) * 3600 AS window_start, "
            "count(*) AS n_events, "
            "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents "
            "FROM events GROUP BY user_id, window_start"
        ),
        "events_hopping": (
            "SELECT user_id, k * 900 AS window_start, "
            "count(*) AS n_events, CAST(sum(cents) AS BIGINT) AS sum_cents FROM ("
            "  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents, "
            "  unnest(range((ep_s - 3600) // 900 + 1, ep_s // 900 + 1)) AS k "
            "  FROM (SELECT user_id, value, epoch_us(ts) // 1000000 AS ep_s FROM events)"
            ") GROUP BY user_id, k"
        ),
        "events_sessionize": _SESSIONIZE_SQL,
        "events_sessionize_incremental": _SESSIONIZE_SQL,
        "purchase_sessions": (
            "WITH sess AS (" + _SESSIONIZE_SQL + ") "
            "SELECT e.event_id, e.user_id, s.session_idx "
            "FROM events e JOIN sess s ON e.user_id = s.user_id "
            "AND epoch_us(e.ts) BETWEEN s.start_us AND s.end_us "
            "WHERE e.event_type = 'purchase'"
        ),
        "json_triples_events": (
            "SELECT 'kg:json/' || CAST(event_id AS VARCHAR) AS subj, 'rdf:type' AS pred, "
            "'kg:Record' AS obj FROM events WHERE props IS NOT NULL "
            "UNION ALL "
            "SELECT 'kg:json/' || CAST(event_id AS VARCHAR), 'kg:has_k', "
            "regexp_extract(props, '\"k\": (-?\\d+)', 1) FROM events "
            "WHERE props IS NOT NULL AND regexp_matches(props, '\"k\": -?\\d+')"
        ),
        "ngram_dedup_pairs": __import__(
            "knowledgegraphs_ray.dedup.ngram", fromlist=["ngram_pairs_oracle_sql"]
        ).ngram_pairs_oracle_sql(),
        "embedding_near_dups": (
            "SELECT a.vec_id AS doc_a, b.vec_id AS doc_b "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95"
        ),
        "embedding_pairs_exact": (
            "SELECT a.vec_id AS doc_a, b.vec_id AS doc_b "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4"
        ),
        "mentions_documents": _mentions_sql(),
        "link_exact_documents": _link_exact_sql(),
        "canonical_mentions": _canonical_mentions_sql(),
        "decontaminated_docs": _decontam_sql(),
        "incremental_minhash": __import__(
            "knowledgegraphs_ray.dedup.incremental_minhash",
            fromlist=["incremental_minhash_oracle_sql"],
        ).incremental_minhash_oracle_sql(threshold=0.7),
        "incremental_dedup": (
            "SELECT d.doc_id, d.text FROM documents d "
            "WHERE d.doc_id % 2 = 0 AND NOT EXISTS ("
            "SELECT 1 FROM documents s "
            "WHERE s.doc_id % 5 = 0 AND s.text = d.text)"
        ),
        "gopher_quality": _gopher_sql(),
        "chat_pairs": (
            "WITH t AS (" + sqlgen.TRANSCRIPTS_CTE + "), led AS ("
            "SELECT conv_id, turn_idx, role, text, "
            "lead(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS lead_role, "
            "lead(text) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS lead_text "
            "FROM t) "
            "SELECT conv_id, CAST(turn_idx AS INTEGER) AS turn_idx, "
            "text AS prompt, lead_text AS response FROM led "
            "WHERE role = 'user' AND lead_role = 'assistant'"
        ),
        "lm_bigram_ppl": __import__(
            "knowledgegraphs_ray.text.lm",
            fromlist=["bigram_perplexity_oracle_sql"],
        ).bigram_perplexity_oracle_sql(),
        "embedding_clusters": __import__(
            "knowledgegraphs_ray.sim.clusters", fromlist=["oracle_sql"]
        ).oracle_sql(),
        "corpus_diff": __import__(
            "knowledgegraphs_ray.state.diff",
            fromlist=["corpus_diff_oracle_sql"],
        ).corpus_diff_oracle_sql(
            old_table="(SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0)",
            new_table=(
                "(SELECT doc_id, CASE WHEN doc_id % 11 = 0 THEN text || '!' "
                "ELSE text END AS text FROM documents WHERE doc_id % 5 <> 0)"
            ),
        ),
        "weighted_sample": __import__(
            "knowledgegraphs_ray.pipelines.training_data",
            fromlist=["weighted_sample_oracle_sql"],
        ).weighted_sample_oracle_sql(k=100, seed=7),
        "temperature_sample": __import__(
            "knowledgegraphs_ray.pipelines.training_data",
            fromlist=["temperature_sample_oracle_sql"],
        ).temperature_sample_oracle_sql(tau=0.5, total_k=400),
        "quality_classifier": __import__(
            "knowledgegraphs_ray.text.classifier",
            fromlist=["oracle_sql"],
        ).oracle_sql(),
        "corpus_shuffle": _corpus_shuffle_sql(),
        "paragraph_dedup": __import__(
            "knowledgegraphs_ray.dedup.paragraphs",
            fromlist=["dedup_paragraphs_oracle_sql"],
        ).dedup_paragraphs_oracle_sql(
            min_count=2,
            table=(
                "(SELECT doc_id, coalesce(text, '') || chr(10) || chr(10) || "
                "'footer ' || CAST(doc_id % 5 AS VARCHAR) AS text "
                "FROM documents) ft"
            ),
        ),
        "frequent_tokens": __import__(
            "knowledgegraphs_ray.text.heavyhitters",
            fromlist=["frequent_tokens_oracle_sql"],
        ).frequent_tokens_oracle_sql(min_count=500),
        "bm25_topk": __import__(
            "knowledgegraphs_ray.text.bm25", fromlist=["bm25_oracle_sql"]
        ).bm25_oracle_sql("hash join customer", k=10),
        "token_quantiles": __import__(
            "knowledgegraphs_ray.text.quantiles",
            fromlist=["token_count_quantiles_oracle_sql"],
        ).token_count_quantiles_oracle_sql([0.25, 0.5, 0.75, 0.9, 0.99]),
        "lm_perplexity": __import__(
            "knowledgegraphs_ray.text.lm", fromlist=["perplexity_oracle_sql"]
        ).perplexity_oracle_sql(),
        "dup_window_stats": __import__(
            "knowledgegraphs_ray.dedup.spans",
            fromlist=["duplicated_window_stats_oracle_sql"],
        ).duplicated_window_stats_oracle_sql(w=8),
        "dsir_weights": __import__(
            "knowledgegraphs_ray.text.dsir", fromlist=["dsir_oracle_sql"]
        ).dsir_oracle_sql(),
        "semantic_dedup": __import__(
            "knowledgegraphs_ray.sim.semdedup",
            fromlist=["semantic_dedup_oracle_sql"],
        ).semantic_dedup_oracle_sql(threshold=0.4),
        "c4_clean": __import__(
            "knowledgegraphs_ray.text.c4", fromlist=["c4_oracle_sql"]
        ).c4_oracle_sql(
            table=(
                "(SELECT doc_id, coalesce(text, '') || ' end.' || chr(10) || "
                "'too short' || chr(10) || coalesce(text, '') || ' tail?' || "
                "chr(10) || 'Lines with javascript get dropped.' || chr(10) || "
                "CASE WHEN doc_id % 7 = 0 THEN 'brace { line' "
                "WHEN doc_id % 11 = 0 THEN 'has lorem ipsum inside.' "
                "ELSE 'Another good line here!' END AS text FROM documents) c4in"
            )
        ),
        "mixture_budget": __import__(
            "knowledgegraphs_ray.pipelines.training_data",
            fromlist=["mixture_budget_oracle_sql"],
        ).mixture_budget_oracle_sql(
            budgets=MIXTURE_BUDGETS, default_budget=500, seed=7
        ),
        "chunk_sequences": __import__(
            "knowledgegraphs_ray.pipelines.training_data",
            fromlist=["chunk_sequences_oracle_sql"],
        ).chunk_sequences_oracle_sql(chunk_size=40, stride=30),
        "top_docs_per_lang": __import__(
            "knowledgegraphs_ray.util.topk", fromlist=["topk_per_group_oracle_sql"]
        ).topk_per_group_oracle_sql(
            key_cols=["lang"],
            score_expr=(
                "CAST(len(regexp_extract_all(text, '"
                + __import__(
                    "knowledgegraphs_ray.text.analysis", fromlist=["TOKEN_RE"]
                ).TOKEN_RE
                + "')) AS BIGINT)"
            ),
            id_col="doc_id",
            k=5,
            table="(SELECT * FROM documents WHERE text IS NOT NULL) d",
        ),
        "customers_without_orders": (
            "SELECT c_custkey, c_nationkey FROM customer c "
            "WHERE NOT EXISTS (SELECT 1 FROM orders o "
            "WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')"
        ),
    }


def _decontam_sql() -> str:
    from knowledgegraphs_ray.text.decontam import decontam_oracle_sql

    return decontam_oracle_sql(n=4, bench_mod=20)


def _gopher_sql() -> str:
    from knowledgegraphs_ray.text.gopher import gopher_oracle_sql

    return gopher_oracle_sql()


def _corpus_shuffle_sql() -> str:
    from knowledgegraphs_ray.pipelines.training_data import seeded_shuffle_oracle_sql

    return seeded_shuffle_oracle_sql(seed=42)


def _simhash_sql(*, max_distance: int = 3) -> str:
    """Pure-SQL 64-bit SimHash twin of dedup.simhash with hash_fn='md5':
    per-token hash = first 8 md5 bytes; each token votes ±1 per bit; the
    fingerprint bit is sign(sum); pairs = Hamming distance <= max_distance
    (banding is pigeonhole-complete, so the brute-force SQL is exact)."""
    return f"""
WITH tok AS (
  SELECT doc_id, ('0x' || substr(md5(t), 1, 16))::UBIGINT AS h
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS t
        FROM documents)
), bits AS (
  SELECT doc_id, b.b AS b,
         SUM(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM tok, (SELECT unnest(range(64)) AS b) b
  GROUP BY doc_id, b.b
), fp AS (
  SELECT d.doc_id,
         coalesce(SUM(CASE WHEN s > 0 THEN (1::HUGEINT << b) ELSE 0 END), 0)::UBIGINT AS f
  FROM documents d LEFT JOIN bits ON d.doc_id = bits.doc_id
  GROUP BY d.doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.f, b.f)) AS BIGINT) AS distance
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.f, b.f)) <= {max_distance}
"""


def _discovered_fks_sql() -> str:
    """Oracle twin of q_discovered_fks: the SAME name-gated candidate pairs
    (shared helper), each emitting its edge row iff containment holds in SQL
    (no non-null dangling source value) and the source table is non-empty."""
    from knowledgegraphs_ray.schema.keys import fk_candidate_pairs

    g = tpch_schema(STAR_TABLES)
    cols_by_table = {t: list(g[t].columns) for t in STAR_TABLES}
    keys = {t: list(g[t].pks) for t in STAR_TABLES if len(g[t].pks) == 1}
    selects = []
    for tname, col, ref, rk in fk_candidate_pairs(cols_by_table, keys):
        selects.append(
            f"SELECT '{tname}' AS src_table, '{col}' AS src_column, "
            f"'{ref}' AS ref_table, '{rk}' AS ref_column "
            f"WHERE NOT EXISTS (SELECT 1 FROM {tname} s LEFT JOIN {ref} r "
            f"ON s.{col} = r.{rk} WHERE s.{col} IS NOT NULL AND r.{rk} IS NULL) "
            f"AND EXISTS (SELECT 1 FROM {tname})"
        )
    return " UNION ALL ".join(selects)


def _pii_schema_sql() -> str:
    """Literal expected-table oracle for the schema-derived PII scan: the
    output is a pure function of the DECLARED schema (no data), so the
    expected rows are inlined as VALUES — the driver then verifies
    determinism, column naming and value serialization end to end."""
    df = q_pii_schema("")  # schema-only; sf_dir unused
    rows = ", ".join(
        "('%s', '%s', %s, %s, %s)"
        % (
            r["element"],
            r["dpv_matches"],
            "TRUE" if r["is_personal_data"] else "FALSE",
            "TRUE" if r["is_identifying"] else "FALSE",
            "TRUE" if r["is_special_category"] else "FALSE",
        )
        for r in df.to_dict("records")
    )
    return (
        "SELECT * FROM (VALUES "
        + rows
        + ") AS t(element, dpv_matches, is_personal_data, is_identifying, is_special_category)"
    )


def _bridge_sql() -> str:
    """Oracle twin of q_kg_triples_bridge — generated from the SAME compiled
    plans, with the virtual tables expressed as DuckDB subqueries."""
    from knowledgegraphs_ray.schema.model import bridge_schema

    g = bridge_schema()
    rules = compile_rules(g)
    op_sql = sqlgen.triples_sql(
        rules.plans["orderpart"],
        g["orderpart"].columns,
        from_clause="(SELECT l_orderkey, l_partkey, l_quantity FROM lineitem)",
    )
    ns_sql = sqlgen.triples_sql(
        rules.plans["nation_sibling"],
        g["nation_sibling"].columns,
        from_clause=(
            "(SELECT n_nationkey, n_name, (n_nationkey + 1) % 25 AS sibling_key "
            "FROM nation)"
        ),
    )
    return op_sql + "\nUNION ALL\n" + ns_sql


def _mention_forms() -> dict[str, str]:
    return lp.single_token_class_labels(lp.star_ontology_index())


def _mentions_sql(forms: list[str] | None = None) -> str:
    forms = forms or sorted(_mention_forms())
    inlist = ", ".join(f"'{f}'" for f in forms)
    return (
        "SELECT doc_id, tok AS mention, count(*) AS n_occurrences FROM ("
        "SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS tok "
        "FROM documents) WHERE tok IN (" + inlist + ") GROUP BY doc_id, tok"
    )


def _link_exact_sql() -> str:
    label2iri = _mention_forms()
    vals = ", ".join(f"('{l}', '{i}')" for l, i in sorted(label2iri.items()))
    return (
        "WITH m AS (" + _mentions_sql() + "), v(label, iri) AS (VALUES " + vals + ") "
        "SELECT m.doc_id, m.mention, m.n_occurrences, v.iri AS entity_iri "
        "FROM m JOIN v ON m.mention = v.label"
    )


def _canonical_mentions_sql() -> str:
    # The near-dup grouping of the FIXED surface-form dictionary is a
    # compile-time artifact (like the rule table): compute it driver-side with
    # the same union-find kernel, inline the mapping; which mentions actually
    # occur stays data-driven in SQL.
    from knowledgegraphs_ray.canon.canonicalize import _near_dup_groups
    from knowledgegraphs_ray.linking.mentions import normalize_label

    forms = sorted(set(_mention_forms()) | {"order"})
    rep = _near_dup_groups(forms, 0.75)
    vals = ", ".join(
        f"('{m}', '{c}', 'kg:entity/{normalize_label(c).replace(' ', '_')}')"
        for m, c in sorted(rep.items())
    )
    return (
        "WITH m AS (" + _mentions_sql(forms) + "), "
        "v(mention, canonical, canonical_iri) AS (VALUES " + vals + ") "
        "SELECT DISTINCT m.mention, v.canonical, v.canonical_iri "
        "FROM m JOIN v ON m.mention = v.mention"
    )
