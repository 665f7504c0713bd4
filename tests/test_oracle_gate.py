"""In-pytest oracle gate (north_rule: triple P/R verified via
`python -m pytest -x -q`): a fast representative subset of the catalog runs
against its DuckDB oracle at sf0.001 — exact rows+schema+values match, which
implies P = R = 1.0 ≥ 0.95 for the triple sets."""

import duckdb
import pandas as pd
import pytest

from knowledgegraphs_ray.pipelines import catalog

SUBSET = [
    "kg_triples_customer",  # relational triple kernel
    "kg_transcripts",       # transcript flagship kernel (ordering + triples)
    "kg_attr_classes_customer",  # attribute-class mode
    "json_triples_events",  # JSON kernel
    "text_quality",         # text analysis
    "pricing_summary",      # aggregation pushdown
    "canonical_mentions",   # union-find canonicalization
    "minhash_dedup_pairs",  # full seeded-sketch SQL oracle (r3)
    "minhash_components",   # recursive-CTE connected components (r3)
    "link_scored_documents",  # vocabulary-derived literal oracle (r3)
    "decontaminated_docs",  # benchmark n-gram decontamination (r3)
    "gopher_quality",       # Gopher rule signals, bit-exact ratios (r3)
    "corpus_shuffle",       # deterministic seeded shuffle rank (r3)
    "paragraph_dedup",      # boilerplate-paragraph removal (r3)
    "frequent_tokens",      # exact heavy hitters (r3)
    "bm25_topk",            # lexical retrieval, bit-exact scores (r3)
    "token_quantiles",      # histogram-partial quantile_disc (r3)
    "lm_perplexity",        # unigram-LM ppl, integer micro-nat sums (r3)
    "dup_window_stats",     # duplicated n-gram windows, Lee et al. (r3)
    "dsir_weights",         # DSIR importance weights, integer log ratios (r3)
    "semantic_dedup",       # SemDeDup exact tier, recursive-CTE components (r3)
    "c4_clean",             # C4 line-level cleaning, list_filter oracle (r3)
    "kg_pagerank",          # integer fixed-point PageRank, unrolled CTEs (r3)
    "kg_components",        # link-graph connected components, recursive CTE (r3)
    "mixture_budget",       # token-budget source mixing, window-cumsum twin (r3)
    "chunk_sequences",      # stride chunking, generate_series twin (r3)
    "top_docs_per_lang",    # per-group top-k, row_number window twin (r3)
    "customers_without_orders",  # distributed left_anti join, NOT EXISTS twin (r3)
    "quality_classifier",   # trained LR quality filter, micro-weight twin (r3)
    "weighted_sample",      # Efraimidis-Spirakis weighted sample, ES-key twin (r3)
    "corpus_diff",          # snapshot delta, full-outer md5 twin (r3)
    "embedding_clusters",   # frozen distributed-Lloyd assignment twin (r3)
    "lm_bigram_ppl",        # interpolated bigram LM, micro-nat twin (r3)
    "chat_pairs",           # SFT pair extraction, lead() window twin (r3)
    "ann_ivf_pq_topk",      # full IVF-PQ path, exact by construction (r3)
    "rolling_events",       # sliding ROWS+RANGE frames, window twin (r4)
    "spend_outliers",       # integer z-score inequality, HUGEINT twin (r4)
    "simhash_pairs",        # truncation-safe band exchange tier (r4)
    "embedding_near_dups",  # embedding-LSH pairs, exchange tier (r4)
    "dedup_resolved_corpus",  # displaced from the driver first-50 (r4s3)
    "tool_transitions",     # tool-call Markov counts, lead() twin (r4s3)
    "conv_stats",           # per-conversation shape stats, CASE twin (r4s3)
    "kg_bfs_depths",        # multi-source BFS, depth-capped CTE twin (r4s3)
    "link_prediction",      # CN + micro-AA wedge scores, self-join twin (r4s3)
    "conv_fingerprints",    # ordered string_agg md5, conv-dedup key (r4s3)
    "orders_rollup",        # GROUPING SETS multi-grain, GROUPING() twin (r4s4)
    "pmi_collocations",     # PMI micro-nats over co-occurrence counts (r4s4)
    "dq_orders",            # declarative DQ rules, UNION ALL twin (r4s4)
    "setjoin_pairs",        # exact PPJoin-style set-similarity join (r4s4)
    "repeated_spans",       # char-window dup span inventory, islands twin (r4s5)
    "snm_candidate_pairs",  # sorted-neighborhood blocking, rank-gap twin (r4s5)
    "user_event_pivot",     # long->wide pivot, SUM(CASE) twin (r4s5)
    "er_canonical_ids",     # SNM->verify->components ER chain twin (r4s5)
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(name, sf_dir, duck):
    import pyarrow as pa
    import ray.data

    res = catalog.queries()[name](sf_dir)
    if isinstance(res, ray.data.Dataset):
        mine = res.to_pandas()
    elif isinstance(res, pa.Table):
        mine = res.to_pandas()
    else:
        mine = res
    gold = duck.execute(catalog.oracle_sql()[name]).fetchdf()
    mine, gold = _canon(mine), _canon(gold)
    assert list(mine.columns) == list(gold.columns)
    assert len(mine) == len(gold)
    for c in mine.columns:
        assert mine[c].equals(gold[c]), f"column {c} mismatch"


def test_triple_precision_recall_exact(sf_dir, duck):
    """Explicit P/R statement for the flagship transcript triple set."""
    mine = catalog.queries()["kg_transcripts"](sf_dir).to_pandas()
    gold = duck.execute(catalog.oracle_sql()["kg_transcripts"]).fetchdf()
    m = set(map(tuple, mine[["subj", "pred", "obj"]].itertuples(index=False)))
    g = set(map(tuple, gold[["subj", "pred", "obj"]].itertuples(index=False)))
    precision = len(m & g) / len(m)
    recall = len(m & g) / len(g)
    assert precision >= 0.95 and recall >= 0.95
    assert precision == 1.0 and recall == 1.0  # exact, in fact
