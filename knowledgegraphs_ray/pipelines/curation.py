"""End-to-end training-corpus curation: the composed LLM-data pipeline.

    read documents -> quality filter (vectorized Arrow kernels)
                   -> [optional: Gopher rule filter, benchmark decontamination]
                   -> exact dedup (hash-shuffle, payload-preserving)
                   -> near-dup resolve (minhash -> components -> survivor)
                   -> mixture sample (per-language rates, exact integer
                      thresholds -> deterministic at any parallelism)
                   -> sequence packing (best-fit-decreasing per block)
                   -> partitioned Parquet + per-stage manifests

Every stage is a ``state/checkpoint.py`` checkpoint: a killed run resumes
from the last published stage (atomic rename publish), and the manifest
chain doubles as per-partition lineage + metrics — the same
resume/lineage contract as the flagship KG job (north_rule).

Scale notes: the filter is map-only Arrow; exact dedup shuffles one
representative row per distinct text per block (combine-before-shuffle);
near-dup resolution shuffles sketches, never text (see dedup/minhash.py)
and drops losers with a broadcast set or hash anti-join (dedup/resolve.py);
sampling and packing are map-only. The corpus text is shuffled exactly once
(the exact-dedup exchange) across the whole pipeline.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from knowledgegraphs_ray.pipelines.training_data import TOKEN_RE


def quality_filter(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    lang_col: str = "lang",
    langs: list[str] | None = None,
    min_tokens: int = 20,
    max_punct_ratio: float = 0.2,
) -> ray.data.Dataset:
    """Map-only Arrow quality gate; appends ``n_tokens``. Unlike
    ``clean_corpus`` (its single-language oracle twin), this keeps every
    payload column and accepts a language allow-list."""

    def filt(batch: pa.Table) -> pa.Table:
        text = batch[text_col].combine_chunks()
        keep = pc.is_valid(text)
        if langs is not None:
            keep = pc.and_(
                keep,
                pc.is_in(
                    batch[lang_col].combine_chunks(),
                    value_set=pa.array(langs, type=pa.string()),
                ),
            )
        n_tok = pc.count_substring_regex(text, TOKEN_RE)
        keep = pc.and_(keep, pc.greater_equal(n_tok, min_tokens))
        n_chars = pc.cast(pc.utf8_length(text), pa.float64())
        n_punct = pc.cast(pc.count_substring_regex(text, "[.,;:!?]"), pa.float64())
        ratio = pc.if_else(
            pc.greater(n_chars, 0.0), pc.divide(n_punct, n_chars), pa.scalar(0.0)
        )
        keep = pc.and_(keep, pc.less_equal(ratio, max_punct_ratio))
        out = batch.filter(keep)
        return out.append_column(
            "n_tokens",
            pc.cast(
                pc.count_substring_regex(out[text_col].combine_chunks(), TOKEN_RE),
                pa.int64(),
            ),
        )

    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)


def dedup_exact_rows(
    ds: ray.data.Dataset,
    *,
    column: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Exact dedup that keeps EVERY payload column of the surviving (min-id)
    row, plus ``n_copies``. Same shape as ``dedup/exact.py:dedup_exact``
    (combine per block, shuffle the 8-byte content hash, re-verify exact
    equality inside each hash group) — extended to carry the whole row."""
    from knowledgegraphs_ray.dedup.exact import add_content_hash

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            out = df.copy()
            if "n_copies" not in out.columns:
                out["n_copies"] = pd.Series([], dtype="int64")
            return out
        if "n_copies" not in df.columns:
            df = df.assign(n_copies=pd.Series(1, index=df.index, dtype="int64"))
        df = df.sort_values(id_col, kind="mergesort")
        gb = df.groupby(column, as_index=False, sort=False)
        first = gb.head(1)  # min-id row per distinct value, all columns
        counts = gb["n_copies"].sum().rename(columns={"n_copies": "__n"})
        first = first.merge(counts, on=column)
        first["n_copies"] = first.pop("__n").astype("int64")
        return first

    def add_bucket(t: pa.Table) -> pa.Table:
        # group by a BOUNDED bucket of the content hash, not the hash
        # itself: groupby().map_groups pays ~1ms of Python per group, which
        # is 15+ minutes at 1M distinct texts (measured on the curation
        # soak). combine() is already vectorized across distinct values
        # inside a group, so 256 buckets give the same result with 256
        # group calls; all copies of a text still co-locate (same hash ->
        # same bucket).
        import pyarrow.compute as pc

        h = add_content_hash(t, column=column)["content_hash"]
        return t.append_column(
            "__bucket",
            pc.cast(pc.bit_wise_and(h, pa.scalar(255, pa.uint64())), pa.int64()),
        )

    hashed = ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
    parts = hashed.map_batches(combine, batch_format="pandas")
    out = parts.groupby("__bucket").map_groups(combine, batch_format="pandas")
    return out.drop_columns(["__bucket"])


def _keep_ids(corpus: ray.data.Dataset, ids: ray.data.Dataset) -> ray.data.Dataset:
    """Corpus rows whose doc_id is in the (selection-sized) id set —
    broadcast semi-join below 2M ids, hash join above."""
    from knowledgegraphs_ray.extract.joins import broadcast_join, native_join

    ids = ids.materialize()
    if ids.count() <= 2_000_000:
        return broadcast_join(corpus, ids, left_on="doc_id", right_on="doc_id",
                              how="inner")
    return native_join(corpus, ids, left_on="doc_id", right_on="doc_id",
                       how="inner")


def curate_run(
    root: str,
    ingest,
    *,
    langs: list[str] | None = None,
    min_tokens: int = 20,
    rates: dict[str, float] | None = None,
    default_rate: float = 1.0,
    minhash_threshold: float = 0.8,
    pack_budget: int = 2048,
    gopher_rules: bool = False,
    benchmark=None,
    decontam_n: int = 8,
    paragraph_min_count: int | None = None,
    span_dedup_w: int | None = None,
    ppl_keep_quantile: float | None = None,
    semantic_threshold: float | None = None,
    embeddings=None,
    dsir_top_k: int | None = None,
    dsir_target=None,
    classifier_min_micro: int | None = None,
    weighted_k: int | None = None,
    sample_hash_fn: str = "splitmix",
) -> "CheckpointedPipeline":
    """Run (or resume) the curation chain under ``root``.

    ``ingest``: zero-arg callable -> documents Dataset with at least
    (doc_id:int64, text:string, lang:string).

    Optional hygiene stages: ``gopher_rules=True`` inserts the Gopher
    quality-rule filter (text/gopher.py) after the basic quality gate;
    ``benchmark`` (zero-arg callable -> Dataset with text) inserts
    ``decontaminate(remove=True)`` so eval-overlapping docs never reach
    dedup; ``span_dedup_w`` cuts corpus-duplicated w-token spans
    (dedup/spans.py, Lee et al. order: after boilerplate removal, before
    the quality gate re-counts tokens); ``ppl_keep_quantile`` keeps the
    least-perplexed fraction by a corpus-trained unigram LM (text/lm.py,
    CCNet head selection) after the rule-based gates;
    ``semantic_threshold`` + ``embeddings`` (zero-arg callable ->
    (doc_id, embedding) Dataset) inserts SemDeDup after the lexical
    near-dedup; ``dsir_top_k`` + ``dsir_target`` (zero-arg callable ->
    target-domain docs) keeps only the top-k most target-like survivors
    (text/dsir.py) before mixture sampling; ``classifier_min_micro``
    inserts the trained-model quality gate (text/classifier.py, frozen
    distributed-LR weights) after the rule gates; ``weighted_k`` caps the
    final corpus with a length-weighted Efraimidis-Spirakis sample before
    packing. Stage names are stable, so a resume with the same flags skips
    finished stages as usual.
    """
    from knowledgegraphs_ray.dedup.minhash import (
        components_from_pairs,
        minhash_candidate_pairs,
    )
    from knowledgegraphs_ray.dedup.resolve import resolve_duplicates
    from knowledgegraphs_ray.pipelines.training_data import (
        pack_sequences,
        stratified_sample,
    )
    from knowledgegraphs_ray.state.checkpoint import CheckpointedPipeline

    p = CheckpointedPipeline(root)

    source = ingest
    if paragraph_min_count is not None:
        from knowledgegraphs_ray.dedup.paragraphs import dedup_paragraphs

        # boilerplate removal FIRST (Dolma order), so the quality gate's
        # token counts are computed on the residual text
        p.stage(
            "para_dedup",
            lambda: dedup_paragraphs(
                ingest(), min_count=paragraph_min_count
            ).drop_columns(["n_removed"]),
        )
        source = lambda: p.dataset("para_dedup")

    if span_dedup_w is not None:
        from knowledgegraphs_ray.dedup.spans import remove_duplicated_spans

        span_src = source
        p.stage(
            "span_dedup",
            lambda: remove_duplicated_spans(
                span_src(), w=span_dedup_w
            ).drop_columns(["n_removed_tokens"]),
        )
        source = lambda: p.dataset("span_dedup")

    p.stage(
        "filtered",
        lambda: quality_filter(
            source(), langs=langs, min_tokens=min_tokens
        ),
    )
    pre_dedup = "filtered"
    if ppl_keep_quantile is not None:
        from knowledgegraphs_ray.text.lm import perplexity_filter

        ppl_src = pre_dedup
        p.stage(
            "ppl_filtered",
            lambda: perplexity_filter(
                p.dataset(ppl_src), keep_quantile=ppl_keep_quantile
            ).drop_columns(["ppl"]),
        )
        pre_dedup = "ppl_filtered"
    if gopher_rules:
        from knowledgegraphs_ray.text.gopher import gopher_filter

        src = pre_dedup
        p.stage("gopher", lambda: gopher_filter(p.dataset(src)))
        pre_dedup = "gopher"
    if classifier_min_micro is not None:
        # model-based quality gate AFTER the rule gates (the GPT-3/LLaMA
        # wiki-vs-crawl classifier placement): map-only scoring with the
        # frozen distributed-LR weights, keep score_micro >= threshold
        from knowledgegraphs_ray.text import classifier as _qc

        clf_src = pre_dedup

        def _clf_gate(src_name=clf_src, thr=classifier_min_micro):
            import pyarrow.compute as _pc

            def gate(b):
                scored = _qc.score(b)
                return b.filter(
                    _pc.greater_equal(scored["score_micro"], thr)
                )

            return p.dataset(src_name).map_batches(
                gate, batch_format="pyarrow", zero_copy_batch=True
            )

        p.stage("clf_filtered", _clf_gate)
        pre_dedup = "clf_filtered"
    if benchmark is not None:
        from knowledgegraphs_ray.text.decontam import decontaminate

        src2 = pre_dedup
        p.stage(
            "decontaminated",
            lambda: decontaminate(
                p.dataset(src2), benchmark(), n=decontam_n, remove=True
            ).drop_columns(["n_contaminated", "contaminated"]),
        )
        pre_dedup = "decontaminated"
    p.stage(
        "exact_dedup",
        lambda: dedup_exact_rows(p.dataset(pre_dedup)),
    )

    def near_dedup() -> ray.data.Dataset:
        corpus = p.dataset("exact_dedup")
        pairs = minhash_candidate_pairs(
            p.dataset("exact_dedup", columns=["doc_id", "text"]),
            threshold=minhash_threshold,
        )
        comp = components_from_pairs(pairs)
        return resolve_duplicates(corpus, comp, keep="longest")

    p.stage("near_dedup", near_dedup)
    pre_sample = "near_dedup"
    if semantic_threshold is not None and embeddings is not None:
        # SemDeDup after lexical dedup (the paper's placement: semantic
        # near-dups survive MinHash because their TOKENS differ). Docs
        # absent from the embeddings table cannot lose and are kept.
        from knowledgegraphs_ray.sim.semdedup import semantic_pairs

        sem_src = pre_sample
        p.stage(
            "sem_dedup",
            lambda: resolve_duplicates(
                p.dataset(sem_src),
                components_from_pairs(
                    semantic_pairs(
                        embeddings(), threshold=semantic_threshold,
                        id_col="doc_id",
                    ).materialize()
                ),
                keep="min_id",
            ),
        )
        pre_sample = "sem_dedup"
    if dsir_top_k is not None and dsir_target is not None:
        # DSIR last of the content gates: select the top-k most
        # target-like survivors before mixture sampling
        from knowledgegraphs_ray.text.dsir import dsir_select

        dsir_src = pre_sample
        p.stage(
            "dsir_selected",
            lambda: _keep_ids(
                p.dataset(dsir_src),
                dsir_select(
                    p.dataset(dsir_src, columns=["doc_id", "text"]),
                    dsir_target(),
                    dsir_top_k,
                ).select_columns(["doc_id"]),
            ),
        )
        pre_sample = "dsir_selected"
    p.stage(
        "sampled",
        lambda: stratified_sample(
            p.dataset(pre_sample),
            rates=rates or {},
            default_rate=default_rate,
            # "splitmix" = the vectorized 100-TB tier; "md5" = the
            # SQL-twinnable tier the curation_chain oracle gate runs
            hash_fn=sample_hash_fn,
        ),
    )
    pre_pack = "sampled"
    if weighted_k is not None:
        # final size cap as a length-weighted sample without replacement
        # (Efraimidis-Spirakis): longer docs proportionally likelier to
        # survive, selection a pure function of (seed, ids, weights)
        from knowledgegraphs_ray.pipelines.training_data import weighted_sample

        wk_src = pre_pack
        p.stage(
            "weighted",
            lambda: weighted_sample(
                p.dataset(wk_src), k=weighted_k, weight_col="n_tokens"
            ),
        )
        pre_pack = "weighted"
    p.stage(
        "packed",
        lambda: pack_sequences(
            p.dataset(pre_pack, columns=["doc_id", "n_tokens"]),
            budget=pack_budget,
        ),
    )
    return p


def curation_oracle_sql(
    *,
    min_tokens: int = 20,
    max_punct_ratio: float = 0.2,
    minhash_threshold: float = 0.7,
    rates: dict[str, float] | None = None,
    default_rate: float = 0.1,
) -> str:
    """DuckDB twin of the core curate_run chain (quality filter -> exact
    dedup -> minhash near-dup resolve -> md5 stratified sample), composed
    from the per-stage oracle generators so every stage's semantics are the
    already-verified ones — the chain gate checks the COMPOSITION."""
    from knowledgegraphs_ray.dedup.minhash import minhash_components_oracle_sql
    from knowledgegraphs_ray.dedup.resolve import resolve_oracle_sql
    from knowledgegraphs_ray.pipelines.training_data import (
        TOKEN_RE,
        stratified_sample_oracle_sql,
    )

    comp = minhash_components_oracle_sql(threshold=minhash_threshold, table="dd")
    res = resolve_oracle_sql(
        comp,
        keep="longest",
        table="dd",
        out_cols="doc_id, lang, n_tokens, n_copies",
    )
    sample = stratified_sample_oracle_sql(
        rates=rates or {},
        default_rate=default_rate,
        table="res",
        out_cols="doc_id, lang, n_tokens, n_copies",
    )
    return f"""
WITH f AS (
  SELECT doc_id, text, lang,
         CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS BIGINT) AS n_tokens
  FROM documents
  WHERE text IS NOT NULL
    AND len(regexp_extract_all(text, '{TOKEN_RE}')) >= {min_tokens}
    AND (CASE WHEN length(text) > 0
         THEN len(regexp_extract_all(text, '[.,;:!?]')) / CAST(length(text) AS DOUBLE)
         ELSE 0.0 END) <= {max_punct_ratio}
),
dd AS (
  SELECT doc_id, text, lang, n_tokens, n_copies FROM (
    SELECT f.*,
           row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn,
           count(*) OVER (PARTITION BY text) AS n_copies
    FROM f
  ) WHERE rn = 1
),
res AS ({res})
{sample}
"""


def synth_documents(
    n_docs: int, *, seed: int = 42, parallelism: int = 64
) -> ray.data.Dataset:
    """Deterministic synthetic documents table (doc_id, text, lang, source)
    for curation soaks: Zipf-ish lengths over a 48-word vocabulary, an exact
    duplicate every 7th doc (copies its predecessor) and a near-duplicate
    every 13th (predecessor + one extra token), 4 languages. Counter-based
    splitmix64 hashing — identical output at any parallelism, no Python
    loop per doc (same construction as ``transcripts.synth_transcripts``)."""
    import numpy as np
    import polars as pl

    from knowledgegraphs_ray.pipelines.transcripts import _splitmix64

    vocab = np.array(
        [f"w{i:02d}" for i in range(40)]
        + ["alpha", "beta", "gamma", "delta", "omega", "sigma", "kappa", "theta"]
    )
    langs = np.array(["en", "de", "es", "fr"])
    base = np.uint64(seed)

    def h(counter: np.ndarray, stream: int) -> np.ndarray:
        with np.errstate(over="ignore"):
            return _splitmix64(
                counter * np.uint64(0x100000001B3)
                + base * np.uint64(0x9E3779B1)
                + np.uint64(stream)
            )

    def gen(batch) -> "pa.Table":
        ids = batch["id"].astype(np.int64)
        u = ids.astype(np.uint64)

        # every 7th doc re-generates its predecessor's content (exact dup);
        # every 13th appends one token to its predecessor's (near dup) —
        # but only when the predecessor is NOT itself remapped, so the
        # dup invariants hold exactly (a remapped predecessor's final text
        # is not its own generator output)
        def remapped(i: np.ndarray) -> np.ndarray:
            e = (i % 7 == 1) & (i > 0)
            return e | ((i % 13 == 2) & (i > 0) & ~e)

        prev_clean = ~remapped(ids - 1)
        exact = (ids % 7 == 1) & (ids > 0) & prev_clean
        near = (ids % 13 == 2) & (ids > 0) & ~(ids % 7 == 1) & prev_clean
        eff = np.where(exact | near, u - np.uint64(1), u)

        n_tok = (10 + (h(eff, 1) % np.uint64(111))).astype(np.int64)
        total = int(n_tok.sum())
        doc_rep = np.repeat(eff, n_tok)
        pos = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(n_tok)[:-1]]), n_tok
        )
        with np.errstate(over="ignore"):
            widx = h(doc_rep * np.uint64(131) + pos.astype(np.uint64), 2)
        words = vocab[(widx % np.uint64(len(vocab))).astype(np.int64)]
        df = pl.DataFrame(
            {"doc_id": np.repeat(ids, n_tok), "w": words}
        )
        texts = (
            df.group_by("doc_id", maintain_order=True)
            .agg(pl.col("w").str.join(" ").alias("text"))
        )
        near_mark = pl.DataFrame(
            {"doc_id": ids, "near": near, "lang_i": (h(eff, 3) % np.uint64(4)).astype(np.int64)}
        )
        out = texts.join(near_mark, on="doc_id", how="left").with_columns(
            pl.when(pl.col("near"))
            .then(pl.col("text") + " extra")
            .otherwise(pl.col("text"))
            .alias("text")
        )
        return (
            out.with_columns(
                pl.Series("lang", langs[out["lang_i"].to_numpy()]),
                (pl.lit("synth/") + (pl.col("doc_id") % 16).cast(pl.String)).alias(
                    "source"
                ),
            )
            .select(["doc_id", "text", "lang", "source"])
            .to_arrow()
        )

    return ray.data.range(n_docs, override_num_blocks=parallelism).map_batches(
        gen, batch_format="numpy", batch_size=64 * 1024, zero_copy_batch=True
    )
