"""Flagship checkpointed KG-construction run over transcripts.

The end-to-end composition the north_star describes, with every stage
checkpointed to partitioned Parquet + lineage manifest (resumable):

    ingest      transcripts (events-derived or synthetic or user Parquet)
    triples     per-turn ontology triples (map-only kernel)
    mentions    dictionary mentions from turn text (map-only)
    links       IDF candidates -> surrogate scorer pool -> selection
    canonical   union-find canonicalization of mentions
    edges       triples ∪ mention->entity links, Parquet + N-Triples shards
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from knowledgegraphs_ray.canon.canonicalize import canonicalize_mentions
from knowledgegraphs_ray.linking.index import AnnotationIndex, generate_candidates
from knowledgegraphs_ray.linking.mentions import extract_mentions
from knowledgegraphs_ray.linking.scorer import score_candidates
from knowledgegraphs_ray.linking.select import select_links
from knowledgegraphs_ray.pipelines.linking_pipeline import (
    single_token_class_labels,
    star_ontology_index,
)
from knowledgegraphs_ray.pipelines.transcripts import (
    extract_transcript_triples,
    transcripts_from_events,
)
from knowledgegraphs_ray.state.checkpoint import CheckpointedPipeline


def flagship_run(
    root: str,
    sf_dir: str | None = None,
    *,
    ingest=None,
    index: AnnotationIndex | None = None,
    write_nt: bool = True,
    kernel_version: str = "1",
    config=None,
) -> CheckpointedPipeline:
    """Run (or resume) the full transcript KG construction under ``root``.

    ``ingest``: zero-arg builder returning the transcript Dataset; defaults
    to the events-derived transcripts of ``sf_dir``. Pass e.g.
    ``lambda: synth_transcripts(50_000)`` for the synthetic corpus whose text
    embeds entity mentions (FIXTURES.md F1).

    ``config``: optional ``PipelineConfig`` — thresholds, candidate counts,
    scorer concurrency/batch, and the ``scorer_cls`` model plug flow into the
    linking stage (the reference's per-use-case config surface, §2.14)."""
    from knowledgegraphs_ray.config import PipelineConfig

    cfg = config or PipelineConfig()
    idx = index or star_ontology_index()
    forms = set(single_token_class_labels(idx))
    p = CheckpointedPipeline(root)

    ingest_is_sorted = ingest is None  # events-derived path: segrank-sorted
    if ingest is None:
        assert sf_dir is not None, "need sf_dir or an ingest builder"
        ingest = lambda: transcripts_from_events(sf_dir)
    p.stage("ingest", ingest, kernel_version=kernel_version)
    p.stage(
        "triples",
        lambda: extract_transcript_triples(p.dataset("ingest")),
        kernel_version=kernel_version,
    )

    def build_mentions():
        turns = p.dataset("ingest", columns=["conv_id", "turn_idx", "text"])
        with_iri = turns.map_batches(_add_turn_iri, batch_format="pyarrow")
        return extract_mentions(with_iri, forms, id_col="turn_iri")

    p.stage("mentions", build_mentions, kernel_version=kernel_version)

    def build_links():
        if cfg.context_window is not None:
            # X2 wired in: ±k-turn context blended into the candidate score;
            # selection then runs per (mention, context) via the standard
            # cascade (linking_pipeline.link_transcripts_with_context)
            from knowledgegraphs_ray.pipelines.linking_pipeline import (
                link_transcripts_with_context,
            )

            sel = link_transcripts_with_context(
                p.dataset("ingest"),
                index=idx,
                window=cfg.context_window,
                ctx_weight=cfg.context_weight,
                concurrency=cfg.scorer_concurrency,
                # the default events-derived ingest was written already
                # sorted by (conv_id, turn_idx) (segrank) and parquet reads
                # preserve file/row order — skip the second sort; custom
                # ingest builders (arbitrary order) keep it
                assume_sorted=ingest_is_sorted,
            )
            cols = [c for c in ("mention", "cand_iri", "bes", "pj") if c in (sel.schema().names or [])]
            return sel.select_columns(cols) if cols else sel

        mentions = p.dataset("mentions")
        schema = mentions.schema()
        if schema is None or "mention" not in schema.names:
            # mention-free corpus (dictionary had no hits) — empty link table
            import pandas as pd

            return ray.data.from_pandas(
                pd.DataFrame(
                    {
                        "mention": pd.Series([], dtype=str),
                        "cand_iri": pd.Series([], dtype=str),
                        "bes": pd.Series([], dtype=float),
                        "pj": pd.Series([], dtype=float),
                    }
                )
            )
        # combine-before-shuffle: per-block value_counts -> tiny partial
        # rows -> fastagg merge (distributed fallback above driver_limit).
        # The native groupby here shuffled every mention OCCURRENCE (23.7M
        # rows on the 1M-conversation soak) to count a vocabulary-sized
        # distinct set.
        import pandas as pd

        from knowledgegraphs_ray.util.fastagg import sum_partials

        def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
            vc = df["mention"].value_counts()
            return pd.DataFrame(
                {"mention": vc.index, "n_srcs": vc.to_numpy().astype("int64")}
            )

        distinct = sum_partials(
            mentions.select_columns(["mention"]).map_batches(
                partial_counts, batch_format="pandas"
            ),
            keys=["mention"],
            sum_cols=["n_srcs"],
        )

        # X3/X5 wired in: abbreviated surface forms expand against the
        # dictionary before candidate generation (AAExpansion analogue);
        # selections map back to every original abbreviation afterwards
        inv_map: dict[str, list[str]] = {}
        if cfg.expand_abbreviations and cfg.abbrev_dictionary:
            import pandas as pd

            from knowledgegraphs_ray.linking.abbrev import expand_abbreviations

            exp = expand_abbreviations(distinct, cfg.abbrev_dictionary).to_pandas()
            fwd = (
                dict(zip(exp["abbrev"], exp["expansion"]))  # vocabulary-sized
                if not exp.empty and "abbrev" in exp.columns
                else {}
            )
            for a, e in fwd.items():
                inv_map.setdefault(e, []).append(a)

            def swap(df: pd.DataFrame) -> pd.DataFrame:
                df = df.copy()
                df["mention"] = df["mention"].map(lambda m: fwd.get(m, m))
                return df

            distinct = distinct.map_batches(swap, batch_format="pandas")

        if cfg.mapper == "exact":
            # ExactMapper path: label == mention, no scorer pool
            import pandas as pd

            label2iri = single_token_class_labels(idx)

            def exact_map(df: pd.DataFrame) -> pd.DataFrame:
                df = df[df["mention"].isin(label2iri)]
                return pd.DataFrame(
                    {
                        "mention": df["mention"],
                        "cand_iri": df["mention"].map(label2iri),
                        "bes": 1.0,
                        "pj": 1.0,
                    }
                )

            return _backmap_links(
                distinct.map_batches(exact_map, batch_format="pandas"), inv_map
            )

        cands = generate_candidates(distinct, idx, k=cfg.num_raw_candidates)
        if cfg.scorer_cls is not None:
            import ray as _ray

            scored = cands.map_batches(
                cfg.scorer_cls,
                fn_constructor_args=(_ray.put(idx),),
                batch_format="pyarrow",
                batch_size=cfg.scorer_batch_size,
                concurrency=cfg.scorer_concurrency,
                num_cpus=1,
            )
        else:
            scored = score_candidates(
                cands,
                idx,
                concurrency=cfg.scorer_concurrency,
                batch_size=cfg.scorer_batch_size,
            )
        sel = select_links(
            scored,
            mode="optimal",
            bes_hi=cfg.bes_hi,
            bes_lo=cfg.bes_lo,
            pj_hi=cfg.pj_hi,
        )
        return _backmap_links(sel, inv_map)

    p.stage("links", build_links, kernel_version=kernel_version)
    def build_canonical():
        mentions = p.dataset("mentions")
        schema = mentions.schema()
        if schema is None or "mention" not in schema.names:
            import pandas as pd

            return ray.data.from_pandas(
                pd.DataFrame(
                    {
                        "mention": pd.Series([], dtype=str),
                        "canonical": pd.Series([], dtype=str),
                        "canonical_iri": pd.Series([], dtype=str),
                    }
                )
            )
        return canonicalize_mentions(mentions.select_columns(["mention"]))

    p.stage("canonical", build_canonical, kernel_version=kernel_version)

    def build_edges():
        triples = p.dataset("triples")
        links = p.dataset("links").to_pandas()
        if links.empty or "mention" not in links.columns:
            return triples
        # broadcast dictionary as parallel Arrow arrays: lookup is a
        # vectorized index_in + take, no Python loop over rows
        link_keys = pa.array(list(links["mention"]), pa.string())
        link_vals = pa.array(list(links["cand_iri"]), pa.string())
        mentions = p.dataset("mentions")

        def mention_edges(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            from knowledgegraphs_ray.extract.kernel import TRIPLE_SCHEMA_ENC, _const_dict

            idx = pc.index_in(batch["mention"].combine_chunks(), value_set=link_keys)
            ent = pc.take(link_vals, idx)  # null where the mention has no link
            # dictionary pred matches the checkpointed triples' encoded schema
            # (parquet round-trips preserve TRIPLE_SCHEMA_ENC), so the union
            # below is type-consistent
            t = pa.table(
                {
                    "subj": batch["turn_iri"].combine_chunks(),
                    "pred": _const_dict("kg:mentions", batch.num_rows),
                    "obj": ent,
                },
                schema=TRIPLE_SCHEMA_ENC,
            )
            return t.filter(pc.is_valid(t["obj"]))

        link_edges = mentions.map_batches(mention_edges, batch_format="pyarrow")
        return triples.union(link_edges)

    res = p.stage("edges", build_edges, kernel_version=kernel_version)
    if write_nt and not res.resumed:
        from knowledgegraphs_ray.sinks.ntriples import write_ntriples

        write_ntriples(p.dataset("edges"), root + "/edges_nt")
    return p


def _backmap_links(sel: ray.data.Dataset, inv_map: dict[str, list[str]]) -> ray.data.Dataset:
    """After selection over EXPANDED surface forms, re-emit each selection
    under every original abbreviation that expanded to it (broadcast
    inverse multimap), keeping the expanded rows too."""
    if not inv_map:
        return sel

    import pandas as pd

    def back(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty or "mention" not in df.columns:
            return df
        extra = []
        for m in df["mention"]:
            extra.append(inv_map.get(m, []))
        rows = [df]
        exploded = df.assign(__origs=extra).explode("__origs").dropna(
            subset=["__origs"]
        )
        if len(exploded):
            exploded = exploded.assign(mention=exploded["__origs"]).drop(
                columns="__origs"
            )
            rows.append(exploded)
        return pd.concat(
            [r.drop(columns="__origs", errors="ignore") for r in rows],
            ignore_index=True,
        )

    return sel.map_batches(back, batch_format="pandas")


def _add_turn_iri(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    iri = pc.binary_join_element_wise(
        pa.scalar("kg:conversation/"),
        batch["conv_id"].combine_chunks(),
        pa.scalar("/t"),
        pc.cast(batch["turn_idx"], pa.string()).combine_chunks(),
        "",
    )
    return batch.append_column("turn_iri", iri)
