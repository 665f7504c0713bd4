"""End-to-end curation pipeline: stage semantics + checkpoint resume."""

import os

import numpy as np
import pandas as pd
import pytest
import ray.data


def _docs():
    return ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    )


def test_dedup_exact_rows_keeps_payload_and_counts():
    from knowledgegraphs_ray.dedup.resolve import resolve_duplicates  # noqa: F401
    from knowledgegraphs_ray.pipelines.curation import dedup_exact_rows

    df = pd.DataFrame(
        {
            "doc_id": [3, 1, 2, 10, 11],
            "text": ["a", "a", "a", "b", "c"],
            "lang": ["en", "en", "fr", "en", "de"],
        }
    )
    out = (
        dedup_exact_rows(ray.data.from_pandas(df).repartition(3))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # survivor = min id per distinct text, payload = that row's columns
    assert list(out["doc_id"]) == [1, 10, 11]
    assert list(out["n_copies"]) == [3, 1, 1]
    assert list(out["lang"]) == ["en", "en", "de"]  # doc 1's lang, not doc 2's


def test_curate_run_stages_and_resume(tmp_path):
    from knowledgegraphs_ray.pipelines.curation import curate_run

    root = str(tmp_path / "curate")
    p = curate_run(
        root,
        _docs,
        min_tokens=5,
        rates={"en": 0.5},
        default_rate=0.25,
        pack_budget=512,
    )
    m = p.metrics()
    assert list(m) == ["filtered", "exact_dedup", "near_dedup", "sampled", "packed"]
    # monotone row counts through filter/dedup stages
    assert m["filtered"]["rows"] >= m["exact_dedup"]["rows"] >= m["near_dedup"]["rows"]
    assert m["near_dedup"]["rows"] >= m["sampled"]["rows"] > 0
    assert m["packed"]["rows"] == m["sampled"]["rows"]  # every doc packed once
    # pack budget respected (oversize docs excluded)
    packed = p.dataset("packed").to_pandas()
    sums = packed[~packed["oversize"]].groupby("pack_id")["n_tokens"].sum()
    assert (sums <= 512).all()
    # every stage published a manifest with partition lineage
    from knowledgegraphs_ray.state.checkpoint import read_manifest

    for name in m:
        man = read_manifest(os.path.join(root, name))
        assert man["rows"] == m[name]["rows"]
        assert isinstance(man["partitions"], list)

    # second run resumes every stage without recompute
    p2 = curate_run(
        root, _docs, min_tokens=5, rates={"en": 0.5}, default_rate=0.25, pack_budget=512
    )
    assert all(r.resumed for r in p2.results)
    assert p2.metrics().keys() == m.keys()


def test_curate_sampled_deterministic(tmp_path):
    """The sampled stage is reproducible across independent runs (exact
    integer thresholds, no RNG state)."""
    from knowledgegraphs_ray.pipelines.curation import curate_run

    a = curate_run(
        str(tmp_path / "a"), _docs, min_tokens=5, rates={"en": 0.3}, default_rate=0.1
    )
    b = curate_run(
        str(tmp_path / "b"), _docs, min_tokens=5, rates={"en": 0.3}, default_rate=0.1
    )
    ia = sorted(a.dataset("sampled").to_pandas()["doc_id"])
    ib = sorted(b.dataset("sampled").to_pandas()["doc_id"])
    assert ia == ib


def test_curate_run_with_hygiene_stages(tmp_path):
    """Gopher rule filter + decontamination slot in between the quality gate
    and exact dedup; stage names stay stable for resume."""
    from knowledgegraphs_ray.pipelines.curation import curate_run

    def bench():
        return ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
        ).map_batches(lambda df: df[df["doc_id"] % 20 == 0], batch_format="pandas")

    def corpus():
        return ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "text", "lang", "source"],
        ).map_batches(lambda df: df[df["doc_id"] % 20 != 0], batch_format="pandas")

    p = curate_run(
        str(tmp_path / "c"),
        corpus,
        min_tokens=5,
        gopher_rules=True,
        benchmark=bench,
        decontam_n=4,
    )
    m = p.metrics()
    assert list(m) == [
        "filtered", "gopher", "decontaminated", "exact_dedup",
        "near_dedup", "sampled", "packed",
    ]
    assert m["filtered"]["rows"] >= m["gopher"]["rows"] >= m["decontaminated"]["rows"]
    assert m["decontaminated"]["rows"] > 0
    # decontaminated stage keeps the corpus schema (flags dropped)
    cols = p.dataset("decontaminated").schema().names
    assert "contaminated" not in cols and "n_contaminated" not in cols


def test_curate_run_with_paragraph_dedup(tmp_path):
    """paragraph_min_count inserts boilerplate removal FIRST; the removed
    footer paragraph never reaches the quality gate, and the stage keeps
    the corpus schema (n_removed dropped)."""
    from knowledgegraphs_ray.pipelines.curation import curate_run

    footer = "SUBSCRIBE TO OUR NEWSLETTER for updates and offers"

    def corpus():
        def add_footer(df):
            df = df.copy()
            df["text"] = df["text"] + "\n\n" + footer
            return df

        return ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "text", "lang", "source"],
        ).map_batches(add_footer, batch_format="pandas")

    p = curate_run(
        str(tmp_path / "c"), corpus, min_tokens=5, paragraph_min_count=2
    )
    m = p.metrics()
    assert list(m)[0] == "para_dedup"
    cols = p.dataset("para_dedup").schema().names
    assert cols == ["doc_id", "text", "lang", "source"]
    texts = p.dataset("para_dedup").take(5)
    assert all(footer not in r["text"] for r in texts)


def test_curate_run_with_span_and_ppl_stages(tmp_path):
    """span_dedup_w cuts corpus-duplicated spans before the quality gate;
    ppl_keep_quantile drops the most-perplexed tail after it; both stages
    keep the corpus schema."""
    from knowledgegraphs_ray.pipelines.curation import curate_run

    def corpus():
        return ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "text", "lang", "source"],
        )

    p = curate_run(
        str(tmp_path / "c"),
        corpus,
        min_tokens=5,
        span_dedup_w=8,
        ppl_keep_quantile=0.9,
    )
    m = p.metrics()
    names = list(m)
    assert names[0] == "span_dedup" and "ppl_filtered" in names
    assert p.dataset("span_dedup").schema().names == [
        "doc_id", "text", "lang", "source",
    ]
    # ppl stage keeps the quality gate's schema (incl. its n_tokens column)
    # and drops its own ppl score
    ppl_cols = p.dataset("ppl_filtered").schema().names
    assert "ppl" not in ppl_cols
    assert set(ppl_cols) == set(p.dataset("filtered").schema().names)
    n_filtered = m["filtered"]["rows"]
    n_ppl = m["ppl_filtered"]["rows"]
    assert 0 < n_ppl <= n_filtered
    assert n_ppl >= 0.9 * n_filtered - 1  # head-selection contract


def test_curate_run_with_semdedup_and_dsir(tmp_path):
    """Round-3 selection stages: SemDeDup drops the embedding near-dup
    loser, DSIR keeps only the top-k most target-like survivors, and both
    slot into the checkpoint chain with stable names."""
    from knowledgegraphs_ray.pipelines.curation import curate_run

    def docs():
        # half the tokens unique per doc so MinHash near-dedup does not
        # collapse the corpus before the new stages run
        rows = []
        for i in range(30):
            base = (
                "cat feline whiskers purr nap meow paw fur tail claw"
                if i % 3 == 0
                else "bond yield margin swap rate curve hedge basis spread tenor"
            )
            uniq = " ".join(f"u{i}x{j}" for j in range(10))
            rows.append(
                {"doc_id": i, "text": f"{base} {uniq}", "lang": "en",
                 "source": "s"}
            )
        return ray.data.from_items(rows)

    def embeddings():
        # docs 1 and 4 are semantic near-dups; 4 loses (min id survives)
        rng = np.random.default_rng(3)
        base = rng.normal(size=(30, 8)).astype(np.float32)
        base[4] = base[1] + 1e-4
        return ray.data.from_items(
            [{"doc_id": i, "embedding": base[i].tolist()} for i in range(30)]
        )

    def target():
        return docs().filter(lambda r: r["doc_id"] % 3 == 0)

    p = curate_run(
        str(tmp_path / "c"),
        docs,
        min_tokens=5,
        default_rate=1.0,
        pack_budget=512,
        semantic_threshold=0.95,
        embeddings=embeddings,
        dsir_top_k=8,
        dsir_target=target,
    )
    m = p.metrics()
    assert "sem_dedup" in m and "dsir_selected" in m
    sem = p.dataset("sem_dedup").to_pandas()
    assert 4 not in set(sem["doc_id"])  # semantic loser dropped
    assert 1 in set(sem["doc_id"])      # min-id survivor kept
    sel = p.dataset("dsir_selected").to_pandas()
    assert len(sel) == 8
    # every selected doc is cat-domain (target-like)
    assert all(i % 3 == 0 for i in sel["doc_id"])
    assert m["sampled"]["rows"] == 8  # default_rate=1.0 passes all through


def test_curate_run_with_classifier_and_weighted_cap(tmp_path):
    """Trained-classifier quality gate after the rule gates; final
    length-weighted ES cap before packing. Stage names stable for resume."""
    from knowledgegraphs_ray.pipelines.curation import curate_run

    def corpus():
        return ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "text", "lang", "source"],
        )

    p = curate_run(
        str(tmp_path / "c"),
        corpus,
        min_tokens=5,
        classifier_min_micro=0,
        weighted_k=50,
    )
    m = p.metrics()
    assert list(m) == [
        "filtered", "clf_filtered", "exact_dedup", "near_dedup",
        "sampled", "weighted", "packed",
    ]
    assert m["filtered"]["rows"] >= m["clf_filtered"]["rows"] > 0
    assert m["weighted"]["rows"] == 50
    # the gate drops rows, never adds columns
    assert p.dataset("clf_filtered").schema().names == p.dataset("filtered").schema().names
