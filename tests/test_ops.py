"""Tests for dedup / text-analysis / similarity / containment operators."""

import numpy as np
import pyarrow as pa
import ray.data

from knowledgegraphs_ray.dedup.exact import dedup_exact
from knowledgegraphs_ray.extract.containment import containment_check
from knowledgegraphs_ray.sim.ann import LshBucketer, brute_force_topk
from knowledgegraphs_ray.text import analysis as ta


def test_dedup_exact_small():
    ds = ray.data.from_items(
        [
            {"doc_id": 3, "text": "aaa"},
            {"doc_id": 1, "text": "aaa"},
            {"doc_id": 2, "text": "bbb"},
        ]
    )
    out = dedup_exact(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [1, 2]
    assert out[out["text"] == "aaa"]["n_copies"].iloc[0] == 2


def test_token_and_quality_stats():
    b = pa.table({"doc_id": [0, 1], "text": ["the cat, and dog!", ""]})
    t = ta.token_stats(b)
    assert t["n_tokens"].to_pylist() == [4, 0]
    q = ta.quality_stats(b)
    assert q["stop_ratio"].to_pylist()[0] == 0.5  # the, and of 4 tokens
    assert q["punct_ratio"].to_pylist()[1] == 0.0


def test_lang_scores_pred():
    b = pa.table({"text": ["the cat and the dog", "el gato es la cosa", "zzz qqq"]})
    out = ta.lang_scores(b)
    assert out["lang_pred"].to_pylist() == ["en", "es", "und"]


def test_rolling_fingerprint_matches_python():
    texts = ["abc", "", "hello world", "abc"]
    arr = pa.array(texts, pa.string())
    out = ta.rolling_hashes(arr)

    def ref(s: str) -> int:
        h = 0
        for b in s.encode():
            h = (h * 1099511628211 + b) % (1 << 64)
        return h

    assert out.tolist() == [ref(s) for s in texts]
    assert out[0] == out[3]  # duplicates share fingerprints


def test_enrich_stats_matches_sequential_kernels():
    """Fused enrich kernel == the four separate kernels applied in order."""
    b = pa.table(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["the cat, and dog!", "", "el gato es la cosa", "zzz qqq."],
        }
    )
    seq = ta.fingerprint(ta.lang_scores(ta.quality_stats(ta.token_stats(b))))
    fused = ta.enrich_stats(b)
    assert fused.schema.names == seq.schema.names
    for name in seq.schema.names:
        assert fused[name].to_pylist() == seq[name].to_pylist(), name


def test_triple_kernel_encoded_and_decoded_forms():
    """Kernels emit dictionary-encoded pred (TRIPLE_SCHEMA_ENC); decode_triples
    restores the plain-string TRIPLE_SCHEMA with identical values."""
    import pyarrow.types as pt

    from knowledgegraphs_ray.extract.kernel import TRIPLE_SCHEMA, decode_triples
    from knowledgegraphs_ray.pipelines.transcripts import (
        extract_transcript_triples,
        synth_transcripts,
    )

    ds = synth_transcripts(10, seed=3, parallelism=2)
    enc = extract_transcript_triples(ds)
    enc_batch = next(iter(enc.iter_batches(batch_size=50, batch_format="pyarrow")))
    assert pt.is_dictionary(enc_batch.schema.field("pred").type)
    dec = decode_triples(extract_transcript_triples(ds))
    assert dec.schema().base_schema == TRIPLE_SCHEMA
    enc_set = {
        (r["subj"], r["pred"], r["obj"]) for r in enc.take_all()
    }
    dec_set = {
        (r["subj"], r["pred"], r["obj"]) for r in dec.take_all()
    }
    assert enc_set == dec_set and len(dec_set) > 0


def test_brute_force_topk_exact():
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((50, 8)).astype(np.float32)
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(50)]
    )
    out = brute_force_topk(ds, query_ids=[0], k=5, concurrency=2).to_pandas()
    # oracle: numpy cosine
    q = vecs[0] / np.linalg.norm(vecs[0])
    m = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    scores = m @ q
    expect = np.lexsort((np.arange(50), -scores))[:5]
    got = out.sort_values("rank")["neighbor_id"].tolist()
    assert got == expect.tolist()
    assert out["rank"].tolist() == sorted(out["rank"].tolist())


def test_lsh_bucketer_groups_identical_vectors():
    v = [0.5] * 8
    b = pa.table({"vec_id": [0, 1], "embedding": pa.array([v, v], pa.list_(pa.float32()))})
    out = LshBucketer(dim=8)(b)
    sig = out["lsh_bucket"].to_pylist()
    assert sig[0] == sig[1]


def test_containment_check(sf_dir):
    res = containment_check(
        ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"]),
        "o_custkey",
        ray.data.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"]),
        "c_custkey",
    )
    assert res["contained"] is True and res["n_dangling"] == 0


def test_stratified_sample_deterministic_and_rate():
    import ray.data

    from knowledgegraphs_ray.pipelines.training_data import stratified_sample

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.01/documents.parquet", columns=["doc_id", "lang"]
    )
    a = stratified_sample(ds, rates={"en": 0.5}, default_rate=0.2).to_pandas()
    b = stratified_sample(
        ds.repartition(7), rates={"en": 0.5}, default_rate=0.2
    ).to_pandas()
    assert set(a["doc_id"]) == set(b["doc_id"])  # parallelism-invariant
    n_en = ds.to_pandas().query("lang == 'en'").shape[0]
    got_en = (a["lang"] == "en").sum()
    assert abs(got_en / max(n_en, 1) - 0.5) < 0.15  # rate roughly honored
    # rate 1.0 keeps everything, 0.0 keeps nothing
    full = stratified_sample(ds, rates={}, default_rate=1.0).to_pandas()
    assert len(full) == ds.count()
    none = stratified_sample(ds, rates={}, default_rate=0.0).to_pandas()
    assert len(none) == 0


def test_pack_sequences_invariants():
    import numpy as np
    import pandas as pd
    import ray.data

    from knowledgegraphs_ray.pipelines.training_data import pack_sequences

    rng = np.random.default_rng(2)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(500, dtype="int64"),
            "n_tokens": rng.integers(10, 900, 500).astype("int64"),
        }
    )
    df.loc[0, "n_tokens"] = 5000  # oversize doc
    out = pack_sequences(
        ray.data.from_pandas(df).repartition(4), budget=2048
    ).to_pandas()
    # every doc packed exactly once
    assert sorted(out["doc_id"]) == sorted(df["doc_id"])
    sums = out.groupby("pack_id")["n_tokens"].sum()
    over = out[out["oversize"]]
    assert set(over["doc_id"]) == {0}
    ok_packs = sums[~sums.index.isin(over["pack_id"])]
    assert (ok_packs <= 2048).all()
    # packing efficiency: within 30% of the per-partition lower bound
    total = df.loc[df["n_tokens"] <= 2048, "n_tokens"].sum()
    n_packs = out.loc[~out["oversize"], "pack_id"].nunique()
    assert n_packs <= np.ceil(total / 2048) * 1.3 + 4


def test_stratified_sample_splitmix_fast_path():
    import ray.data

    from knowledgegraphs_ray.pipelines.training_data import stratified_sample

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.01/documents.parquet", columns=["doc_id", "lang"]
    )
    a = stratified_sample(
        ds, rates={"en": 0.5}, default_rate=0.2, hash_fn="splitmix"
    ).to_pandas()
    b = stratified_sample(
        ds.repartition(5), rates={"en": 0.5}, default_rate=0.2, hash_fn="splitmix"
    ).to_pandas()
    assert set(a["doc_id"]) == set(b["doc_id"])
    assert 0 < len(a) < ds.count()


def test_virtual_dimension_types_distinct_and_null_drop():
    from knowledgegraphs_ray.extract.kernel import decode_triples
    from knowledgegraphs_ray.pipelines.relational import virtual_dimension_types

    ds = ray.data.from_arrow(
        pa.table({"user_id": pa.array([7, 7, None, 3, 3, 3, 11], type=pa.int64())})
    ).repartition(3)
    out = (
        decode_triples(virtual_dimension_types(ds, "user_id", "user"))
        .to_pandas()
        .sort_values("subj")
        .reset_index(drop=True)
    )
    # one type triple per DISTINCT non-null user, regardless of block layout
    assert out["subj"].tolist() == ["kg:user/11", "kg:user/3", "kg:user/7"]
    assert set(out["pred"]) == {"rdf:type"}
    assert set(out["obj"]) == {"kg:User"}


def test_pack_sequences_bfd_matches_ffd_quality():
    import numpy as np
    import pandas as pd
    import ray.data

    from knowledgegraphs_ray.pipelines.training_data import pack_sequences

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(2000, dtype="int64"),
            "n_tokens": rng.integers(10, 1500, 2000).astype("int64"),
        }
    )
    ds = ray.data.from_pandas(df).repartition(2)
    exact = pack_sequences(ds, budget=2048, strategy="ffd").to_pandas()
    bfd = pack_sequences(ds, budget=2048, strategy="bfd").to_pandas()
    # both are valid packings of every doc within budget
    for out in (exact, bfd):
        assert sorted(out["doc_id"]) == sorted(df["doc_id"])
        assert (out.groupby("pack_id")["n_tokens"].sum() <= 2048).all()
    # best-fit stays within 2% of first-fit's pack count
    n_exact = exact["pack_id"].nunique()
    n_bfd = bfd["pack_id"].nunique()
    assert n_bfd <= np.ceil(n_exact * 1.02) + 2


def test_topk_per_group_straddling_blocks():
    """topk_per_group equals the pandas groupby-head reference with hot keys
    spanning many tiny blocks, and the partial prune never drops a winner."""
    import numpy as np
    import pandas as pd
    import ray.data

    from knowledgegraphs_ray.util.topk import topk_per_group

    rng = np.random.default_rng(5)
    n = 4000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 6, n),
            "id": np.arange(n),
            "score": rng.integers(0, 50, n),  # heavy ties -> id tiebreak matters
        }
    )
    ds = ray.data.from_pandas(df).repartition(19)
    got = (
        topk_per_group(ds, key_cols=["k"], score_col="score", id_col="id", k=7)
        .to_pandas()
        .sort_values(["k", "rank"])
        .reset_index(drop=True)
    )
    exp = df.sort_values(["k", "score", "id"], ascending=[True, False, True]).copy()
    exp["rank"] = exp.groupby("k").cumcount()
    exp = exp[exp["rank"] < 7].sort_values(["k", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "id", "score", "rank"]].astype("int64"),
        exp[["k", "id", "score", "rank"]].astype("int64"),
    )


def test_weighted_sample_properties():
    """ES weighted sampling: parallelism-invariant selection; heavy rows
    overrepresented roughly in proportion to weight."""
    import pandas as pd

    from knowledgegraphs_ray.pipelines.training_data import weighted_sample

    n = 2000
    # two weight classes: 10% of rows carry 20x the weight
    w = np.where(np.arange(n) % 10 == 0, 2000, 100)
    df = pd.DataFrame({"doc_id": np.arange(n), "n_chars": w})

    s3 = (
        weighted_sample(ray.data.from_pandas(df).repartition(3), k=200)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    s7 = (
        weighted_sample(ray.data.from_pandas(df).repartition(7), k=200)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert s3.equals(s7)  # pure function of (seed, ids, weights)
    assert len(s3) == 200

    heavy = (s3["doc_id"] % 10 == 0).mean()
    # heavy rows are 10% of the population with ~69% of the total weight;
    # without replacement the selected share lands well above 10% and below
    # the with-replacement share — generous statistical bounds
    assert 0.3 <= heavy <= 0.95


def test_lead_within_group_straddles_blocks():
    """lead() values are correct when a group straddles block boundaries,
    and null at group boundaries / corpus end."""
    import pandas as pd

    from knowledgegraphs_ray.util.segrank import lead_within_group

    df = pd.DataFrame(
        {
            "k": ["a"] * 5 + ["b"] * 3,
            "o": list(range(5)) + list(range(3)),
            "v": [f"t{i}" for i in range(8)],
        }
    )
    for parts in (1, 3, 8):
        ds = ray.data.from_pandas(df).repartition(parts)
        out = (
            lead_within_group(ds, key_cols=["k"], order_cols=["o"], cols=["v"])
            .to_pandas()
            .sort_values(["k", "o"])
            .reset_index(drop=True)
        )
        expect = df.copy()
        expect["lead_v"] = expect.groupby("k")["v"].shift(-1)
        expect = expect.sort_values(["k", "o"]).reset_index(drop=True)
        assert out["lead_v"].fillna("-").tolist() == expect["lead_v"].fillna("-").tolist()


def test_temperature_sample_properties():
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data

    from knowledgegraphs_ray.pipelines.training_data import (
        temperature_sample,
        temperature_sample_oracle_sql,
    )

    # skewed synthetic corpus: 4000 'en', 400 'de', 40 'sw', plus null strata
    rng = np.random.default_rng(3)
    langs = ["en"] * 4000 + ["de"] * 400 + ["sw"] * 40 + [None] * 10
    df = pd.DataFrame({"doc_id": np.arange(len(langs)), "lang": langs})
    ds = ray.data.from_pandas(df).repartition(6)

    out = temperature_sample(ds, tau=0.5, total_k=600).to_pandas()
    # null strata never survive
    assert out["lang"].notna().all()
    # parallelism invariance: different block structure, identical selection
    out2 = temperature_sample(ds.repartition(13), tau=0.5, total_k=600).to_pandas()
    assert set(out["doc_id"]) == set(out2["doc_id"])

    # tau flattens: at tau=0.5 the rare stratum's output share must exceed
    # its natural share; at tau=1.0 shares stay ~natural
    shares = out["lang"].value_counts(normalize=True)
    assert shares.get("sw", 0) > 40 / 4440
    nat = temperature_sample(ds, tau=1.0, total_k=600).to_pandas()
    nshares = nat["lang"].value_counts(normalize=True)
    assert abs(nshares.get("en", 0) - 4000 / 4440) < 0.06
    # total size is in the right ballpark (binomial around total_k)
    assert 0.8 * 600 < len(out) < 1.2 * 600

    # exact DuckDB twin on the same frame
    con = duckdb.connect()
    con.register("documents", df)
    sql = temperature_sample_oracle_sql(tau=0.5, total_k=600)
    oracle = con.execute(sql).df()
    assert set(out["doc_id"]) == set(oracle["doc_id"])

    # tau=0 is uniform-across-strata: every stratum's threshold equals
    # total_k/3 of its size ratio — rare stratum saturates (rate capped at 1)
    flat = temperature_sample(ds, tau=0.0, total_k=120).to_pandas()
    assert (flat["lang"] == "sw").sum() == 40  # 120/3 = 40 >= n_sw -> keep all


def test_assign_splits_properties():
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data

    from knowledgegraphs_ray.pipelines.training_data import (
        assign_splits,
        assign_splits_oracle_sql,
    )

    df = pd.DataFrame({"doc_id": np.arange(20000)})
    ds = ray.data.from_pandas(df).repartition(5)
    out = assign_splits(ds, seed=17).to_pandas()
    # every row labeled, fractions roughly honored
    assert len(out) == 20000 and out["split"].notna().all()
    frac = out["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.9) < 0.02
    assert abs(frac["val"] - 0.05) < 0.01
    assert abs(frac["test"] - 0.05) < 0.01
    # parallelism-invariant
    out2 = assign_splits(ds.repartition(13), seed=17).to_pandas()
    a = out.sort_values("doc_id")["split"].to_numpy()
    b = out2.sort_values("doc_id")["split"].to_numpy()
    assert (a == b).all()
    # exact DuckDB twin
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(assign_splits_oracle_sql(seed=17)).df()
    m = out.merge(want, on="doc_id", suffixes=("", "_o"))
    assert (m["split"] == m["split_o"]).all()
    # custom buckets with remainder -> last
    out3 = assign_splits(ds, splits={"a": 0.5, "b": 0.25}, seed=3).to_pandas()
    f3 = out3["split"].value_counts(normalize=True)
    assert abs(f3["a"] - 0.5) < 0.02 and abs(f3["b"] - 0.5) < 0.02


def test_percentile_per_group():
    import numpy as np
    import pandas as pd
    import ray.data

    from knowledgegraphs_ray.util.topk import percentile_per_group

    df = pd.DataFrame(
        {
            "doc_id": np.arange(9),
            "lang": ["en"] * 5 + ["de"] * 3 + ["sw"],
            "score": [10, 30, 20, 30, 5, 7, 7, 1, 99],
        }
    )
    ds = ray.data.from_pandas(df).repartition(3)
    out = (
        percentile_per_group(
            ds, key_cols=["lang"], score_col="score", id_col="doc_id"
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # en group (n=5): order by (score, id): 4(5),0(10),2(20),1(30),3(30)
    en = out[out["lang"] == "en"].set_index("doc_id")["pct_micro"]
    assert en[4] == 0 and en[0] == 250000 and en[2] == 500000
    assert en[1] == 750000 and en[3] == 1000000  # tie broke on id
    # de group (n=3): 7(1),5(7),6(7)
    de = out[out["lang"] == "de"].set_index("doc_id")["pct_micro"]
    assert de[7] == 0 and de[5] == 500000 and de[6] == 1000000
    # singleton group -> 0
    assert out[out["lang"] == "sw"]["pct_micro"].iloc[0] == 0
    # parallelism invariance
    out2 = (
        percentile_per_group(
            ds.repartition(7), key_cols=["lang"], score_col="score",
            id_col="doc_id",
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (out["pct_micro"].to_numpy() == out2["pct_micro"].to_numpy()).all()


def test_quota_cap_properties():
    import duckdb
    import hashlib
    import pandas as pd
    import ray.data

    from knowledgegraphs_ray.pipelines.training_data import (
        quota_cap,
        quota_cap_oracle_sql,
    )

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(600, dtype=np.int64),
            "source": [f"src{i}" for i in rng.integers(0, 8, 600)],
        }
    )
    ds = ray.data.from_pandas(df).repartition(7)
    out = quota_cap(ds, key_col="source", id_col="doc_id", cap=20, seed=11)
    got = out.to_pandas().sort_values(["source", "doc_id"]).reset_index(drop=True)
    # cap honored per key
    assert (got.groupby("source").size() <= 20).all()
    # brute-force survivor set: 20 smallest seeded hashes per source
    h = np.fromiter(
        (
            int.from_bytes(hashlib.md5(f"11:{i}".encode()).digest()[:8], "big")
            for i in df["doc_id"]
        ),
        dtype=np.uint64,
    )
    bdf = df.assign(h=(h ^ np.uint64(1 << 63)).view(np.int64))
    keep = (
        bdf.sort_values(["source", "h", "doc_id"])
        .groupby("source")
        .head(20)["doc_id"]
    )
    assert set(got["doc_id"]) == set(keep)
    # parallelism invariance
    got2 = (
        quota_cap(ds.repartition(2), key_col="source", id_col="doc_id", cap=20, seed=11)
        .to_pandas()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, got2)
    # exact DuckDB twin (rows + hkey + rank values)
    con = duckdb.connect()
    con.register("documents", df)
    want = (
        con.execute(quota_cap_oracle_sql(cap=20, seed=11))
        .df()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["source", "doc_id", "hkey", "rank"]],
        want[["source", "doc_id", "hkey", "rank"]],
        check_dtype=False,
    )


def test_leakage_safe_splits_properties():
    import duckdb
    import pandas as pd
    import ray.data

    from knowledgegraphs_ray.pipelines.training_data import (
        assign_splits,
        leakage_safe_splits,
        leakage_safe_splits_oracle_sql,
    )

    docs = pd.DataFrame({"doc_id": np.arange(5000, dtype=np.int64)})
    # families: (0,1,2), (10,11), (100,101,102,103) — reps are the min ids
    comp = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 10, 11, 100, 101, 102, 103],
            "component": [0, 0, 0, 10, 10, 100, 100, 100, 100],
        }
    )
    ds = ray.data.from_pandas(docs).repartition(6)
    out = leakage_safe_splits(ds, comp, seed=17).to_pandas()
    assert len(out) == 5000
    by = out.set_index("doc_id")["split"]
    # family members share the bucket
    assert len({by[0], by[1], by[2]}) == 1
    assert by[10] == by[11]
    assert len({by[100], by[101], by[102], by[103]}) == 1
    # singletons match plain assign_splits exactly
    plain = assign_splits(ds, seed=17).to_pandas().set_index("doc_id")["split"]
    members = set(comp["doc_id"])
    singles = [i for i in range(5000) if i not in members]
    assert (by.loc[singles] == plain.loc[singles]).all()
    # join tier (forced) equals broadcast tier
    out_join = leakage_safe_splits(
        ds, comp, seed=17, broadcast_limit=0
    ).to_pandas()
    m = out.merge(out_join, on="doc_id", suffixes=("", "_j"))
    assert (m["split"] == m["split_j"]).all() and (m["rep"] == m["rep_j"]).all()
    # exact DuckDB twin over the same component table
    con = duckdb.connect()
    con.register("documents", docs)
    con.register("c_tbl", comp)
    want = con.execute(
        leakage_safe_splits_oracle_sql("SELECT doc_id, component FROM c_tbl", seed=17)
    ).df()
    mm = out.merge(want, on="doc_id", suffixes=("", "_o"))
    assert (mm["split"] == mm["split_o"]).all() and (mm["rep"] == mm["rep_o"]).all()
