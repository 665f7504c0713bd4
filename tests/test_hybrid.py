import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from knowledgegraphs_ray.sim.hybrid import hybrid_rrf_oracle_sql, hybrid_rrf_topk


def _corpus(n=120, dim=8, seed=5):
    rng = np.random.default_rng(seed)
    words = ["hash", "join", "customer", "order", "part", "index", "scan", "sort"]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(4, 12))) for _ in range(n)
    ]
    docs = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})
    # list<double>, matching the parquet layout (NOT the tensor extension
    # type from_pandas would infer for ndarray cells)
    emb = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(
                [rng.normal(size=dim).tolist() for _ in range(n)],
                type=pa.list_(pa.float64()),
            ),
        }
    )
    return docs, emb


def test_hybrid_rrf_fuses_and_matches_oracle():
    docs, emb = _corpus()
    dds = ray.data.from_pandas(docs).repartition(4)
    eds = ray.data.from_arrow(emb).repartition(3)
    out = hybrid_rrf_topk(
        dds, eds, query_text="hash join customer", query_vec_id=0, k=10
    )
    # fused list is the union of the two legs (<= 2k rows), rank contiguous
    assert 10 <= len(out) <= 20
    assert (out["rank"].to_numpy() == np.arange(1, len(out) + 1)).all()
    # integer weights: every rrf_micro is a sum of <= 2 floor-divisions
    weights = {1_000_000_000 // (60 + r) for r in range(1, 11)}
    sums = weights | {a + b for a in weights for b in weights}
    assert set(out["rrf_micro"]).issubset(sums)
    # a doc in both legs outranks equal single-leg docs: top doc's score
    # must be >= any single-leg max
    assert out["rrf_micro"].iloc[0] >= max(weights)
    # exact DuckDB twin
    con = duckdb.connect()
    con.register("documents", docs)
    con.register("embeddings", emb)
    want = (
        con.execute(
            hybrid_rrf_oracle_sql(
                query_text="hash join customer", query_vec_id=0, k=10
            )
        )
        .df()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    got = out.sort_values("rank").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()], check_dtype=False)


def test_hybrid_rrf_missing_leg_weight_is_single():
    docs, emb = _corpus(n=40, seed=9)
    # make one doc lexically unique so it appears only in the BM25 leg
    docs.loc[7, "text"] = "zebra quokka xylophone"
    out = hybrid_rrf_topk(
        ray.data.from_pandas(docs),
        ray.data.from_arrow(emb),
        query_text="zebra quokka",
        query_vec_id=1,
        k=5,
    )
    row = out[out["doc_id"] == 7]
    assert len(row) == 1 and row["rrf_micro"].iloc[0] == 1_000_000_000 // 61
