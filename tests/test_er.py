"""Entity-resolution chain (pipelines/er.py): SNM blocking -> exact
Jaccard verify -> components -> canonical ids, vs the composed DuckDB
twin; plus the propagation tier and the no-edges path."""

import duckdb
import pandas as pd
import ray.data

from knowledgegraphs_ray.pipelines.er import er_resolve, er_resolve_oracle_sql

SF = "/root/testdata/sf0.001"


def _oracle(sf_or_df, **kw) -> pd.DataFrame:
    con = duckdb.connect()
    if isinstance(sf_or_df, str):
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_or_df}/documents.parquet')"
        )
    else:
        con.register("documents", sf_or_df)
    return con.execute(er_resolve_oracle_sql(**kw)).fetch_df()


def _assert_match(res, exp):
    pd.testing.assert_frame_equal(
        res.to_pandas().reset_index(drop=True).astype("int64"),
        exp.reset_index(drop=True).astype("int64"),
    )


def test_er_matches_oracle(ray_session):
    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    res = er_resolve(docs)
    exp = _oracle(SF)
    assert (exp["doc_id"] != exp["canon_id"]).sum() > 0, "fixture must merge"
    _assert_match(res, exp)


def test_er_propagation_tier_equivalent(ray_session):
    # force the distributed-components tier on a corpus small enough that
    # the per-round joins stay fast (the full fixture's path-shaped dup
    # groups need O(group size) rounds — driver union-find territory)
    base = "one two three four five six seven eight nine ten"
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [base, base + " a", base + " b", "unrelated text entirely", base + " c"],
        }
    )
    res = er_resolve(
        ray.data.from_pandas(df), window=3, threshold_micro=800_000,
        max_driver_edges=0,
    )
    exp = _oracle(df, window=3, threshold_micro=800_000)
    _assert_match(res, exp)


def test_er_join_tier_equivalent(ray_session):
    # the join-shaped verify (non-positional candidate sources) must
    # reproduce the fused halo tier / oracle exactly
    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    res = er_resolve(docs, verify="join")
    _assert_match(res, _oracle(SF))


def test_er_hashed_token_tier_equivalent(ray_session):
    # the 8-byte-key scale knob (join tier) must reproduce the
    # literal-token result (collisions are the documented 64-bit class —
    # none at fixture scale)
    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    res = er_resolve(docs, verify="join", hash_tokens=True)
    _assert_match(res, _oracle(SF))


def test_er_custom_id_col_output_naming(ray_session):
    # ADVICE r4: a non-default id_col must come back under ITS name in
    # both engine and oracle outputs
    df = pd.DataFrame(
        {
            "rec": [1, 2, 3],
            "text": ["same same same text", "same same same text", "other words"],
        }
    )
    res = er_resolve(ray.data.from_pandas(df), id_col="rec").to_pandas()
    assert list(res.columns) == ["rec", "canon_id"]
    exp = _oracle(df, id_col="rec")
    assert list(exp.columns) == ["rec", "canon_id"]
    pd.testing.assert_frame_equal(
        res.reset_index(drop=True).astype("int64"),
        exp.reset_index(drop=True).astype("int64"),
    )
    assert res["canon_id"].tolist() == [1, 1, 3]


def test_er_no_edges_self_map(ray_session):
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["alpha beta gamma", "delta epsilon zeta", "eta theta iota"],
        }
    )
    res = er_resolve(ray.data.from_pandas(df)).to_pandas()
    assert res["doc_id"].tolist() == [1, 2, 3]
    assert res["canon_id"].tolist() == [1, 2, 3]


def test_er_transitive_merge(ray_session):
    # a-b and b-c verified via shared prefix + high Jaccard => one component
    base = "the quick brown fox jumps over the lazy dog again and again"
    df = pd.DataFrame(
        {
            "doc_id": [10, 20, 30, 40],
            "text": [base, base + " x1", base + " x2", "completely different words"],
        }
    )
    res = er_resolve(
        ray.data.from_pandas(df), window=2, threshold_micro=800_000
    ).to_pandas()
    exp = _oracle(df, window=2, threshold_micro=800_000)
    pd.testing.assert_frame_equal(
        res.reset_index(drop=True).astype("int64"),
        exp.reset_index(drop=True).astype("int64"),
    )
    assert res.set_index("doc_id")["canon_id"].to_dict() == {
        10: 10, 20: 10, 30: 10, 40: 40,
    }
