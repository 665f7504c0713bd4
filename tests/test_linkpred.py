"""Link prediction: common-neighbor counts + micro-unit Adamic-Adar vs a
hand-computed toy graph, adjacency exclusion, min_cn filter, skew guard."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from knowledgegraphs_ray.graph.linkpred import link_prediction


def _edges(rows) -> ray.data.Dataset:
    df = pd.DataFrame(rows, columns=["u", "v"]).astype("int64")
    return ray.data.from_pandas(df).repartition(3)


# star around 0 (deg 4) + a triangle 1-2-5; canonical u < v everywhere
ROWS = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (1, 5), (2, 5)]


def _got(min_cn=1, **kw) -> pd.DataFrame:
    out = link_prediction(
        _edges(ROWS), min_cn=min_cn, assume_canonical=True, **kw
    ).to_pandas()
    return out.sort_values(["u", "v"]).reset_index(drop=True).astype(
        {"u": "int64", "v": "int64", "cn": "int64", "aa_micro": "int64"}
    )


def _aa(*degs) -> int:
    return sum(int(math.floor(1_000_000.0 / math.log(d))) for d in degs)


def test_toy_scores_exact():
    got = _got(min_cn=1)
    # degrees: 0->4, 1->3, 2->3, 3->1, 4->1, 5->2
    want = pd.DataFrame(
        [
            # (u, v): common neighbors -> cn, aa
            (1, 3, 1, _aa(4)),   # via 0
            (1, 4, 1, _aa(4)),   # via 0
            (2, 3, 1, _aa(4)),
            (2, 4, 1, _aa(4)),
            (3, 4, 1, _aa(4)),
            (0, 5, 2, _aa(3, 3)),  # via 1 and 2
        ],
        columns=["u", "v", "cn", "aa_micro"],
    ).sort_values(["u", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want.astype("int64"))


def test_adjacent_pairs_excluded_and_min_cn():
    got = _got(min_cn=1)
    edge_set = set(ROWS)
    assert not any((u, v) in edge_set for u, v in zip(got["u"], got["v"]))
    # (1,2) share neighbors 0 and 5 but ARE adjacent -> absent
    assert not ((got["u"] == 1) & (got["v"] == 2)).any()
    got2 = _got(min_cn=2)
    assert set(map(tuple, got2[["u", "v"]].itertuples(index=False))) == {(0, 5)}


def test_center_degree_guard_raises():
    with pytest.raises(Exception, match="max_center_degree"):
        _got(min_cn=1, max_center_degree=2)


def test_parallelism_invariance():
    df = pd.DataFrame(ROWS, columns=["u", "v"]).astype("int64")
    one = link_prediction(
        ray.data.from_pandas(df).repartition(1), min_cn=1, assume_canonical=True
    ).to_pandas().sort_values(["u", "v"]).reset_index(drop=True)
    many = link_prediction(
        ray.data.from_pandas(df).repartition(7), min_cn=1, assume_canonical=True
    ).to_pandas().sort_values(["u", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(one, many)


def test_jaccard_scores_exact_and_oracle():
    import duckdb

    from knowledgegraphs_ray.graph.linkpred import link_prediction_oracle_sql

    out = link_prediction(
        _edges(ROWS), min_cn=1, assume_canonical=True, include_jaccard=True
    ).to_pandas()
    got = out.sort_values(["u", "v"]).reset_index(drop=True).astype("int64")
    # degrees: 0->4, 1->3, 2->3, 3->1, 4->1, 5->2
    deg = {0: 4, 1: 3, 2: 3, 3: 1, 4: 1, 5: 2}
    for _, r in got.iterrows():
        du, dv, cn = deg[r["u"]], deg[r["v"]], r["cn"]
        assert r["jac_micro"] == (1_000_000 * cn) // (du + dv - cn)
    # (0,5): cn=2, deg 4+2-2=4 -> 500000
    row = got[(got["u"] == 0) & (got["v"] == 5)]
    assert row["jac_micro"].iloc[0] == 500_000

    con = duckdb.connect()
    con.register("edges_df", pd.DataFrame(ROWS, columns=["u", "v"]))
    gold = con.execute(
        link_prediction_oracle_sql(
            "SELECT u, v FROM edges_df", min_cn=1, include_jaccard=True
        )
    ).fetchdf()
    gold = gold.sort_values(["u", "v"]).reset_index(drop=True).astype("int64")
    pd.testing.assert_frame_equal(got, gold)


def test_jaccard_empty_candidates_short_circuit():
    # a single edge has no wedges at min_cn=1 -> empty result with schema
    out = link_prediction(
        _edges([(0, 1)]), min_cn=1, assume_canonical=True, include_jaccard=True
    )
    assert out.count() == 0
    assert out.schema().names == ["u", "v", "cn", "aa_micro", "jac_micro"]


def test_driver_and_distributed_tiers_identical(ray_session):
    """r5 driver tier: same wedge/AA/jaccard arithmetic, pinned equal."""
    import numpy as np

    rng = np.random.default_rng(13)
    u = rng.integers(0, 60, 400)
    v = rng.integers(0, 60, 400)
    keep = u != v
    lo, hi = np.minimum(u, v)[keep], np.maximum(u, v)[keep]
    df = pd.DataFrame({"u": lo, "v": hi}).drop_duplicates()
    ds = ray.data.from_pandas(df.reset_index(drop=True)).repartition(4)
    for jac in (False, True):
        a = (
            link_prediction(
                ds, min_cn=1, assume_canonical=True, include_jaccard=jac
            )
            .to_pandas()
            .sort_values(["u", "v"])
            .reset_index(drop=True)
        )
        b = (
            link_prediction(
                ds, min_cn=1, assume_canonical=True, include_jaccard=jac,
                driver_limit=0,
            )
            .to_pandas()
            .sort_values(["u", "v"])
            .reset_index(drop=True)
        )
        assert len(a) > 0
        pd.testing.assert_frame_equal(
            a[sorted(a.columns)], b[sorted(b.columns)], check_dtype=False
        )
