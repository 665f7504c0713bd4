"""Distributed PCA: frozen-constant provenance, parallelism invariance,
integer-exact oracle parity, and spectral sanity."""

import duckdb
import numpy as np
import pandas as pd
import ray.data


def test_frozen_constants_provenance():
    """Retraining on sf0.001 reproduces the frozen constants bit-for-bit
    (the integer partials make training a pure function of the row set)."""
    from knowledgegraphs_ray.sim.pca import (
        PCA_COMPONENTS_MICRO,
        PCA_MEAN_P20,
        train_frozen_pca,
    )

    mean_p20, comps = train_frozen_pca()
    assert mean_p20 == PCA_MEAN_P20
    assert comps == PCA_COMPONENTS_MICRO


def test_training_parallelism_invariance():
    from knowledgegraphs_ray.sim.pca import pca_covariance_partials

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet", columns=["embedding"]
    )
    a = pca_covariance_partials(ds.repartition(2))
    b = pca_covariance_partials(ds.repartition(11))
    assert a[0] == b[0]
    assert np.array_equal(a[1], b[1])
    assert np.array_equal(a[2], b[2])


def test_projection_oracle_and_variance():
    """Engine projection == DuckDB integer twin hash-for-hash; projected
    variance is eigenvalue-ordered (component 0 explains the most)."""
    from knowledgegraphs_ray.sim.pca import oracle_sql, project_pca

    path = "/root/testdata/sf0.001/embeddings.parquet"
    emb = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    got = (
        project_pca(emb)
        .to_pandas()
        .sort_values(["vec_id", "component"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{path}')")
    want = (
        con.execute(oracle_sql())
        .df()
        .sort_values(["vec_id", "component"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) == emb.count() * 8
    assert (got["proj_micro"].to_numpy() == want["proj_micro"].to_numpy()).all()

    # spectral sanity: per-component variance decreases (weakly) with rank
    var = got.groupby("component")["proj_micro"].var().to_numpy()
    assert var[0] == var.max()
    # top-1 explains more than an average original dimension would under
    # any rotation: its share of the top-8 variance exceeds 1/8
    assert var[0] / var.sum() > 1.0 / 8


def test_projection_matches_unquantized_pca():
    """The integer path approximates true float PCA to quantization error:
    reconstruct (x - mean) . w in floats and compare."""
    from knowledgegraphs_ray.sim.pca import (
        PCA_COMPONENTS_MICRO,
        PCA_MEAN_P20,
        PROJ_SCALE,
        W_SCALE,
        project_pca,
    )

    path = "/root/testdata/sf0.001/embeddings.parquet"
    emb = ray.data.read_parquet(path, columns=["vec_id", "embedding"])
    got = project_pca(emb).to_pandas()
    pdf = pd.read_parquet(path)
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    mean = np.asarray(PCA_MEAN_P20, dtype=np.float64) / PROJ_SCALE
    w = np.asarray(PCA_COMPONENTS_MICRO, dtype=np.float64) / W_SCALE
    true = (X - mean) @ w.T
    by_vec = got.pivot(index="vec_id", columns="component", values="proj_micro")
    approx = by_vec.loc[pdf["vec_id"]].to_numpy() / (PROJ_SCALE * W_SCALE)
    # floor quantization error: < 2^-20 per element, ~64 terms, w entries < 1
    assert np.max(np.abs(approx - true)) < 64 / PROJ_SCALE
