import duckdb
import numpy as np
import pandas as pd
import ray.data

from knowledgegraphs_ray.text.diversity import (
    ngram_diversity,
    ngram_diversity_oracle_sql,
)


def _docs():
    rng = np.random.default_rng(11)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    rows = []
    for i in range(90):
        lang = ["en", "de", "es"][i % 3]
        if lang == "de":
            text = "alpha beta gamma alpha beta gamma alpha beta gamma"  # templated
        else:
            text = " ".join(rng.choice(words, size=rng.integers(2, 14)))
        rows.append({"doc_id": i, "lang": lang, "text": text})
    # short-doc fallback + empty text edge cases
    rows.append({"doc_id": 90, "lang": "en", "text": "solo"})
    rows.append({"doc_id": 91, "lang": "es", "text": ""})
    return pd.DataFrame(rows)


def test_ngram_diversity_matches_oracle_and_flags_templates():
    df = _docs()
    ds = ray.data.from_pandas(df).repartition(6)
    out = ngram_diversity(ds).to_pandas().sort_values("lang").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", df)
    want = con.execute(ngram_diversity_oracle_sql()).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
    # the templated slice scores far lower than the random ones
    d = out.set_index("lang")["diversity_micro"]
    assert d["de"] < d["en"] and d["de"] < d["es"]
    # parallelism invariance
    out2 = (
        ngram_diversity(ds.repartition(2))
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)


def test_ngram_diversity_driver_limit_fails_fast():
    df = _docs()
    ds = ray.data.from_pandas(df)
    try:
        ngram_diversity(ds, driver_limit=3)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "driver_limit" in str(e)
