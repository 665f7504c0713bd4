"""Character-window repeated-substring spans (text/substrdup.py) vs the
DuckDB gaps-and-islands twin, both filter tiers, unicode fallback, and
degenerate corpora."""

import duckdb
import pandas as pd
import pyarrow as pa
import ray.data

from knowledgegraphs_ray.text.substrdup import (
    repeated_spans_oracle_sql,
    repeated_substring_spans,
)

SF = "/root/testdata/sf0.001"


def _oracle(df_or_path, **kw) -> pd.DataFrame:
    con = duckdb.connect()
    if isinstance(df_or_path, str):
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{df_or_path}/documents.parquet')"
        )
    else:
        con.register("documents", df_or_path)
    return con.execute(repeated_spans_oracle_sql(**kw)).fetch_df()


def _assert_match(res, exp):
    res = res.to_pandas().reset_index(drop=True).astype("int64")
    exp = exp.reset_index(drop=True).astype("int64")
    pd.testing.assert_frame_equal(res, exp)


def test_spans_match_oracle(ray_session):
    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    res = repeated_substring_spans(docs)
    exp = _oracle(SF)
    assert len(exp) > 0, "fixture must exercise the non-trivial path"
    _assert_match(res, exp)


def test_join_tier_equivalent(ray_session):
    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    res = repeated_substring_spans(docs, broadcast_limit=0)  # force join tier
    _assert_match(res, _oracle(SF))


def test_unicode_fallback_char_exact(ray_session):
    # multi-byte docs must report CHARACTER positions (SQL substr frame),
    # and ascii/unicode copies of the same gram must land in one group
    rep = "αβγδε δούπε κείμενο!"  # 20 chars, multi-byte
    docs_pd = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "zz" + rep * 3,  # spans at char 3..
                rep * 2 + "qq",
                "no repeats here at all, plain ascii filler text",
            ],
        }
    )
    res = repeated_substring_spans(
        ray.data.from_pandas(docs_pd), length=10, stride=2
    )
    exp = _oracle(docs_pd, length=10, stride=2)
    assert len(exp) >= 2
    _assert_match(res, exp)


def test_mixed_ascii_unicode_same_gram(ray_session):
    # the duplicated gram is pure ASCII but lives inside a multi-byte doc:
    # the fallback path's byte-fold must equal the vectorized path's
    shared = "ABCDEFGHIJKLMNOPQRSTUVWXY"  # 25 chars = default length
    docs_pd = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["ascii prefix " + shared, "ünïcode préfix " + shared],
        }
    )
    res = repeated_substring_spans(
        ray.data.from_pandas(docs_pd), length=25, stride=1
    )
    exp = _oracle(docs_pd, length=25, stride=1)
    assert len(exp) == 2
    _assert_match(res, exp)


def test_no_duplicates_empty_output(ray_session):
    docs_pd = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["entirely distinct first", "second one differs"]}
    )
    res = repeated_substring_spans(ray.data.from_pandas(docs_pd))
    assert res.count() == 0
    assert res.schema().names == ["doc_id", "span_start", "span_end", "n_windows"]


def test_self_repeat_within_one_doc(ray_session):
    # min_count counts occurrences corpus-wide INCLUDING self-repeats
    docs_pd = pd.DataFrame({"doc_id": [7], "text": ["xyxyxyxyxyxyxyxyxyxyxyxyxy"]})
    res = repeated_substring_spans(
        ray.data.from_pandas(docs_pd), length=6, stride=2
    )
    exp = _oracle(docs_pd, length=6, stride=2)
    assert len(exp) == 1  # one maximal island covering the whole run
    _assert_match(res, exp)


def test_sliced_block_safe(ray_session):
    # zero_copy map_batches can hand _window_arrays a SLICED Arrow block;
    # offsets must be read relative to arr.offset
    from knowledgegraphs_ray.text.substrdup import _window_arrays

    t = pa.table({"doc_id": [1, 2, 3], "text": ["aaaa", "bbbb", "cccc"]})
    full = _window_arrays(t, id_col="doc_id", text_col="text", length=3, stride=1)
    sl = _window_arrays(
        t.slice(1, 2), id_col="doc_id", text_col="text", length=3, stride=1
    )
    assert list(sl[2]) == [2, 2, 3, 3]
    # doc 2's hashes computed from the sliced block equal the full block's
    assert list(sl[0][:2]) == list(full[0][2:4])


def test_large_string_blocks_int64_offsets(ray_session):
    """large_string text blocks (int64 offsets) hash identically to the
    string path — no ArrowInvalid downcast (ADVICE r4)."""
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "abcdefghij-window-abcdefghij-window-xyz",
                "zz abcdefghij-window-abcdefghij-window-",
                "no repeats in here at all, none",
            ],
        }
    )
    t_small = pa.Table.from_pandas(df, preserve_index=False)
    t_large = t_small.set_column(
        1, "text", t_small["text"].cast(pa.large_string())
    )
    res_s = repeated_substring_spans(
        ray.data.from_arrow(t_small), length=10, stride=2
    ).to_pandas()
    res_l = repeated_substring_spans(
        ray.data.from_arrow(t_large), length=10, stride=2
    ).to_pandas()
    assert len(res_s) > 0
    pd.testing.assert_frame_equal(res_s, res_l)
