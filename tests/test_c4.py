"""C4 line-level cleaning (text/c4.py): planted-corpus rule checks plus
exact oracle equivalence (the sf-table equivalence runs in
test_oracle_gate.py via the augmented c4_clean query)."""

import duckdb
import pandas as pd
import pytest
import ray

from knowledgegraphs_ray.text.c4 import c4_clean, c4_oracle_sql

ROWS = [
    # 3 good lines -> survives intact
    {"doc_id": 1, "text": "One good line here.\nAnd another one!\nIs this kept?"},
    # short + unterminated lines cut; doc falls under min_lines -> dropped
    {"doc_id": 2, "text": "Too short.\nno terminal punctuation here\nword."},
    # javascript line cut, rest kept
    {"doc_id": 3, "text": 'Enable javascript to view.\nA fine sentence stays.\n"Quoted line endings count."\nThird good line survives.'},
    # lorem ipsum doc-level drop
    {"doc_id": 4, "text": "Lorem Ipsum dolor sit amet.\nGood line number two.\nGood line number three."},
    # curly brace doc-level drop
    {"doc_id": 5, "text": "function() { return 1; }\nGood line number two.\nGood line number three."},
    # null text -> dropped
    {"doc_id": 6, "text": None},
]


def test_c4_rules_on_planted_corpus():
    out = (
        c4_clean(ray.data.from_items(ROWS), min_words=3, min_lines=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [1, 3]
    assert out.loc[0, "text"] == ROWS[0]["text"]  # untouched
    assert out.loc[0, "n_lines_kept"] == 3
    kept3 = out.loc[1, "text"].split("\n")
    assert len(kept3) == 3 and not any("javascript" in l for l in kept3)
    assert kept3[1] == '"Quoted line endings count."'


def test_c4_matches_oracle_exactly():
    mine = (
        c4_clean(ray.data.from_items(ROWS), min_words=3, min_lines=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(ROWS))
    gold = (
        con.execute(c4_oracle_sql(min_words=3, min_lines=2))
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        mine[sorted(mine.columns)], gold[sorted(gold.columns)], check_dtype=False
    )


def test_c4_empty_block_schema_stable():
    # mixed empty / surviving blocks must agree on one schema (the kernel
    # emits a constant large_string schema from both paths); an ALL-empty
    # Dataset loses its schema at the Ray layer — callers guard that case
    # the way dedup/resolve.py does
    rows = [{"doc_id": 1, "text": "nope"}] + [
        {"doc_id": i, "text": "Good line one here.\nAnd line two!\nAnd line three."}
        for i in range(2, 4)
    ]
    ds = ray.data.from_items(rows).repartition(6)
    out = c4_clean(ds).to_pandas()
    assert list(out.columns) == ["doc_id", "text", "n_lines_kept"]
    assert sorted(out["doc_id"]) == [2, 3]
    all_dropped = c4_clean(
        ray.data.from_items([{"doc_id": 1, "text": "nope"}]).repartition(4)
    ).to_pandas()
    assert len(all_dropped) == 0
