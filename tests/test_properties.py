"""Property-based tests (hypothesis) for kernel/oracle agreement and
algebraic invariants — the conformance layer FIXTURES.md asks for.

The formatting properties compare the Ray-side lexical forms against DuckDB
evaluating the SAME expressions the generated oracle SQL uses — any drift
here is exactly the drift that would break the driver's value-hash compare.
"""

import duckdb
import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from knowledgegraphs_ray.canon.unionfind import UnionFind
from knowledgegraphs_ray.extract.kernel import format_literal
from knowledgegraphs_ray.linking.mentions import normalize_label
from knowledgegraphs_ray.text.analysis import rolling_hashes

_con = duckdb.connect()


@settings(max_examples=200, deadline=None)
@given(
    st.floats(
        min_value=-1e12, max_value=1e12, allow_nan=False, allow_infinity=False
    )
)
def test_double_format_matches_duckdb_printf(x):
    mine = format_literal(pa.array([x], pa.float64()), "double")[0].as_py()
    gold = _con.execute("SELECT printf('%.2f', CAST(? AS DOUBLE))", [x]).fetchone()[0]
    assert mine == gold, (x, mine, gold)


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=4_102_444_800_000_000))  # µs up to year 2100
def test_timestamp_format_matches_duckdb_strftime(us):
    arr = pa.array([us], pa.timestamp("us"))
    mine = format_literal(arr, "timestamp")[0].as_py()
    gold = _con.execute(
        "SELECT strftime(make_timestamp(?), '%Y-%m-%d %H:%M:%S')", [us]
    ).fetchone()[0]
    assert mine == gold, (us, mine, gold)


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=-(2**62), max_value=2**62))
def test_int_format_matches_duckdb_cast(x):
    mine = format_literal(pa.array([x], pa.int64()), "int")[0].as_py()
    gold = _con.execute("SELECT CAST(CAST(? AS BIGINT) AS VARCHAR)", [x]).fetchone()[0]
    assert mine == gold


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(max_size=40), min_size=1, max_size=20))
def test_rolling_hash_matches_reference_impl(texts):
    arr = pa.array(texts, pa.string())
    out = rolling_hashes(arr)

    def ref(s: str) -> int:
        h = 0
        for b in s.encode():
            h = (h * 1099511628211 + b) % (1 << 64)
        return h

    assert out.tolist() == [ref(s) for s in texts]


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=60))
def test_normalize_label_idempotent(s):
    once = normalize_label(s)
    assert normalize_label(once) == once


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)), min_size=0, max_size=60
    )
)
def test_union_find_invariants(edges):
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    # root of every element is the minimum of its component
    groups = uf.groups()
    for root, members in groups.items():
        assert root == min(members)
        for m in members:
            assert uf.find(m) == root
    # union order doesn't matter
    uf2 = UnionFind()
    for a, b in reversed(edges):
        uf2.union(b, a)
    assert {frozenset(v) for v in uf.groups().values()} == {
        frozenset(v) for v in uf2.groups().values()
    }


@settings(max_examples=100, deadline=None)
@given(
    st.dates(min_value=__import__("datetime").date(1900, 1, 1),
             max_value=__import__("datetime").date(2099, 12, 31)),
    st.sampled_from(["%Y-%m-%d", "%d/%m/%Y", "%Y/%m/%d", "%d-%m-%Y"]),
)
def test_date_normalizer_matches_duckdb_strptime(d, fmt):
    import pandas as pd

    from knowledgegraphs_ray.schema.infer import normalize_date_series

    raw = d.strftime(fmt)
    mine = normalize_date_series(pd.Series([raw])).iloc[0]
    gold = _con.execute(
        "SELECT strftime(strptime(?, ?), '%Y-%m-%d')", [raw, fmt]
    ).fetchone()[0]
    assert mine == gold, (raw, fmt, mine, gold)


def test_ntriples_escape_roundtrip_concrete(tmp_path):
    import ray.data

    from knowledgegraphs_ray.sinks.ntriples import write_ntriples
    from knowledgegraphs_ray.sources.ontology import parse_ntriples

    nasty = ['a "b"', "line\nbreak", "back\\slash", "tab\tchar", ""]
    rows = [
        {"subj": f"kg:s{i}", "pred": "rdfs:label", "obj": t} for i, t in enumerate(nasty)
    ]
    out = str(tmp_path / "nt")
    write_ntriples(ray.data.from_items(rows), out)
    parsed = parse_ntriples(out + "/*.nt")
    got = {s: o for s, p, o, lit in parsed if lit}
    for i, t in enumerate(nasty):
        assert got[f"kg:s{i}"] == t, (t, got.get(f"kg:s{i}"))
