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


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 1000)),
        min_size=1,
        max_size=120,
    ),
    st.integers(1, 9),
)
def test_segment_rank_block_scan_matches_pandas(rows, nblocks):
    """Pure-block math of the segment-rank scan: local cumcount + the
    driver carry over arbitrary block splits == pandas groupby cumcount."""
    import pandas as pd

    df = pd.DataFrame(rows, columns=["k", "o"]).assign(u=range(len(rows)))
    df = df.sort_values(["k", "o", "u"]).reset_index(drop=True)
    expect = df.groupby("k").cumcount().to_numpy()

    # simulate the block scan without Ray: split into nblocks chunks
    bounds = np.linspace(0, len(df), nblocks + 1).astype(int)
    got = np.empty(len(df), dtype=np.int64)
    carry_key, carry_cum = None, 0
    for s, e in zip(bounds[:-1], bounds[1:]):
        chunk = df.iloc[s:e]
        if not len(chunk):
            continue
        k = chunk["k"].to_numpy()
        change = np.zeros(len(k), dtype=bool)
        change[0] = True
        change[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(change)
        run_id = np.cumsum(change) - 1
        rank = np.arange(len(k)) - starts[run_id]
        first_run = starts[1] if len(starts) > 1 else len(k)
        off = carry_cum if (k[0],) == carry_key else 0
        rank[:first_run] += off
        got[s:e] = rank
        if (k[0],) == ((k[-1],)):
            carry_cum = off + len(k)
        else:
            carry_cum = int(len(k) - starts[-1])
        carry_key = (k[-1],)
    assert (got == expect).all()


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 500)),
        min_size=1,
        max_size=80,
    ),
    st.integers(1, 200),
)
def test_session_index_matches_sql_window_semantics(rows, gap):
    """Session index = SUM(gap-break) OVER (PARTITION BY key ORDER BY ts)
    — the scan's per-key cumulative-break definition agrees with DuckDB."""
    import pandas as pd

    df = pd.DataFrame(rows, columns=["k", "t"]).assign(u=range(len(rows)))
    sql = (
        "WITH l AS (SELECT k, t, u, CASE WHEN t - lag(t) OVER "
        "(PARTITION BY k ORDER BY t, u) > ? THEN 1 ELSE 0 END AS brk FROM df) "
        "SELECT k, t, u, CAST(SUM(brk) OVER "
        "(PARTITION BY k ORDER BY t, u ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s "
        "FROM l ORDER BY k, t, u"
    )
    expect = _con.execute(sql, [gap]).df()["s"].to_numpy()

    d = df.sort_values(["k", "t", "u"]).reset_index(drop=True)
    k = d["k"].to_numpy()
    t = d["t"].to_numpy()
    change = np.zeros(len(d), dtype=bool)
    change[0] = True
    change[1:] = k[1:] != k[:-1]
    brk = np.zeros(len(d), dtype=np.int64)
    brk[1:] = ((t[1:] - t[:-1]) > gap) & ~change[1:]
    cum = np.cumsum(brk)
    starts = np.flatnonzero(change)
    run_id = np.cumsum(change) - 1
    got = cum - cum[starts[run_id]]
    assert (got == expect).all()
