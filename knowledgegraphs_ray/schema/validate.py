"""Declarative data-quality validation — Deequ/Great-Expectations-style
constraint checking as ONE streaming pass over the table (the reference
validates inputs piecemeal inside its readers, e.g. Preprocessing checks
nulls/columns per file; here the checks are a first-class distributed
operator with an exact SQL twin).

``validate(ds, rules)`` returns one row per rule:
``(rule, kind, column, violations, total)`` — all int64, order-free.

Scale shape:
* every per-row rule (not_null / in_range / matches_regex /
  accepted_values / fk-broadcast) is evaluated VECTORIZED inside the same
  ``map_batches`` pass; the exchange carries one |rules|-row partial per
  block (combine-before-shuffle), merged by ``sum_partials``.
* ``unique`` needs a distinct count: per-block (value, n) partials merge
  through ``sum_partials`` keyed on the value — the only key-sized
  exchange, bounded by the column's cardinality (the fastagg driver tier
  handles ≤5M distinct; beyond that it falls back to the distributed
  aggregate automatically).
* ``fk`` broadcasts the DISTINCT reference keys once via ``ray.put``
  (dimension tables are small by design — the engine-wide broadcast-join
  discipline); above ``fk_broadcast_limit`` it switches to a distinct
  (value, n) left-anti join so neither fact nor reference table is
  re-shipped per batch.

Null semantics match SQL: NULL is a violation only for ``not_null``;
comparisons / regexes / IN-lists skip NULLs; ``unique`` counts
``count(col) − count(DISTINCT col)`` over non-null values.

Regex dialect: patterns must stay in the RE2 ∩ Python-`re` common subset
(plain classes, anchors, alternation — no backrefs/lookaround), so pandas
``str.contains`` and DuckDB ``regexp_matches`` agree.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from knowledgegraphs_ray.util.blocks import compact_nonempty
from knowledgegraphs_ray.util.fastagg import sum_partials

_KINDS = ("not_null", "unique", "in_range", "matches_regex", "accepted_values", "fk")


@dataclass(frozen=True)
class Rule:
    """One declarative constraint. ``params`` by kind:
    in_range: lo, hi (inclusive) — numeric;
    matches_regex: pattern (contains semantics, both engines);
    accepted_values: values (list);
    fk: ref (ray.data.Dataset), ref_col (str)."""

    name: str
    kind: str
    column: str
    params: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self):
        if self.kind not in _KINDS:
            raise ValueError(f"unknown rule kind {self.kind!r} (one of {_KINDS})")


def _per_row_violations(s: pd.Series, rule: Rule, fk_keys) -> int:
    if rule.kind == "not_null":
        return int(s.isna().sum())
    mask = s.notna()
    if rule.kind == "in_range":
        lo, hi = rule.params["lo"], rule.params["hi"]
        v = s[mask]
        return int(((v < lo) | (v > hi)).sum())
    if rule.kind == "matches_regex":
        v = s[mask].astype(str)
        return int((~v.str.contains(rule.params["pattern"], regex=True)).sum())
    if rule.kind == "accepted_values":
        v = s[mask]
        return int((~v.isin(rule.params["values"])).sum())
    if rule.kind == "fk":
        v = s[mask]
        return int((~v.isin(fk_keys)).sum())
    raise AssertionError(rule.kind)


def validate(
    ds: ray.data.Dataset,
    rules: list[Rule],
    *,
    fk_broadcast_limit: int = 2_000_000,
) -> ray.data.Dataset:
    """Evaluate ``rules`` over ``ds`` -> Dataset of
    (rule, kind, column, violations, total)."""
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError("rule names must be unique")

    per_row = [r for r in rules if r.kind not in ("unique",)]
    uniques = [r for r in rules if r.kind == "unique"]

    # --- fk reference keys: distinct once, broadcast or anti-join tier ---
    fk_refs: dict[str, Any] = {}
    fk_join_rules: list[Rule] = []
    for r in per_row:
        if r.kind != "fk":
            continue
        ref, ref_col = r.params["ref"], r.params["ref_col"]
        distinct = sum_partials(
            ref.select_columns([ref_col]).map_batches(
                lambda df, c=ref_col: df[[c]]
                .dropna()
                .drop_duplicates()
                .assign(__n=np.int64(1)),
                batch_format="pandas",
            ),
            keys=[ref_col],
            sum_cols=["__n"],
        )
        n_ref = distinct.count()
        if n_ref <= fk_broadcast_limit:
            vals = distinct.to_pandas()[ref_col].to_numpy()
            fk_refs[r.name] = ray.put(vals)
        else:
            fk_refs[r.name] = distinct  # anti-join tier below
            fk_join_rules.append(r)

    per_block = [r for r in per_row if r.name not in {x.name for x in fk_join_rules}]
    cols = sorted({r.column for r in per_block}) or [rules[0].column]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        total = np.int64(len(df))
        for r in per_block:
            keys = ray.get(fk_refs[r.name]) if r.kind == "fk" else None
            rows.append(
                (
                    r.name,
                    np.int64(_per_row_violations(df[r.column], r, keys)),
                )
            )
        return pd.DataFrame(
            {
                "rule": [n for n, _ in rows],
                "violations": [v for _, v in rows],
                "total": total,
            }
        )

    report_parts = [
        sum_partials(
            ds.select_columns(cols).map_batches(partial, batch_format="pandas"),
            keys=["rule"],
            sum_cols=["violations", "total"],
        )
    ]

    # --- unique rules: value-keyed count partials ---
    for r in uniques:
        vc = sum_partials(
            ds.select_columns([r.column]).map_batches(
                lambda df, c=r.column: df[[c]]
                .dropna()
                .groupby(c, as_index=False, sort=False)
                .size()
                .rename(columns={"size": "__n"}),
                batch_format="pandas",
            ),
            keys=[r.column],
            sum_cols=["__n"],
        )

        # fold the cardinality-bounded (value, n) table to (Σn, #keys)
        # distributedly — the values themselves never reach the driver
        agg = vc.map_batches(
            lambda t: pa.table(
                {
                    "n": pa.array([pc.sum(t["__n"]).as_py() or 0], pa.int64()),
                    "k": pa.array([t.num_rows], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ).to_pandas()
        n, k = int(agg["n"].sum()), int(agg["k"].sum())
        report_parts.append(
            ray.data.from_arrow(
                pa.table(
                    {
                        "rule": pa.array([r.name], pa.string()),
                        "violations": pa.array([n - k], pa.int64()),
                        "total": pa.array([n], pa.int64()),
                    }
                )
            )
        )

    # --- fk anti-join tier: distinct fact values vs distinct ref keys ---
    for r in fk_join_rules:
        from knowledgegraphs_ray.extract.joins import native_join

        fact = sum_partials(
            ds.select_columns([r.column]).map_batches(
                lambda df, c=r.column: df[[c]]
                .dropna()
                .groupby(c, as_index=False, sort=False)
                .size()
                .rename(columns={"size": "__n"}),
                batch_format="pandas",
            ),
            keys=[r.column],
            sum_cols=["__n"],
        )
        total = int(
            fact.map_batches(
                lambda t: pa.table(
                    {"s": pa.array([pc.sum(t["__n"]).as_py() or 0], pa.int64())}
                ),
                batch_format="pyarrow",
            )
            .to_pandas()["s"]
            .sum()
        )
        ref = fk_refs[r.name].map_batches(
            lambda t, c=r.params["ref_col"], f=r.column: t.select([c]).rename_columns(
                [f]
            ),
            batch_format="pyarrow",
        )
        orphans = native_join(
            fact, ref, left_on=r.column, right_on=r.column, how="left_anti",
            num_partitions=8,
        )
        viol = int(
            orphans.map_batches(
                lambda t: pa.table(
                    {"s": pa.array([pc.sum(t["__n"]).as_py() or 0], pa.int64())}
                ),
                batch_format="pyarrow",
            )
            .to_pandas()["s"]
            .sum()
        )
        # totals for fk report = non-null fact rows (matches the twin)
        report_parts.append(
            ray.data.from_arrow(
                pa.table(
                    {
                        "rule": pa.array([r.name], pa.string()),
                        "violations": pa.array([viol], pa.int64()),
                        "total": pa.array([total], pa.int64()),
                    }
                )
            )
        )

    REPORT = pa.schema(
        [("rule", pa.string()), ("violations", pa.int64()), ("total", pa.int64())]
    )
    merged = report_parts[0]
    for p in report_parts[1:]:
        merged = merged.union(p)
    merged = compact_nonempty(
        merged.map_batches(
            lambda t: t.select(["rule", "violations", "total"]).cast(REPORT),
            batch_format="pyarrow",
        ),
        REPORT,
    )

    meta = {r.name: (r.kind, r.column) for r in rules}

    def decorate(t: pa.Table) -> pa.Table:
        kinds = [meta[n][0] for n in t["rule"].to_pylist()]
        colnames = [meta[n][1] for n in t["rule"].to_pylist()]
        return pa.table(
            {
                "rule": t["rule"],
                "kind": pa.array(kinds, pa.string()),
                "column": pa.array(colnames, pa.string()),
                "violations": t["violations"],
                "total": t["total"],
            }
        )

    return merged.map_batches(decorate, batch_format="pyarrow")


def _rule_sql(r: Rule, table_sql: str, ref_sqls: dict[str, str]) -> str:
    c = r.column
    base = f"FROM ({table_sql})"
    if r.kind == "not_null":
        sel = f"SELECT count(*) FILTER (WHERE {c} IS NULL) AS v, count(*)::BIGINT AS t {base}"
    elif r.kind == "unique":
        sel = f"SELECT count({c}) - count(DISTINCT {c}) AS v, count({c})::BIGINT AS t {base}"
    elif r.kind == "in_range":
        lo, hi = r.params["lo"], r.params["hi"]
        sel = (
            f"SELECT count(*) FILTER (WHERE {c} < {lo} OR {c} > {hi}) AS v, "
            f"count(*)::BIGINT AS t {base}"
        )
    elif r.kind == "matches_regex":
        pat = r.params["pattern"].replace("'", "''")
        sel = (
            f"SELECT count(*) FILTER (WHERE {c} IS NOT NULL AND NOT "
            f"regexp_matches(CAST({c} AS VARCHAR), '{pat}')) AS v, "
            f"count(*)::BIGINT AS t {base}"
        )
    elif r.kind == "accepted_values":
        vals = ", ".join(
            "'" + str(v).replace("'", "''") + "'" if isinstance(v, str) else str(v)
            for v in r.params["values"]
        )
        sel = (
            f"SELECT count(*) FILTER (WHERE {c} IS NOT NULL AND {c} NOT IN ({vals})) "
            f"AS v, count(*)::BIGINT AS t {base}"
        )
    elif r.kind == "fk":
        ref_sql = ref_sqls[r.name]
        rc = r.params["ref_col"]
        sel = (
            f"SELECT count(*) FILTER (WHERE {c} IS NOT NULL AND {c} NOT IN "
            f"(SELECT {rc} FROM ({ref_sql}) WHERE {rc} IS NOT NULL)) AS v, "
            f"count({c})::BIGINT AS t {base}"
        )
    else:  # pragma: no cover
        raise AssertionError(r.kind)
    name = r.name.replace("'", "''")
    return (
        f"SELECT '{name}' AS rule, '{r.kind}' AS kind, '{c}' AS column, "
        f"CAST(v AS BIGINT) AS violations, t AS total FROM ({sel})"
    )


def validate_oracle_sql(
    table_sql: str, rules: list[Rule], *, ref_sqls: dict[str, str] | None = None
) -> str:
    """DuckDB twin: one UNION ALL branch per rule. ``ref_sqls`` maps fk rule
    names to the reference table's SQL."""
    ref_sqls = ref_sqls or {}
    return "\nUNION ALL\n".join(_rule_sql(r, table_sql, ref_sqls) for r in rules)
