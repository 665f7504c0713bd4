"""DuckDB oracle-SQL generation from the SAME compiled extraction plans the
Ray kernels run — Ray pipeline and SQL oracle stay in sync by construction.

Every formatting choice here mirrors ``extract.kernel`` exactly:
ints via CAST, doubles via printf('%.2f'), timestamps via second-resolution
strftime, varchar verbatim, IRI fragments sanitized with the M8 regex, null
sentinels filtered for varchar columns.
"""

from __future__ import annotations

from knowledgegraphs_ray.rules.compiler import (
    KG,
    NULL_SENTINELS,
    RDF_TYPE,
    DataEmit,
    LinkEmit,
    RuleTable,
    TablePlan,
    TypeEmit,
)
from knowledgegraphs_ray.schema.model import SchemaGraph

_SENTINELS_SQL = ", ".join("'" + s + "'" for s in NULL_SENTINELS)


def _key_expr(col: str, dtype: str) -> str:
    if dtype in ("varchar", "string"):
        return f"regexp_replace({col}, '[/\\\\%# ]', '_', 'g')"
    return f"CAST({col} AS VARCHAR)"


def _literal_expr(col: str, dtype: str) -> str:
    if dtype == "double":
        return f"printf('%.2f', {col})"
    if dtype == "timestamp":
        return f"strftime({col}, '%Y-%m-%d %H:%M:%S')"
    if dtype == "bool":
        return f"CASE WHEN {col} THEN 'true' ELSE 'false' END"
    if dtype in ("varchar", "string"):
        return col
    return f"CAST({col} AS VARCHAR)"


def _valid_expr(col: str, dtype: str) -> str:
    base = f"{col} IS NOT NULL"
    if dtype in ("varchar", "string"):
        base += f" AND {col} NOT IN ({_SENTINELS_SQL})"
    return base


def subj_expr(plan: TablePlan, coltypes: dict[str, str]) -> str:
    parts = [f"'{KG}{plan.table}/'"]
    for i, col in enumerate(plan.pk_cols):
        if i:
            parts.append("'_'")
        parts.append(_key_expr(col, coltypes.get(col, "varchar")))
    return " || ".join(parts)


def triples_sql(plan: TablePlan, coltypes: dict[str, str], *, from_clause: str | None = None) -> str:
    """UNION ALL query producing exactly the kernel's (subj, pred, obj)."""
    src = from_clause or plan.table
    subj = subj_expr(plan, coltypes)
    selects: list[str] = []

    def sel(subj_e: str, pred: str, obj_e: str, where: str | None):
        w = f" WHERE {where}" if where else ""
        selects.append(
            f"SELECT {subj_e} AS subj, '{pred}' AS pred, {obj_e} AS obj FROM {src}{w}"
        )

    for e in plan.emits:
        if isinstance(e, TypeEmit):
            sel(subj, RDF_TYPE, f"'{e.cls}'", None)
        elif isinstance(e, LinkEmit):
            dtype = coltypes.get(e.col, "varchar")
            tgt = f"'{KG}{e.ref_table}/' || {_key_expr(e.col, dtype)}"
            sel(subj, e.pred, tgt, _valid_expr(e.col, dtype))
            if e.inverse_pred:
                sel(tgt, e.inverse_pred, subj, _valid_expr(e.col, dtype))
        elif isinstance(e, DataEmit):
            valid = _valid_expr(e.col, e.dtype)
            lit = _literal_expr(e.col, e.dtype)
            if e.attr_cls:
                attr = f"{subj} || '/' || '{e.col}'"
                sel(subj, e.attr_pred, attr, valid)
                sel(attr, RDF_TYPE, f"'{e.attr_cls}'", valid)
                sel(attr, e.pred, lit, valid)
            else:
                sel(subj, e.pred, lit, valid)

    return "\nUNION ALL\n".join(selects)


def kg_sql(rules: RuleTable, g: SchemaGraph, tables: list[str]) -> str:
    parts = [
        triples_sql(rules.plans[t], g[t].columns) for t in tables if t in rules.plans
    ]
    return "\nUNION ALL\n".join(parts)


# transcripts derived from the events table — the SQL twin of
# pipelines.transcripts.transcripts_from_events (same CASE mapping, same
# zero-padded conv_id, same rank-by-(ts, event_id) turn_idx).
TRANSCRIPTS_CTE = """
SELECT
  'conv' || lpad(CAST(user_id AS VARCHAR), 8, '0') AS conv_id,
  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx,
  CASE event_type
    WHEN 'signup' THEN 'system' WHEN 'login' THEN 'user' WHEN 'click' THEN 'user'
    WHEN 'view' THEN 'user' WHEN 'purchase' THEN 'assistant' WHEN 'error' THEN 'tool'
    ELSE 'user' END AS role,
  props AS text,
  event_type AS tool,
  ts
FROM events
"""


def transcript_triples_sql() -> str:
    conv = "'kg:conversation/' || conv_id"
    turn = f"{conv} || '/t' || CAST(turn_idx AS VARCHAR)"
    sent = _SENTINELS_SQL
    selects = [
        f"SELECT {conv} AS subj, 'rdf:type' AS pred, 'kg:Conversation' AS obj FROM t WHERE turn_idx = 0",
        f"SELECT {turn} AS subj, 'rdf:type' AS pred, 'kg:Turn' AS obj FROM t",
        f"SELECT {turn} AS subj, 'kg:p_turn_conversation' AS pred, {conv} AS obj FROM t",
    ]
    for col in ("role", "text", "tool"):
        selects.append(
            f"SELECT {turn} AS subj, 'kg:has_{col}_VALUE' AS pred, {col} AS obj FROM t "
            f"WHERE {col} IS NOT NULL AND {col} NOT IN ({sent})"
        )
    selects.append(
        f"SELECT {turn} AS subj, 'kg:has_ts_VALUE' AS pred, strftime(ts, '%Y-%m-%d %H:%M:%S') AS obj "
        f"FROM t WHERE ts IS NOT NULL"
    )
    return "WITH t AS (" + TRANSCRIPTS_CTE + ")\n" + "\nUNION ALL\n".join(selects)
