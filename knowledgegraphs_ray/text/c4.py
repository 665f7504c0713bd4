"""C4-style line-level cleaning (Raffel et al. 2020, section 2.2 of the
T5 paper): the classic web-crawl hygiene pass that runs before any
dedup or model-based filter.

Rules implemented (each a documented C4 rule, doc-level unless noted):

* keep only LINES that end in a terminal punctuation mark (``. ! ? "``)
  and contain at least ``min_words`` whitespace-delimited words;
* drop lines containing the word "javascript" (case-insensitive);
* drop DOCS containing "lorem ipsum" (case-insensitive) or a curly
  brace ``{`` (code markers);
* drop DOCS with fewer than ``min_lines`` surviving lines (C4's
  3-sentence floor, with lines as the sentence proxy).

Scale shape: one map-only pass — polars splits each block's text on
newlines, explodes with a row index, applies vectorized string masks,
and re-joins surviving lines in order. No shuffle, no state; the DuckDB
oracle reproduces the exact expression tree with ``list_filter`` lambdas
so the cleaned text hash-matches.

Reference analogue: the reference normalizes punctuation/annotations per
cell (M11, ``Preprocessing.java``); this is the document-scale
generalization a crawl corpus needs first.
"""

from __future__ import annotations

import polars as pl
import pyarrow as pa
import ray
import ray.data

_TERMINAL_RE = r'[.!?"]$'
_WORD_RE = r"\S+"


def c4_clean(
    docs: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 3,
    min_lines: int = 3,
) -> ray.data.Dataset:
    """-> (id_col, text, n_lines_kept) for surviving docs; ``text`` is the
    newline-join of the surviving lines in original order."""

    def block(batch: pa.Table) -> pa.Table:
        # one constant output schema: empty and survivor blocks must agree
        # (polars emits large_string; the empty path must too)
        schema = pa.schema(
            [
                (id_col, batch.schema.field(id_col).type),
                ("text", pa.large_string()),
                ("n_lines_kept", pa.int64()),
            ]
        )
        df = pl.from_arrow(batch.select([id_col, text_col]))
        n = df.height
        if n == 0:
            return schema.empty_table()
        text = df[text_col].fill_null("")
        low = text.str.to_lowercase()
        doc_ok = (
            ~low.str.contains("lorem ipsum", literal=True)
            & ~text.str.contains("{", literal=True)
        )
        ex = (
            pl.DataFrame(
                {
                    "__i": pl.int_range(0, n, eager=True),
                    "line": text.str.split("\n"),
                }
            )
            .explode("line")
            .with_columns(pl.col("line").fill_null(""))
        )
        keep = (
            ex["line"].str.contains(_TERMINAL_RE)
            & (ex["line"].str.count_matches(_WORD_RE) >= min_words)
            & ~ex["line"].str.to_lowercase().str.contains(
                "javascript", literal=True
            )
        )
        agg = (
            ex.filter(keep)
            .group_by("__i", maintain_order=True)
            .agg(
                text=pl.col("line").str.join("\n"),
                n_lines_kept=pl.len().cast(pl.Int64),
            )
        )
        out = (
            pl.DataFrame({"__i": pl.int_range(0, n, eager=True)})
            .join(agg, on="__i", how="left")
            .sort("__i")
            .with_columns(
                pl.col("text").fill_null(""),
                pl.col("n_lines_kept").fill_null(0),
                pl.Series("__doc_ok", doc_ok),
                pl.Series("__id", df[id_col]),
            )
            .filter(pl.col("__doc_ok") & (pl.col("n_lines_kept") >= min_lines))
            .select(pl.col("__id").alias(id_col), "text", "n_lines_kept")
        )
        return out.to_arrow().cast(schema)

    return docs.map_batches(block, batch_format="pyarrow", zero_copy_batch=True)


def c4_oracle_sql(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    min_words: int = 3,
    min_lines: int = 3,
) -> str:
    """DuckDB twin: identical line predicate inside a ``list_filter``
    lambda, identical doc gates."""
    line_pred = (
        f"regexp_matches(x, '[.!?\"]$') "
        f"AND len(regexp_extract_all(x, '\\S+')) >= {min_words} "
        f"AND NOT contains(lower(x), 'javascript')"
    )
    return f"""
WITH kept AS (
  SELECT {id_col},
         list_filter(str_split(coalesce(text, ''), chr(10)),
                     x -> {line_pred}) AS lines
  FROM {table}
  WHERE NOT contains(lower(coalesce(text, '')), 'lorem ipsum')
    AND NOT contains(coalesce(text, ''), '{{')
)
SELECT {id_col},
       array_to_string(lines, chr(10)) AS text,
       CAST(len(lines) AS BIGINT) AS n_lines_kept
FROM kept
WHERE len(lines) >= {min_lines}
""".strip()
