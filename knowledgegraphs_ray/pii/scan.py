"""Value-level PII scan — vectorized RE2 detectors over text columns.

The data-parallel complement to the schema-level F-stage: at 100 TB the
engine must also FIND PII-shaped values (emails, phones, IPs, card-like
numbers) inside free text. Pure ``pyarrow.compute`` count kernels; the
patterns use RE2 syntax shared verbatim with the DuckDB oracle.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9 ()-]{7,}[0-9]",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "card": r"\b(?:[0-9]{4}[ -]){3}[0-9]{4}\b",
    "ssn_like": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
}


def pii_counts(batch: pa.Table, *, column: str = "text") -> pa.Table:
    text = batch[column].combine_chunks()
    out = batch
    for name, pat in PII_PATTERNS.items():
        out = out.append_column(
            f"n_{name}", pc.cast(pc.count_substring_regex(text, pat), pa.int64())
        )
    return out


def scan_value_pii(
    ds: ray.data.Dataset, *, column: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """-> (id, n_email, n_phone, ...) per row, zero-copy map-only."""
    return ds.map_batches(
        lambda b: pii_counts(b, column=column), batch_format="pyarrow", zero_copy_batch=True
    ).select_columns([id_col] + [f"n_{k}" for k in PII_PATTERNS])


def pii_scan_oracle_sql(*, table: str = "documents", column: str = "text", id_col: str = "doc_id") -> str:
    cols = ", ".join(
        f"CAST(len(regexp_extract_all({column}, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat in PII_PATTERNS.items()
    )
    return f"SELECT {id_col}, {cols} FROM {table}"


# redaction order: specific patterns first (card/SSN would otherwise be
# swallowed by the broad phone detector)
REDACT_ORDER = ["card", "ssn_like", "email", "ipv4", "phone"]


def redact_pii(
    ds: ray.data.Dataset,
    *,
    column: str = "text",
    id_col: str = "doc_id",
    kinds: list[str] | None = None,
    token_fmt: str = "[{kind}]",
) -> ray.data.Dataset:
    """Mask every detected PII span with a typed placeholder — the
    curation-side complement of the scan (find -> redact -> train). Pure
    ``pc.replace_substring_regex`` per pattern, map-only; detectors run
    most-specific-first (REDACT_ORDER) so the broad phone pattern cannot
    eat card/SSN spans. -> (id, redacted) rows."""
    kinds = kinds or REDACT_ORDER

    def redact(batch: pa.Table) -> pa.Table:
        text = batch[column].combine_chunks()
        for name in kinds:
            text = pc.replace_substring_regex(
                text, PII_PATTERNS[name], token_fmt.format(kind=name)
            )
        return pa.table({id_col: batch[id_col], "redacted": text})

    return ds.map_batches(redact, batch_format="pyarrow", zero_copy_batch=True)


def pii_redact_oracle_sql(
    *,
    table: str = "documents",
    column: str = "text",
    id_col: str = "doc_id",
    kinds: list[str] | None = None,
    token_fmt: str = "[{kind}]",
) -> str:
    kinds = kinds or REDACT_ORDER
    expr = column
    for name in kinds:  # same detector order as the kernel
        expr = (
            f"regexp_replace({expr}, '{PII_PATTERNS[name]}', "
            f"'{token_fmt.format(kind=name)}', 'g')"
        )
    return f"SELECT {id_col}, {expr} AS redacted FROM {table}"
