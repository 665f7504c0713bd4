"""CSV/TSV reader with repair — delimiter sniffing, header repair, ragged
rows, empty-column dropping, synthetic PK (S1, M1/M2/M5/M6).

Reference: TabularFilesReader.java:88-206 — auto-detect the delimiter as the
most frequent non-word symbol in the header line, fill empty headers with
``Unknown_Header_N``, dedupe repeated headers ``h -> h_i``, pad ragged rows,
drop all-empty Unknown columns, append a synthetic PK column.

Driver sniffs the header (one small read); data parsing is a vectorized
``read_text -> map_batches`` split. For well-formed CSVs prefer
``ray.data.read_csv`` directly; this path exists for repair parity.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
import ray.data

from knowledgegraphs_ray.rules.compiler import NULL_SENTINELS


def detect_delimiter(header_line: str) -> str:
    """Most frequent non-[_a-zA-Z0-9] symbol in the first line (M1)."""
    symbols = re.findall(r"[^\w]", header_line)
    if not symbols:
        return ","
    return Counter(symbols).most_common(1)[0][0]


def repair_headers(raw: list[str]) -> list[str]:
    """Fill empty -> Unknown_Header_N; dedupe h -> h_2, h_3... (M2)."""
    out: list[str] = []
    seen: Counter = Counter()
    unknown = 0
    for h in raw:
        h = h.strip()
        if not h:
            unknown += 1
            h = f"Unknown_Header_{unknown}"
        seen[h] += 1
        out.append(h if seen[h] == 1 else f"{h}_{seen[h]}")
    return out


def read_csv_repaired(
    path: str,
    *,
    delimiter: str | None = None,
    add_pk: bool = True,
    drop_empty_unknown: bool = True,
) -> tuple[ray.data.Dataset, list[str]]:
    """-> (Dataset of string columns, repaired header list)."""
    with open(path) as f:
        header_line = f.readline().rstrip("\r\n")
    delim = delimiter or detect_delimiter(header_line)
    headers = repair_headers(header_line.split(delim))
    ncols = len(headers)

    lines = ray.data.read_text(path)

    def parse(df: pd.DataFrame, _headers=tuple(headers), _ncols=ncols) -> pd.DataFrame:
        import csv

        rows = df["text"]
        rows = rows[rows != header_line]  # drop the header line wherever it lands
        parts = list(csv.reader(rows.tolist(), delimiter=delim))  # quote-aware (C impl)
        # pad / truncate ragged rows to the header width
        fixed = [(p + [""] * _ncols)[:_ncols] for p in parts]
        return pd.DataFrame(fixed, columns=list(_headers), dtype=str)

    ds = lines.map_batches(parse, batch_format="pandas")

    if drop_empty_unknown:
        # M6: drop Unknown_Header_* columns whose cells are all empty/sentinel
        unknowns = [h for h in headers if h.startswith("Unknown_Header_")]
        if unknowns:
            sentinels = {s.strip().lower() for s in NULL_SENTINELS} | {""}

            def count_filled(df: pd.DataFrame) -> pd.DataFrame:
                return pd.DataFrame(
                    [
                        {
                            "column": c,
                            "filled": int(
                                (~df[c].str.strip().str.lower().isin(sentinels)).sum()
                            ),
                        }
                        for c in unknowns
                    ]
                )

            counts = (
                ds.map_batches(count_filled, batch_format="pandas")
                .groupby("column")
                .sum("filled")
                .to_pandas()
            )
            dead = set(counts[counts["sum(filled)"] == 0]["column"])
            if dead:
                headers = [h for h in headers if h not in dead]
                keep = list(headers)
                ds = ds.select_columns(keep)

    if add_pk:
        # M5 redesign: the reference appends rowIndex+1 (position-dependent,
        # TabularFilesReader.java:394-401); a distributed engine needs a
        # content-derived key — hash of the full row (deterministic at any
        # parallelism; collisions negligible at 64 bit for fixture scale)
        import polars as pl

        def add_key(df: pd.DataFrame) -> pd.DataFrame:
            joined = df.astype(str).agg("\x1f".join, axis=1)
            h = pl.Series("r", joined.tolist()).hash(seed=42)
            df["PKCol"] = h.to_pandas().astype(str)
            return df

        ds = ds.map_batches(add_key, batch_format="pandas")
        headers = headers + ["PKCol"]

    return ds, headers
