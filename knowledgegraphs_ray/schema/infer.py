"""Column type inference + date normalization (M3/M4).

Reference: TabularFilesReader.java:246-390 — per column: bool-domain check,
date regexes with calendar validation and per-value format memory, int/double
counting, majority vote -> typed column + colTypes map; dates normalized to
``yyyy-MM-dd`` (XSDmappers.java:146-156). Null sentinels per
TabularFilesReader.java:34.

Ray-Data-first: one ``map_batches`` pass emits per-block per-column VOTE rows
(tiny), the driver reduces votes to a verdict, and a second vectorized pass
casts/normalizes. Two streaming passes, no driver data scan.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
import pyarrow as pa
import ray.data

from knowledgegraphs_ray.rules.compiler import NULL_SENTINELS

BOOL_DOMAIN = {"0", "1", "true", "false", "yes", "no"}

INT_RE = r"^[+-]?\d+$"
DOUBLE_RE = r"^[+-]?(\d+[.,]\d*|\d*[.,]\d+|\d+)([eE][+-]?\d+)?$"

# (regex, strptime format, needs_comma_fix) — the reference's five date
# patterns with calendar-validity checking via actual parsing
DATE_PATTERNS: list[tuple[str, str]] = [
    (r"^\d{4}-\d{1,2}-\d{1,2}$", "%Y-%m-%d"),
    (r"^\d{1,2}/\d{1,2}/\d{4}$", "%d/%m/%Y"),
    (r"^\d{4}/\d{1,2}/\d{1,2}$", "%Y/%m/%d"),
    (r"^\d{1,2}-\d{1,2}-\d{4}$", "%d-%m-%Y"),
    (r"^\d{4}\.\d{1,2}(\.\d{1,2})?$", None),  # 1990.3 / 1990.3.5 — custom parse
]


@dataclass
class ColumnVotes:
    n: int = 0
    nulls: int = 0
    ints: int = 0
    doubles: int = 0
    dates: int = 0
    distinct_sample: set = field(default_factory=set)

    def merge(self, o: "ColumnVotes") -> "ColumnVotes":
        self.n += o.n
        self.nulls += o.nulls
        self.ints += o.ints
        self.doubles += o.doubles
        self.dates += o.dates
        if len(self.distinct_sample) < 64:
            self.distinct_sample |= set(list(o.distinct_sample)[:64])
        return self


def _date_mask(s: pd.Series) -> pd.Series:
    mask = pd.Series(False, index=s.index)
    for regex, fmt in DATE_PATTERNS:
        m = s.str.match(regex, na=False) & ~mask
        if not m.any():
            continue
        if fmt is not None:
            parsed = pd.to_datetime(s[m], format=fmt, errors="coerce")
            mask.loc[m] = parsed.notna()
        else:  # yyyy.M[.d]
            parts = s[m].str.split(".")
            ok = parts.map(
                lambda p: 1 <= int(p[1]) <= 12 and (len(p) < 3 or 1 <= int(p[2]) <= 31)
            )
            mask.loc[m] = ok
    return mask


def votes_for_batch(df: pd.DataFrame, columns: list[str]) -> pd.DataFrame:
    """One vote row per (column) for this block."""
    rows = []
    for c in columns:
        s = df[c].astype(str)
        isnull = df[c].isna() | s.str.strip().str.lower().isin(
            {x.strip().lower() for x in NULL_SENTINELS} | {""}
        )
        v = s[~isnull]
        rows.append(
            {
                "column": c,
                "n": len(s),
                "nulls": int(isnull.sum()),
                "ints": int(v.str.match(INT_RE, na=False).sum()),
                "doubles": int(v.str.match(DOUBLE_RE, na=False).sum()),
                "dates": int(_date_mask(v).sum()),
                "distinct_sample": sorted(set(v.str.lower().head(2000)))[:64],
            }
        )
    return pd.DataFrame(rows)


def infer_column_types(
    ds: ray.data.Dataset,
    columns: list[str] | None = None,
    *,
    sample_rows: int | None = None,
) -> dict[str, str]:
    """Streaming vote pass -> colTypes verdict ({bool,int,double,timestamp,varchar}).

    ``sample_rows``: at 100 TB a full scan just to type columns is wasteful —
    vote on the first N rows instead (the reference scans everything,
    TabularFilesReader.java:246-390; sampling trades the guarantee that a
    late value can't flip the verdict for one cheap pass, and the cast stage
    coerces stragglers to null anyway)."""
    columns = columns or ds.schema().names
    if sample_rows is not None:
        ds = ds.limit(sample_rows)
    votes_ds = ds.map_batches(
        lambda df: votes_for_batch(df, columns), batch_format="pandas"
    )
    agg: dict[str, ColumnVotes] = {c: ColumnVotes() for c in columns}
    for b in votes_ds.iter_batches(batch_size=4096, batch_format="pandas"):
        for r in b.itertuples():
            agg[r.column].merge(
                ColumnVotes(r.n, r.nulls, r.ints, r.doubles, r.dates, set(r.distinct_sample))
            )
    out: dict[str, str] = {}
    for c, v in agg.items():
        non_null = v.n - v.nulls
        if non_null == 0:
            out[c] = "varchar"
        elif v.distinct_sample and v.distinct_sample <= BOOL_DOMAIN and len(v.distinct_sample) <= 2:
            out[c] = "bool"
        elif v.ints == non_null:
            out[c] = "int"
        elif v.doubles == non_null:
            out[c] = "double"
        elif v.dates == non_null:
            out[c] = "timestamp"
        else:
            out[c] = "varchar"
    return out


def normalize_date_series(s: pd.Series) -> pd.Series:
    """Any recognized format -> 'yyyy-MM-dd' (M4)."""
    out = pd.Series(pd.NA, index=s.index, dtype="object")
    done = pd.Series(False, index=s.index)
    for regex, fmt in DATE_PATTERNS:
        m = s.str.match(regex, na=False) & ~done
        if not m.any():
            continue
        if fmt is not None:
            parsed = pd.to_datetime(s[m], format=fmt, errors="coerce")
        else:
            padded = s[m].str.split(".").map(
                lambda p: f"{p[0]}-{int(p[1]):02d}-{int(p[2]) if len(p) > 2 else 1:02d}"
            )
            parsed = pd.to_datetime(padded, format="%Y-%m-%d", errors="coerce")
        out.loc[m] = parsed.dt.strftime("%Y-%m-%d")
        done |= m & parsed.notna().reindex(s.index, fill_value=False)
    return out


def cast_with_types(ds: ray.data.Dataset, coltypes: dict[str, str]) -> ray.data.Dataset:
    """Second pass: apply the verdict — typed columns, normalized dates,
    null sentinels -> NaN."""
    sentinels = {x.strip().lower() for x in NULL_SENTINELS} | {""}

    def cast(df: pd.DataFrame) -> pd.DataFrame:
        for c, t in coltypes.items():
            if c not in df.columns:
                continue
            s = df[c].astype(str)
            isnull = df[c].isna() | s.str.strip().str.lower().isin(sentinels)
            s = s.mask(isnull)
            if t == "int":
                df[c] = pd.to_numeric(s, errors="coerce").astype("Int64")
            elif t == "double":
                df[c] = pd.to_numeric(s.str.replace(",", ".", regex=False), errors="coerce")
            elif t == "bool":
                df[c] = s.str.lower().map(
                    {"1": True, "true": True, "yes": True, "0": False, "false": False, "no": False}
                ).astype("boolean")
            elif t == "timestamp":
                df[c] = normalize_date_series(s)
            else:
                df[c] = s
        return df

    return ds.map_batches(cast, batch_format="pandas")
