"""Excel (.xlsx) reader — S2 parity without external dependencies.

Reference: TabularFilesReader.java:115-154 (``readRowsFromExcel`` /
``getCellValueAsString``) — reads sheet 0 through Apache POI, stringifies
each cell (STRING as-is, NUMERIC via ``String.valueOf(double)``, BOOLEAN as
``true``/``false``, anything else empty), and hands the row lists to the
same header-repair / type-inference path as CSV.

This implementation parses the Office Open XML container directly with the
stdlib (``zipfile`` + ``xml.etree.iterparse``) — .xlsx is a zip of XML
parts, so no POI/openpyxl is needed:

* ``xl/workbook.xml`` + ``xl/_rels/workbook.xml.rels`` resolve sheet 0's
  worksheet part (sheets are not always named ``sheet1.xml``).
* ``xl/sharedStrings.xml`` holds the shared-string table (``t="s"`` cells
  store an index into it); rich-text runs (``<r><t>``) are concatenated.
* Worksheet ``<c r="B2" t="...">`` cells are placed by their column ref —
  gaps (missing cells) become empty strings, matching POI's
  ``cellIterator`` + the reference's ragged-row padding downstream.

Scale note: a .xlsx part is DEFLATE-compressed XML — not splittable, so one
workbook parses as one task. That matches the reference's posture (Excel is
a convenience ingest, never the bulk path); bulk data arrives as CSV or
Parquet. ``read_xlsx_dir`` parallelizes across *files* (one task per
workbook) for many-workbook ingests.
"""

from __future__ import annotations

import zipfile
from xml.etree import ElementTree as ET

import pandas as pd
import ray.data

from knowledgegraphs_ray.sources.csv import repair_headers

_MAIN_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_RID_ATTR = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
)


def _col_index(cell_ref: str) -> int:
    """'B7' -> 1 (0-based column index from the A1-style reference)."""
    idx = 0
    for ch in cell_ref:
        if ch.isalpha():
            idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
        else:
            break
    return idx - 1


def _num_to_str(raw: str) -> str:
    """Render a numeric cell the way Java's ``String.valueOf(double)`` does
    for the values that round-trip (getCellValueAsString, reference
    TabularFilesReader.java:145-154): integral doubles gain a ``.0``."""
    try:
        f = float(raw)
    except ValueError:
        return raw
    if f == int(f) and abs(f) < 1e15:
        return f"{int(f)}.0"
    return repr(f)


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    strings: list[str] = []
    for _, el in ET.iterparse(__import__("io").BytesIO(data), events=("end",)):
        if el.tag == f"{_MAIN_NS}si":
            strings.append("".join(t.text or "" for t in el.iter(f"{_MAIN_NS}t")))
            el.clear()
    return strings


def _sheet_part(zf: zipfile.ZipFile, sheet: int) -> str:
    """Resolve the worksheet part path for the sheet at position ``sheet``."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    sheets = wb.findall(f"{_MAIN_NS}sheets/{_MAIN_NS}sheet")
    if not sheets:
        raise ValueError("workbook has no sheets")
    rid = sheets[sheet].get(_RID_ATTR)
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    for rel in rels.findall(f"{_REL_NS}Relationship"):
        if rel.get("Id") == rid:
            target = rel.get("Target", "")
            return target if target.startswith("xl/") else f"xl/{target}"
    # fallback: conventional name
    return f"xl/worksheets/sheet{sheet + 1}.xml"


def read_xlsx_rows(path: str, *, sheet: int = 0) -> list[list[str]]:
    """Workbook -> row lists of strings (sheet 0 by default), POI-parity
    stringification. Trailing missing cells are NOT padded here — the
    header-repair path pads ragged rows exactly like the CSV route."""
    with zipfile.ZipFile(path) as zf:
        sst = _shared_strings(zf)
        part = _sheet_part(zf, sheet)
        rows: list[list[str]] = []
        with zf.open(part) as fh:
            for _, el in ET.iterparse(fh, events=("end",)):
                if el.tag != f"{_MAIN_NS}row":
                    continue
                cells: list[str] = []
                for c in el.findall(f"{_MAIN_NS}c"):
                    ref = c.get("r")
                    col = _col_index(ref) if ref else len(cells)
                    while len(cells) < col:
                        cells.append("")  # gap cells -> empty (M7 sentinels)
                    ctype = c.get("t", "n")
                    v = c.find(f"{_MAIN_NS}v")
                    raw = v.text if v is not None and v.text is not None else ""
                    if ctype == "s":
                        val = sst[int(raw)] if raw else ""
                    elif ctype in ("str", "e"):
                        val = raw if ctype == "str" else ""
                    elif ctype == "inlineStr":
                        is_el = c.find(f"{_MAIN_NS}is")
                        val = (
                            "".join(t.text or "" for t in is_el.iter(f"{_MAIN_NS}t"))
                            if is_el is not None
                            else ""
                        )
                    elif ctype == "b":
                        val = "true" if raw == "1" else "false"
                    else:  # numeric
                        val = _num_to_str(raw) if raw else ""
                    cells.append(val)
                rows.append(cells)
                el.clear()
    return rows


def read_xlsx_repaired(
    path: str,
    *,
    sheet: int = 0,
    add_pk: bool = True,
    drop_empty_unknown: bool = True,
) -> tuple[ray.data.Dataset, list[str]]:
    """-> (Dataset of string columns, repaired header list) — the Excel
    twin of ``read_csv_repaired`` (S1): same header repair, ragged-row
    padding, empty-Unknown drop and content-hash PK (M2/M5/M6)."""
    rows = read_xlsx_rows(path, sheet=sheet)
    if not rows:
        raise ValueError(f"empty workbook sheet: {path}")
    headers = repair_headers([c.strip() for c in rows[0]])
    ncols = max(len(headers), max((len(r) for r in rows[1:]), default=0))
    while len(headers) < ncols:  # data wider than the header row
        headers = repair_headers(headers + [""])
    fixed = [(r + [""] * ncols)[:ncols] for r in rows[1:]]
    df = pd.DataFrame(fixed, columns=headers, dtype=str)

    if drop_empty_unknown:
        from knowledgegraphs_ray.rules.compiler import NULL_SENTINELS

        sentinels = {s.strip().lower() for s in NULL_SENTINELS} | {""}
        dead = [
            h
            for h in headers
            if h.startswith("Unknown_Header_")
            and df[h].str.strip().str.lower().isin(sentinels).all()
        ]
        if dead:
            df = df.drop(columns=dead)
            headers = [h for h in headers if h not in dead]

    if add_pk:
        import polars as pl

        joined = df.astype(str).agg("\x1f".join, axis=1)
        df["PKCol"] = (
            pl.Series("r", joined.tolist()).hash(seed=42).to_pandas().astype(str)
        )
        headers = headers + ["PKCol"]

    # one workbook == one block (a zip part is not splittable); many-file
    # ingests parallelize per workbook via read_xlsx_dir
    return ray.data.from_pandas(df), headers


def read_xlsx_dir(paths: list[str], *, sheet: int = 0) -> ray.data.Dataset:
    """Many workbooks -> one Dataset, one read task per workbook (the
    per-file parallelism tier for bulk Excel drops). All workbooks must
    share a header row; rows gain a ``__source_file`` lineage column."""

    def load(batch: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for p in batch["path"]:
            rows = read_xlsx_rows(p, sheet=sheet)
            if not rows:
                continue
            headers = repair_headers([c.strip() for c in rows[0]])
            ncols = len(headers)
            fixed = [(r + [""] * ncols)[:ncols] for r in rows[1:]]
            f = pd.DataFrame(fixed, columns=headers, dtype=str)
            f["__source_file"] = p
            frames.append(f)
        if not frames:
            return pd.DataFrame({"__source_file": pd.Series([], dtype=str)})
        return pd.concat(frames, ignore_index=True)

    files = ray.data.from_items([{"path": p} for p in sorted(paths)])
    return files.map_batches(load, batch_format="pandas", batch_size=1)


# ---------------------------------------------------------------------------
# Minimal xlsx writer — used by tests/fixtures (and as an S2-adjacent sink
# for small report outputs). Emits a standards-compliant single-sheet
# workbook with a shared-string table, matching what the reader consumes.
# ---------------------------------------------------------------------------

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>
</Relationships>"""


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def _col_ref(idx: int) -> str:
    ref = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        ref = chr(ord("A") + rem) + ref
    return ref


def write_xlsx(path: str, rows: list[list[object]]) -> None:
    """rows (header first) -> single-sheet .xlsx. str -> shared string,
    int/float -> numeric cell, bool -> boolean cell, None -> gap."""
    sst: dict[str, int] = {}
    body: list[str] = []
    for rix, row in enumerate(rows, start=1):
        cells = []
        for cix, val in enumerate(row):
            if val is None:
                continue
            ref = f"{_col_ref(cix)}{rix}"
            if isinstance(val, bool):
                cells.append(f'<c r="{ref}" t="b"><v>{int(val)}</v></c>')
            elif isinstance(val, (int, float)):
                cells.append(f'<c r="{ref}"><v>{val}</v></c>')
            else:
                s = str(val)
                if s not in sst:
                    sst[s] = len(sst)
                cells.append(f'<c r="{ref}" t="s"><v>{sst[s]}</v></c>')
        body.append(f'<row r="{rix}">{"".join(cells)}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f'<sheetData>{"".join(body)}</sheetData></worksheet>'
    )
    items = "".join(
        f"<si><t xml:space=\"preserve\">{_xml_escape(s)}</t></si>" for s in sst
    )
    shared = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        f'count="{len(sst)}" uniqueCount="{len(sst)}">{items}</sst>'
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", _WORKBOOK)
        zf.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        zf.writestr("xl/sharedStrings.xml", shared)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
