"""DICOM source (S5 DICOM->DSON, R11 DSON broaden) — a from-scratch
parser of the public DICOM file format (PS3.10 file meta + PS3.5 data-set
encoding), no dcm4che/pydicom.

Reference parity (`DICOM2SediJSON.java:83-230`, `DICOMUtil.java:74-120`,
`TagDictionary.java`, `DSON2OWL.java:31-98`), mechanism re-expressed:

* Each ``.dcm`` file parses to a **DSON** JSON object keyed by tag code
  ``(GGGG,EEEE)``; SQ sequences become arrays of nested objects; DA/DT/TM
  values convert to XSD date / dateTime / time forms exactly as
  ``DICOMUtil.parseForTime`` does (unparseable values pass through).
  The reference additionally groups tags under SEDI information-entity
  classes resolved from its medical ontology; without SEDI the DSON root
  is the flat ``{"DICOMObject": {...}}`` container and grouping is the
  downstream ontology's concern (see :func:`broaden_pair`).
* A **tag dictionary** accumulates (tagCode, camel-split name, VR,
  XSD datatype) per parsed tag — ``TagDictionary.java`` — and
  :func:`replace_tags_with_names` rewrites tag codes in strings.
* **R11 broaden**: :func:`broaden_pair` lifts a (domain, range) class
  pair to their top superclasses in a provided
  :class:`~knowledgegraphs_ray.rules.hierarchy.Hierarchy` and reuses an
  ontology object property whose rdfs:domain/range match, else mints
  ``p_<domain>_<range>`` — recording key-isSubclassOf-value pairs.

Ray Data shape: file parsing is an embarrassingly parallel
``read_binary_files -> map_batches`` (one task per file batch; no state,
no shuffle); the DSON column then feeds the existing JSON->triples kernel
(:mod:`knowledgegraphs_ray.sources.json`), so DICOM inherits every
downstream rule (R9/R10) unchanged. Pixel/bulk data (OB/OW/OF/UN) is
summarized as ``<N bytes>`` instead of materialized — at 100 TB the bulk
payload stays in object storage and only the metadata (~KBs/file) flows.
"""

from __future__ import annotations

import json
import re
import struct
from dataclasses import dataclass, field

import pandas as pd
import ray
import ray.data

# --- public-standard tag keywords (PS3.6 subset; extend as needed) ---------

TAG_KEYWORDS: dict[tuple[int, int], tuple[str, str]] = {
    (0x0002, 0x0001): ("FileMetaInformationVersion", "OB"),
    (0x0002, 0x0002): ("MediaStorageSOPClassUID", "UI"),
    (0x0002, 0x0003): ("MediaStorageSOPInstanceUID", "UI"),
    (0x0002, 0x0010): ("TransferSyntaxUID", "UI"),
    (0x0002, 0x0012): ("ImplementationClassUID", "UI"),
    (0x0008, 0x0016): ("SOPClassUID", "UI"),
    (0x0008, 0x0018): ("SOPInstanceUID", "UI"),
    (0x0008, 0x0020): ("StudyDate", "DA"),
    (0x0008, 0x0030): ("StudyTime", "TM"),
    (0x0008, 0x002A): ("AcquisitionDateTime", "DT"),
    (0x0008, 0x0050): ("AccessionNumber", "SH"),
    (0x0008, 0x0060): ("Modality", "CS"),
    (0x0008, 0x0070): ("Manufacturer", "LO"),
    (0x0008, 0x0090): ("ReferringPhysicianName", "PN"),
    (0x0008, 0x103E): ("SeriesDescription", "LO"),
    (0x0008, 0x1110): ("ReferencedStudySequence", "SQ"),
    (0x0008, 0x1150): ("ReferencedSOPClassUID", "UI"),
    (0x0008, 0x1155): ("ReferencedSOPInstanceUID", "UI"),
    (0x0010, 0x0010): ("PatientName", "PN"),
    (0x0010, 0x0020): ("PatientID", "LO"),
    (0x0010, 0x0030): ("PatientBirthDate", "DA"),
    (0x0010, 0x0040): ("PatientSex", "CS"),
    (0x0010, 0x1010): ("PatientAge", "AS"),
    (0x0018, 0x0015): ("BodyPartExamined", "CS"),
    (0x0018, 0x0050): ("SliceThickness", "DS"),
    (0x0020, 0x000D): ("StudyInstanceUID", "UI"),
    (0x0020, 0x000E): ("SeriesInstanceUID", "UI"),
    (0x0020, 0x0011): ("SeriesNumber", "IS"),
    (0x0020, 0x0013): ("InstanceNumber", "IS"),
    (0x0028, 0x0002): ("SamplesPerPixel", "US"),
    (0x0028, 0x0010): ("Rows", "US"),
    (0x0028, 0x0011): ("Columns", "US"),
    (0x0028, 0x0100): ("BitsAllocated", "US"),
    (0x7FE0, 0x0010): ("PixelData", "OW"),
}

_VR2XSD = {
    **{v: "xsd:string" for v in (
        "AE AS AT CS DS IS LO LT PN SH ST UI OB OW OF SQ UT UN".split()
    )},
    "FL": "xsd:float", "FD": "xsd:double",
    "SL": "xsd:long", "UL": "xsd:unsignedLong",
    "SS": "xsd:short", "US": "xsd:unsignedShort",
    "DA": "xsd:date", "DT": "xsd:dateTime", "TM": "xsd:time",
}

# VRs using the 4-byte length form after 2 reserved bytes (explicit VR)
_LONG_VRS = {"OB", "OW", "OF", "SQ", "UT", "UN"}
_BINARY_VRS = {"OB", "OW", "OF", "UN"}
_UNKNOWN = "Unknown Tag and Data"

EXPLICIT_VR_LE = "1.2.840.10008.1.2.1"
IMPLICIT_VR_LE = "1.2.840.10008.1.2"


def tag_code(group: int, elem: int) -> str:
    return f"({group:04X},{elem:04X})"


def split_camel_case(name: str) -> str:
    """``TagDictionary.splitCamelCase`` twin: PatientBirthDate ->
    'Patient Birth Date'."""
    return " ".join(re.findall(r"[A-Z]?[a-z]+|[A-Z]+(?=[A-Z]|$)", name))


def convert_for_time(value: str, vr: str) -> str:
    """``DICOMUtil.parseForTime`` twin — DA/DT/TM to XSD string forms;
    anything unparseable passes through unchanged."""
    try:
        if vr == "DA":
            v = value.strip()
            return f"{int(v[0:4]):04d}-{int(v[4:6]):02d}-{int(v[6:8]):02d}"
        if vr == "DT":
            v = value.strip()
            date = f"{int(v[0:4]):04d}-{int(v[4:6]):02d}-{int(v[6:8]):02d}"
            time = f"{int(v[8:10]):02d}:{int(v[10:12]):02d}:{int(v[12:14]):02d}"
            frac = ""
            if "." in v:
                frac = "." + v.split(".", 1)[1].rstrip("0 ")
                frac = "" if frac == "." else frac
            return f"{date}T{time}{frac}"
        if vr == "TM":
            v = value.strip()
            return f"{int(v[0:2]):02d}:{int(v[2:4]):02d}:{int(v[4:6]):02d}"
    except (ValueError, IndexError):
        pass
    return value


@dataclass
class TagDictionary:
    """tagCode -> (name split camel-case, vr, xsd type); first VR wins."""

    entries: dict[str, tuple[str, str, str]] = field(default_factory=dict)

    def put(self, code: str, name: str, vr: str) -> None:
        if code not in self.entries:
            self.entries[code] = (
                split_camel_case(name) if name != _UNKNOWN else name,
                vr,
                _VR2XSD.get(vr, "xsd:string"),
            )

    def element_name(self, code: str) -> str | None:
        e = self.entries.get(code)
        return e[0] if e else None

    def xsd_datatype(self, code: str) -> str | None:
        e = self.entries.get(code)
        return e[2] if e else None

    def merge(self, other: "TagDictionary") -> None:
        for c, (n, v, _) in other.entries.items():
            self.put(c, n.replace(" ", ""), v)

    def to_pandas(self) -> pd.DataFrame:
        rows = [
            {"tag_code": c, "name": n, "vr": v, "xsd": x}
            for c, (n, v, x) in sorted(self.entries.items())
        ]
        return pd.DataFrame(rows, columns=["tag_code", "name", "vr", "xsd"])


def replace_tags_with_names(text: str, tags: TagDictionary) -> str:
    """``DICOMUtil.replaceTagsWithNames`` twin."""
    def sub(m: re.Match) -> str:
        return tags.element_name(m.group(0)) or m.group(0)

    return re.sub(r"\(.*?\)", sub, text)


# --- binary parser (PS3.10 preamble + PS3.5 explicit/implicit VR LE) --------


class _Reader:
    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def u16(self) -> int:
        v = struct.unpack_from("<H", self.buf, self.pos)[0]
        self.pos += 2
        return v

    def u32(self) -> int:
        v = struct.unpack_from("<I", self.buf, self.pos)[0]
        self.pos += 4
        return v

    def take(self, n: int) -> bytes:
        v = self.buf[self.pos : self.pos + n]
        self.pos += n
        return v

    def eof(self) -> bool:
        return self.pos >= len(self.buf)


def _decode_value(vr: str, raw: bytes) -> object:
    if vr in _BINARY_VRS:
        return f"<{len(raw)} bytes>"
    if vr == "US":
        return struct.unpack("<H", raw)[0] if len(raw) == 2 else None
    if vr == "SS":
        return struct.unpack("<h", raw)[0] if len(raw) == 2 else None
    if vr == "UL":
        return struct.unpack("<I", raw)[0] if len(raw) == 4 else None
    if vr == "SL":
        return struct.unpack("<i", raw)[0] if len(raw) == 4 else None
    if vr == "FL":
        return struct.unpack("<f", raw)[0] if len(raw) == 4 else None
    if vr == "FD":
        return struct.unpack("<d", raw)[0] if len(raw) == 8 else None
    # string VRs: latin-1, strip the even-length pad (space / NUL)
    s = raw.decode("latin-1", errors="replace").rstrip("\x00 ")
    return convert_for_time(s, vr)


def _parse_elements(
    r: _Reader, *, explicit: bool, stop_at: int, tags: TagDictionary
) -> dict:
    """One data-set (or SQ item) level -> ordered tag-code dict."""
    out: dict[str, object] = {}
    while r.pos < stop_at and not r.eof():
        group = r.u16()
        elem = r.u16()
        if (group, elem) == (0xFFFE, 0xE00D) or (group, elem) == (0xFFFE, 0xE0DD):
            r.u32()  # item/sequence delimitation length (always 0)
            break
        code = tag_code(group, elem)
        name, dict_vr = TAG_KEYWORDS.get((group, elem), (_UNKNOWN, "UN"))
        if explicit:
            vr = r.take(2).decode("ascii", errors="replace")
            if vr in _LONG_VRS:
                r.take(2)  # reserved
                length = r.u32()
            else:
                length = r.u16()
        else:
            vr = dict_vr
            length = r.u32()
        tags.put(code, name, vr)
        if vr == "SQ":
            items: list[dict] = []
            sq_end = len(r.buf) if length == 0xFFFFFFFF else r.pos + length
            while r.pos < sq_end and not r.eof():
                ig, ie = r.u16(), r.u16()
                if (ig, ie) == (0xFFFE, 0xE0DD):  # sequence delimitation
                    r.u32()
                    break
                if (ig, ie) != (0xFFFE, 0xE000):  # not an item tag: bail
                    r.pos -= 4
                    break
                ilen = r.u32()
                iend = len(r.buf) if ilen == 0xFFFFFFFF else r.pos + ilen
                items.append(
                    _parse_elements(r, explicit=explicit, stop_at=iend, tags=tags)
                )
            out[code] = items
        else:
            raw = r.take(length)
            out[code] = _decode_value(vr, raw)
    return out


def parse_dicom(buf: bytes, tags: TagDictionary | None = None) -> dict:
    """One ``.dcm`` byte string -> DSON dict ``{"DICOMObject": {...}}``.

    Handles the PS3.10 preamble+DICM magic, the explicit-VR-LE file meta
    group, and explicit/implicit VR little-endian data sets with nested
    (defined- or undefined-length) sequences.
    """
    tags = tags if tags is not None else TagDictionary()
    r = _Reader(buf)
    if len(buf) >= 132 and buf[128:132] == b"DICM":
        r.pos = 132
    # file meta group (0002,xxxx) is always explicit VR LE; its group
    # length element bounds it
    transfer = EXPLICIT_VR_LE
    if len(buf) >= r.pos + 8 and struct.unpack_from("<H", buf, r.pos)[0] == 0x0002:
        meta = _parse_elements(
            r, explicit=True, stop_at=_meta_end(r), tags=tags
        )
        transfer = str(meta.get(tag_code(0x0002, 0x0010), EXPLICIT_VR_LE))
    body = _parse_elements(
        r,
        explicit=(transfer != IMPLICIT_VR_LE),
        stop_at=len(buf),
        tags=tags,
    )
    return {"DICOMObject": body}


def _meta_end(r: _Reader) -> int:
    """Peek the (0002,0000) FileMetaInformationGroupLength element to find
    where the meta group ends; fall back to scanning until group != 2."""
    save = r.pos
    group = r.u16()
    elem = r.u16()
    if (group, elem) == (0x0002, 0x0000):
        r.take(2)  # "UL"
        r.u16()  # length (4)
        glen = r.u32()
        end = r.pos + glen
        r.pos = save
        return end
    r.pos = save
    # no group-length element: scan elements until the group changes
    probe = _Reader(r.buf, r.pos)
    while not probe.eof():
        start = probe.pos
        g = probe.u16()
        probe.u16()
        if g != 0x0002:
            return start
        vr = probe.take(2).decode("ascii", errors="replace")
        if vr in _LONG_VRS:
            probe.take(2)
            probe.pos += probe.u32()
        else:
            probe.pos += probe.u16()
    return probe.pos


# --- fixture writer (explicit VR LE, defined lengths) ------------------------


def _encode_value(vr: str, value: object) -> bytes:
    if vr == "US":
        return struct.pack("<H", int(value))
    if vr == "SS":
        return struct.pack("<h", int(value))
    if vr == "UL":
        return struct.pack("<I", int(value))
    if vr == "SL":
        return struct.pack("<i", int(value))
    if vr == "FL":
        return struct.pack("<f", float(value))
    if vr == "FD":
        return struct.pack("<d", float(value))
    if isinstance(value, bytes):
        raw = value
    else:
        raw = str(value).encode("latin-1")
    if len(raw) % 2:
        raw += b"\x00" if vr in ("UI",) or vr in _BINARY_VRS else b" "
    return raw


def _encode_element(group: int, elem: int, vr: str, value: object) -> bytes:
    head = struct.pack("<HH", group, elem)
    if vr == "SQ":
        body = b""
        for item in value:  # list of dicts {(g,e,vr): value}
            ibody = b"".join(
                _encode_element(g, e, v, val) for (g, e, v), val in item.items()
            )
            body += struct.pack("<HHI", 0xFFFE, 0xE000, len(ibody)) + ibody
        return head + b"SQ" + b"\x00\x00" + struct.pack("<I", len(body)) + body
    raw = _encode_value(vr, value)
    if vr in _LONG_VRS:
        return head + vr.encode() + b"\x00\x00" + struct.pack("<I", len(raw)) + raw
    return head + vr.encode() + struct.pack("<H", len(raw)) + raw


def write_dicom(elements: dict, *, preamble: bool = True) -> bytes:
    """Synthesize an explicit-VR-LE ``.dcm`` byte string for tests.
    ``elements``: {(group, elem, vr): value}; SQ values are lists of dicts
    in the same shape."""
    body = b"".join(
        _encode_element(g, e, v, val) for (g, e, v), val in elements.items()
    )
    meta_body = _encode_element(0x0002, 0x0010, "UI", EXPLICIT_VR_LE)
    # (0002,0000) group length counts ONLY the bytes after itself
    meta = _encode_element(0x0002, 0x0000, "UL", len(meta_body)) + meta_body
    out = meta + body
    if preamble:
        out = b"\x00" * 128 + b"DICM" + out
    return out


# --- Ray Data stages ---------------------------------------------------------


def read_dicom(path: str) -> ray.data.Dataset:
    """Directory/file of ``.dcm`` -> rows (path, dson JSON string).
    Parsing is stateless and per-file; pixel payloads are summarized, so
    a row is metadata-sized regardless of image size."""
    files = ray.data.read_binary_files(path, include_paths=True)

    def block(batch: pd.DataFrame) -> pd.DataFrame:
        out = {"path": [], "dson": []}
        for p, b in zip(batch["path"], batch["bytes"]):
            try:
                dson = parse_dicom(bytes(b))
            except (struct.error, IndexError, ValueError):
                continue  # unparseable file: skip, matching the reference's
                # per-file try/catch (DICOM2SediJSON.java:102)
            out["path"].append(p)
            out["dson"].append(json.dumps(dson, sort_keys=True))
        return pd.DataFrame(out, columns=["path", "dson"])

    return files.map_batches(block, batch_format="pandas")


def dicom_to_triples(ds: ray.data.Dataset) -> ray.data.Dataset:
    """DSON rows -> (subj, pred, obj) via the shared JSON kernel (R9/R10
    apply unchanged — the reference funnels DSON into JSON2OWL the same
    way)."""
    from knowledgegraphs_ray.sources.json import json_to_triples

    return json_to_triples(ds, id_col="path", json_col="dson")


def collect_tag_dictionary(path: str) -> TagDictionary:
    """Distributed tag harvest: per-file dictionaries merge into one
    (tagCode, name, vr, xsd) table — vocabulary-sized (~4k standard tags
    max), so the driver merge is bounded."""
    files = ray.data.read_binary_files(path)

    def block(batch: pd.DataFrame) -> pd.DataFrame:
        tags = TagDictionary()
        for b in batch["bytes"]:
            try:
                parse_dicom(bytes(b), tags)
            except (struct.error, IndexError, ValueError):
                continue
        return tags.to_pandas()

    harvested = files.map_batches(block, batch_format="pandas").to_pandas()
    # first-wins per tag (block order is preserved by map_batches), deduped
    # BEFORE the driver loop so it runs over the ~4k-tag vocabulary, not
    # num_blocks x vocab rows
    harvested = harvested.drop_duplicates("tag_code", keep="first")
    merged = TagDictionary()
    for row in harvested.itertuples():
        merged.put(row.tag_code, row.name.replace(" ", ""), row.vr)
    return merged


# --- R11: DSON broaden (DSON2OWL.getBroaderResources) ------------------------


def broaden_pair(
    hierarchy,
    domain: str,
    range_: str,
    *,
    obj_props: pd.DataFrame | None = None,
) -> tuple[str, str, str, dict[str, str]]:
    """Lift (domain, range) to their TOP superclasses in ``hierarchy``
    (rules/hierarchy.Hierarchy) and reuse an ontology object property
    whose rdfs:domain/range match the lifted pair; else mint
    ``p_<domain>_<range>``. Returns (domain, prop, range,
    key_isSubclassOf_value) — `DSON2OWL.java:47-88` parity.

    ``obj_props``: DataFrame (prop, domain, range) of ontology object
    properties; None means no reuse lookup.
    """
    sub_of: dict[str, str] = {}

    def top(cls: str) -> str | None:
        # deepest ancestor = the top superclass (sedi.getTopSuperclass);
        # ties break lexicographically for determinism
        anc = {
            a: d for a, d in hierarchy.ancestors(cls).items() if a != cls
        }
        if not anc:
            return None
        return min(anc.items(), key=lambda kv: (-kv[1], kv[0]))[0]

    d_top, r_top = top(domain), top(range_)
    prop = None
    d_out, r_out = domain, range_
    if d_top is not None and r_top is not None and obj_props is not None:
        hit = obj_props[
            (obj_props["domain"] == d_top) & (obj_props["range"] == r_top)
        ]
        if len(hit):
            prop = str(hit.iloc[0]["prop"])
            d_out, r_out = d_top, r_top
            sub_of[domain] = d_top
            sub_of[range_] = r_top
    if prop is None:
        if d_top is not None:
            d_out = d_top
            sub_of[domain] = d_top
        elif r_top is not None:
            r_out = r_top
            sub_of[range_] = r_top
        prop = f"p_{d_out}_{r_out}"
    return d_out, prop, r_out, sub_of
