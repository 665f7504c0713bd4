"""DICOM source (sources/dicom.py): synthesized explicit/implicit-VR-LE
files roundtrip through the from-scratch parser into DSON, feed the JSON
triple kernel, and the R11 broaden lookup lifts class pairs through the
hierarchy. Fixtures come from the module's own writer (no pydicom)."""

import json
import struct

import pandas as pd
import pytest
import ray

from knowledgegraphs_ray.rules.hierarchy import Hierarchy
from knowledgegraphs_ray.sources.dicom import (
    EXPLICIT_VR_LE,
    IMPLICIT_VR_LE,
    TagDictionary,
    broaden_pair,
    collect_tag_dictionary,
    convert_for_time,
    dicom_to_triples,
    parse_dicom,
    read_dicom,
    replace_tags_with_names,
    split_camel_case,
    write_dicom,
)

ELEMENTS = {
    (0x0008, 0x0016, "UI"): "1.2.840.10008.5.1.4.1.1.2",
    (0x0008, 0x0020, "DA"): "20240131",
    (0x0008, 0x0030, "TM"): "142530",
    (0x0008, 0x002A, "DT"): "20240131142530.250000",
    (0x0008, 0x0060, "CS"): "CT",
    (0x0010, 0x0010, "PN"): "DOE^JANE",
    (0x0010, 0x0020, "LO"): "P001",
    (0x0028, 0x0010, "US"): 512,
    (0x0028, 0x0011, "US"): 512,
    (0x0008, 0x1110, "SQ"): [
        {
            (0x0008, 0x1150, "UI"): "1.2.840.10008.3.1.2.3.1",
            (0x0008, 0x1155, "UI"): "9.9.9.1",
        },
        {(0x0008, 0x1155, "UI"): "9.9.9.2"},
    ],
    (0x7FE0, 0x0010, "OW"): b"\x01\x02\x03\x04\x05\x06",
}


def test_parse_explicit_vr_roundtrip():
    buf = write_dicom(ELEMENTS)
    tags = TagDictionary()
    dson = parse_dicom(buf, tags)
    body = dson["DICOMObject"]
    assert body["(0008,0060)"] == "CT"
    assert body["(0010,0010)"] == "DOE^JANE"
    # DA / TM / DT converted to XSD forms (DICOMUtil.parseForTime parity)
    assert body["(0008,0020)"] == "2024-01-31"
    assert body["(0008,0030)"] == "14:25:30"
    assert body["(0008,002A)"] == "2024-01-31T14:25:30.25"
    # integers decoded, pixel payload summarized not materialized
    assert body["(0028,0010)"] == 512
    assert body["(7FE0,0010)"] == "<6 bytes>"
    # nested sequence -> array of objects
    sq = body["(0008,1110)"]
    assert [item.get("(0008,1155)") for item in sq] == ["9.9.9.1", "9.9.9.2"]
    # tag dictionary harvested names, VRs and XSD types
    assert tags.element_name("(0010,0010)") == "Patient Name"
    assert tags.xsd_datatype("(0008,0020)") == "xsd:date"
    assert tags.xsd_datatype("(0028,0010)") == "xsd:unsignedShort"


def test_parse_implicit_vr_and_unknown_tags():
    # implicit: no VR bytes, 4-byte lengths; VR resolved from the standard
    # dictionary, private tags fall back to UN
    def imp(group, elem, raw):
        return struct.pack("<HHI", group, elem, len(raw)) + raw

    buf = (
        imp(0x0008, 0x0060, b"MR")
        + imp(0x0010, 0x0020, b"P002")
        + imp(0x0009, 0x0001, b"\xde\xad")  # private tag
    )
    # no preamble, no meta group: parser must still cope (raw data set
    # with implicit VR is detected by the absent meta group + caller)
    full = write_dicom({}, preamble=True)  # meta says explicit...
    tags = TagDictionary()
    dson = parse_dicom(
        full[: len(full) - 0]  # meta-only file parses to empty body
    )
    assert dson["DICOMObject"] == {}
    # now a proper implicit file: meta group advertises implicit VR LE
    meta_body = (
        struct.pack("<HH", 0x0002, 0x0010)
        + b"UI"
        + struct.pack("<H", len(IMPLICIT_VR_LE) + 1)
        + IMPLICIT_VR_LE.encode()
        + b"\x00"
    )
    meta = (
        struct.pack("<HH", 0x0002, 0x0000)
        + b"UL"
        + struct.pack("<H", 4)
        + struct.pack("<I", len(meta_body))
        + meta_body
    )
    buf2 = b"\x00" * 128 + b"DICM" + meta + buf
    dson2 = parse_dicom(buf2, tags)
    body = dson2["DICOMObject"]
    assert body["(0008,0060)"] == "MR"
    assert body["(0010,0020)"] == "P002"
    assert body["(0009,0001)"] == "<2 bytes>"  # UN -> summarized
    assert tags.element_name("(0009,0001)") == "Unknown Tag and Data"


def test_undefined_length_sequence():
    # hand-encode an SQ with undefined length + item with undefined length
    inner = (
        struct.pack("<HH", 0x0008, 0x1155)
        + b"UI"
        + struct.pack("<H", 8)
        + b"9.9.9.3\x00"
    )
    item = (
        struct.pack("<HHI", 0xFFFE, 0xE000, 0xFFFFFFFF)
        + inner
        + struct.pack("<HHI", 0xFFFE, 0xE00D, 0)
    )
    sq = (
        struct.pack("<HH", 0x0008, 0x1110)
        + b"SQ\x00\x00"
        + struct.pack("<I", 0xFFFFFFFF)
        + item
        + struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)
    )
    dson = parse_dicom(sq)
    assert dson["DICOMObject"]["(0008,1110)"] == [{"(0008,1155)": "9.9.9.3"}]


def test_time_conversion_fallthrough_and_names():
    assert convert_for_time("not-a-date", "DA") == "not-a-date"
    assert convert_for_time("20240229", "DA") == "2024-02-29"
    assert split_camel_case("PatientBirthDate") == "Patient Birth Date"
    td = TagDictionary()
    td.put("(0010,0010)", "PatientName", "PN")
    assert (
        replace_tags_with_names("value of (0010,0010) here", td)
        == "value of Patient Name here"
    )


def test_read_dicom_to_triples(tmp_path):
    d = tmp_path / "dcm"
    d.mkdir()
    (d / "a.dcm").write_bytes(write_dicom(ELEMENTS))
    (d / "b.dcm").write_bytes(
        write_dicom({(0x0010, 0x0020, "LO"): "P003", (0x0008, 0x0060, "CS"): "US"})
    )
    (d / "broken.dcm").write_bytes(b"\x00" * 10)  # skipped, not fatal
    ds = read_dicom(str(d))
    rows = ds.to_pandas().sort_values("path").reset_index(drop=True)
    assert len(rows) == 2
    dson = json.loads(rows.loc[0, "dson"])
    assert dson["DICOMObject"]["(0010,0020)"] == "P001"
    triples = dicom_to_triples(ds).to_pandas()
    assert len(triples) > 0
    # the modality literal flows through the shared JSON kernel
    assert (triples["obj"] == "CT").any()
    td = collect_tag_dictionary(str(d))
    assert td.element_name("(0008,0060)") == "Modality"


def _h():
    # Patient -> ClinicalSubject -> InformationEntity
    return Hierarchy.build(
        [
            ("Patient", "ClinicalSubject"),
            ("ClinicalSubject", "InformationEntity"),
            ("Study", "InformationEntity"),
        ]
    )


def test_broaden_pair_reuses_ontology_property():
    h = _h()
    props = pd.DataFrame(
        [{"prop": "hasInformationEntity", "domain": "InformationEntity",
          "range": "InformationEntity"}]
    )
    d, p, r, sub = broaden_pair(h, "Patient", "Study", obj_props=props)
    assert (d, p, r) == ("InformationEntity", "hasInformationEntity",
                         "InformationEntity")
    assert sub == {"Patient": "InformationEntity", "Study": "InformationEntity"}


def test_broaden_pair_mints_when_no_match():
    h = _h()
    d, p, r, sub = broaden_pair(h, "Patient", "Series", obj_props=None)
    # only the domain lifts (range unknown to the hierarchy)
    assert (d, r) == ("InformationEntity", "Series")
    assert p == "p_InformationEntity_Series"
    assert sub == {"Patient": "InformationEntity"}


# --- property: writer -> parser roundtrip over random element sets ----------

from hypothesis import given, settings
from hypothesis import strategies as st

_ASCII = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789^_-"
_str_val = st.text(alphabet=_ASCII, min_size=1, max_size=24)


@st.composite
def _elements(draw):
    els = {}
    # string VRs on distinct private-group tags (keyword table not needed)
    for i, vr in enumerate(draw(st.lists(
        st.sampled_from(["LO", "SH", "CS", "PN", "UI", "LT"]),
        min_size=1, max_size=5,
    ))):
        els[(0x0011, 0x1000 + i, vr)] = draw(_str_val)
    if draw(st.booleans()):
        els[(0x0011, 0x2000, "US")] = draw(st.integers(0, 0xFFFF))
    if draw(st.booleans()):
        els[(0x0011, 0x2001, "SL")] = draw(st.integers(-(2**31), 2**31 - 1))
    if draw(st.booleans()):
        els[(0x0011, 0x2002, "FD")] = draw(
            st.floats(allow_nan=False, allow_infinity=False, width=64)
        )
    if draw(st.booleans()):
        d = draw(st.dates())
        els[(0x0011, 0x2003, "DA")] = f"{d.year:04d}{d.month:02d}{d.day:02d}"
    if draw(st.booleans()):  # one nested sequence item
        els[(0x0011, 0x3000, "SQ")] = [
            {(0x0011, 0x3001, "LO"): draw(_str_val)}
        ]
    return els


@settings(max_examples=40, deadline=None)
@given(_elements())
def test_dicom_write_parse_roundtrip(els):
    from knowledgegraphs_ray.sources.dicom import (
        convert_for_time,
        parse_dicom,
        tag_code,
        write_dicom,
    )

    body = parse_dicom(write_dicom(els))["DICOMObject"]
    for (g, e, vr), val in els.items():
        got = body[tag_code(g, e)]
        if vr == "SQ":
            inner_key = tag_code(0x0011, 0x3001)
            assert got == [
                {inner_key: v for (_, _, _), v in item.items()}
                for item in val
            ]
        elif vr in ("US", "SL"):
            assert got == val
        elif vr == "FD":
            assert got == val  # 8-byte LE double: exact
        elif vr == "DA":
            assert got == convert_for_time(val, "DA")
        else:
            assert got == val
