"""Excel reader (S2) — stdlib xlsx roundtrip + parity with the CSV path.

Reference semantics: TabularFilesReader.java:115-154 (sheet 0, POI cell
stringification NUMERIC->String.valueOf(double), BOOLEAN->true/false,
gaps empty) feeding the same header-repair pipeline as CSV.
"""

import pandas as pd

from knowledgegraphs_ray.sources.csv import read_csv_repaired
from knowledgegraphs_ray.sources.excel import (
    _col_ref,
    _num_to_str,
    read_xlsx_dir,
    read_xlsx_repaired,
    read_xlsx_rows,
    write_xlsx,
)


def test_col_ref_roundtrip():
    from knowledgegraphs_ray.sources.excel import _col_index

    for i, ref in [(0, "A"), (25, "Z"), (26, "AA"), (27, "AB"), (701, "ZZ"), (702, "AAA")]:
        assert _col_ref(i) == ref
        assert _col_index(ref + "1") == i


def test_numeric_stringification_java_parity():
    # POI getNumericCellValue -> String.valueOf(double): integral gets .0
    assert _num_to_str("1") == "1.0"
    assert _num_to_str("30") == "30.0"
    assert _num_to_str("2.5") == "2.5"
    assert _num_to_str("-4") == "-4.0"


def test_write_read_roundtrip(tmp_path):
    p = str(tmp_path / "t.xlsx")
    rows = [
        ["id", "name", "score", "active", "note"],
        [1, "Ann", 1.5, True, "hello <&> world"],
        [2, "Bob", 2.0, False, None],  # None -> gap cell
        [3, "Cid & co", -4, True, "x"],
    ]
    write_xlsx(p, rows)
    got = read_xlsx_rows(p)
    assert got[0] == ["id", "name", "score", "active", "note"]
    assert got[1] == ["1.0", "Ann", "1.5", "true", "hello <&> world"]
    # gap cell materializes as empty only if a later cell exists in the row;
    # trailing gaps stay ragged (padded downstream, like ragged CSV rows)
    assert got[2] == ["2.0", "Bob", "2.0", "false"]
    assert got[3] == ["3.0", "Cid & co", "-4.0", "true", "x"]


def test_interior_gap_becomes_empty(tmp_path):
    p = str(tmp_path / "g.xlsx")
    write_xlsx(p, [["a", "b", "c"], ["x", None, "z"]])
    assert read_xlsx_rows(p)[1] == ["x", "", "z"]


def test_read_xlsx_repaired_matches_csv_path(tmp_path, ray_session):
    # same logical table through both readers (string cells so the cell
    # values are identical) -> identical repaired output incl. content PK
    header = ["person_id", "name", "balance", ""]
    data = [["1", "Ann", "1.5", ""], ["2", "Bob", "2", ""], ["3", "Cid", "1,5", ""]]

    csv_path = tmp_path / "p.csv"
    csv_path.write_text(
        "person_id,name,balance,\n"
        + "\n".join(",".join(f'"{c}"' if "," in c else c for c in r) for r in data)
        + "\n"
    )
    xlsx_path = str(tmp_path / "p.xlsx")
    write_xlsx(xlsx_path, [header] + data)

    ds_c, h_c = read_csv_repaired(str(csv_path), add_pk=True)
    ds_x, h_x = read_xlsx_repaired(xlsx_path, add_pk=True)
    assert h_c == h_x  # Unknown_Header_1 dropped in both, PKCol appended
    df_c = ds_c.to_pandas().sort_values("person_id").reset_index(drop=True)
    df_x = ds_x.to_pandas().sort_values("person_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(df_c, df_x)


def test_read_xlsx_dir_lineage(tmp_path, ray_session):
    for name, rows in [
        ("a.xlsx", [["id", "v"], ["1", "x"]]),
        ("b.xlsx", [["id", "v"], ["2", "y"], ["3", "z"]]),
    ]:
        write_xlsx(str(tmp_path / name), rows)
    ds = read_xlsx_dir([str(tmp_path / "a.xlsx"), str(tmp_path / "b.xlsx")])
    df = ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert len(df) == 3
    assert df["v"].tolist() == ["x", "y", "z"]
    assert df["__source_file"].str.endswith("a.xlsx").sum() == 1
    assert df["__source_file"].str.endswith("b.xlsx").sum() == 2


def test_type_inference_over_xlsx(tmp_path, ray_session):
    from knowledgegraphs_ray.schema.infer import infer_column_types

    p = str(tmp_path / "n.xlsx")
    write_xlsx(
        p,
        [
            ["id", "score", "flag", "label"],
            [1, 1.5, True, "a"],
            [2, 2.25, False, "b"],
        ],
    )
    ds, _ = read_xlsx_repaired(p, add_pk=False)
    types = infer_column_types(ds)
    # POI stringification makes ints "1.0" -> inferred double (reference
    # behaves the same: numeric cells always surface as doubles)
    assert types["id"] == "double"
    assert types["score"] == "double"
    assert types["flag"] == "bool"
    assert types["label"] == "varchar"
