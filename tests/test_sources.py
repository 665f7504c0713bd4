"""CSV repair, type inference, JSON flatten/triples — FIXTURES.md F2/F3."""

import json

import pandas as pd
import pyarrow as pa
import ray.data

from knowledgegraphs_ray.schema.infer import (
    cast_with_types,
    infer_column_types,
    normalize_date_series,
)
from knowledgegraphs_ray.sources.csv import detect_delimiter, read_csv_repaired, repair_headers
from knowledgegraphs_ray.sources.json import (
    flatten_record,
    infer_json_schema,
    json_doc_triples,
    json_to_triples,
)

PERSON_JSON = {
    "person": {
        "name": "John Doe",
        "age": 30,
        "city": "New York",
        "languages": ["English", "Spanish", "French"],
        "address": {"street": "123 Main St", "city": "New York", "state": "NY"},
        "friends": [
            {"name": "Jane Smith", "age": 28, "city": "Los Angeles"},
            {"name": "Bob Johnson", "age": 32, "city": "Chicago"},
        ],
        "status": "active",
        "registered": True,
        "lastLogin": None,
    }
}


def test_detect_delimiter():
    assert detect_delimiter("a;b;c") == ";"
    assert detect_delimiter("a\tb\tc") == "\t"
    assert detect_delimiter("col_one,col_two") == ","


def test_repair_headers():
    assert repair_headers(["a", "", "a", "b"]) == ["a", "Unknown_Header_1", "a_2", "b"]


def _person_csv(tmp_path):
    p = tmp_path / "person.csv"
    p.write_text(
        "person_id,name,birth_date,is_active,balance,account_id,\n"
        "1,Ann,1990-03-05,1,1.5,10,\n"
        "2,Bob,05/03/1990,0,2,20,\n"
        "3,Cid,1990.3,-,\"1,5\",30,\n"
    )
    return str(p)


def test_read_csv_repaired_f2(tmp_path):
    path = _person_csv(tmp_path)
    ds, headers = read_csv_repaired(path, add_pk=True)
    # empty trailing header became Unknown_Header_1 and was dropped (all empty)
    assert "Unknown_Header_1" not in headers
    assert headers[-1] == "PKCol"
    df = ds.to_pandas()
    assert len(df) == 3
    assert set(df["name"]) == {"Ann", "Bob", "Cid"}
    assert df["PKCol"].nunique() == 3


def test_type_inference_f2(tmp_path):
    path = _person_csv(tmp_path)
    ds, _ = read_csv_repaired(path, add_pk=False)
    # strip csv quoting artifact for the balance column
    ds = ds.map_batches(
        lambda df: df.assign(balance=df["balance"].str.strip('"')),
        batch_format="pandas",
    )
    types = infer_column_types(ds)
    assert types["person_id"] == "int"
    assert types["name"] == "varchar"
    assert types["birth_date"] == "timestamp"  # three different formats
    assert types["is_active"] == "bool"  # {0,1} with '-' null
    assert types["balance"] == "double"  # comma decimal "1,5"
    assert types["account_id"] == "int"

    cast = cast_with_types(ds, types).to_pandas().sort_values("person_id")
    assert cast["birth_date"].tolist() == ["1990-03-05", "1990-03-05", "1990-03-01"]
    assert cast["balance"].tolist() == [1.5, 2.0, 1.5]
    assert cast["is_active"].tolist()[0] is True or cast["is_active"].iloc[0] == True
    assert pd.isna(cast["is_active"].iloc[2])


def test_normalize_date_series():
    s = pd.Series(["1990-03-05", "05/03/1990", "1990.3", "nonsense"])
    out = normalize_date_series(s)
    assert out.tolist()[:3] == ["1990-03-05", "1990-03-05", "1990-03-01"]
    assert pd.isna(out.iloc[3])


def test_flatten_record_paths():
    rows = flatten_record({"a": {"b": [1, 2]}})
    paths = {p for p, _, _ in rows}
    assert "/root/a/b[0]" in paths and "/root/a/b[1]" in paths


def test_json_doc_triples_f3():
    trips = set(json_doc_triples("d1", PERSON_JSON))
    # root detection: single key 'person' with object value -> Person class
    assert ("kg:json/d1", "rdf:type", "kg:Person") in trips
    assert ("kg:json/d1", "kg:has_name", "John Doe") in trips
    assert ("kg:json/d1", "kg:has_age", "30") in trips
    # primitive array -> repeated data props
    langs = [o for s, p, o in trips if p == "kg:has_languages"]
    assert sorted(langs) == ["English", "French", "Spanish"]
    # nested object -> linked individual
    assert ("kg:json/d1", "kg:p_person_address", "kg:json/d1/address") in trips
    assert ("kg:json/d1/address", "rdf:type", "kg:Address") in trips
    # object array -> indexed individuals
    assert ("kg:json/d1", "kg:p_person_friends", "kg:json/d1/friends/0") in trips
    assert ("kg:json/d1/friends/1", "kg:has_name", "Bob Johnson") in trips
    # null -> no triple
    assert not any(p == "kg:has_lastLogin" for _, p, _ in trips)
    # booleans lexicalized
    assert ("kg:json/d1", "kg:has_registered", "true") in trips


def test_json_triples_deterministic():
    assert json_doc_triples("x", PERSON_JSON) == json_doc_triples("x", PERSON_JSON)


def test_json_to_triples_dataset():
    ds = ray.data.from_items(
        [{"id": 1, "doc": json.dumps(PERSON_JSON)}, {"id": 2, "doc": "not json"}]
    )
    out = json_to_triples(ds, id_col="id", json_col="doc").to_pandas()
    assert (out["subj"].str.startswith("kg:json/1")).all()  # bad doc skipped


def test_infer_json_schema_null_default():
    ds = ray.data.from_items(
        [
            {"doc": json.dumps({"a": None, "b": 1})},
            {"doc": json.dumps({"a": None, "b": 2})},
        ]
    )
    sch = infer_json_schema(ds, json_col="doc")
    m = dict(zip(sch["path"], sch["json_type"]))
    assert m["/root/a"] == "string"  # null-only path defaults to string
    assert m["/root/b"] == "int"
