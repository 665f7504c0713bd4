"""JSON document flattening + JSON -> triples kernel (M12, R9/R10, I3).

Reference: JSON2OWL.java:102-275 (root detection, property rules) and
InsertDataJSON.java:59-414 (recursive walk emitting individuals with global
per-class counters). Redesign: IRIs are pure functions of
(doc_id, JSON path, array indices) — ``kg:json/<doc>/a/0/b`` — instead of the
reference's mutable ``classCounter``/``indivCounter`` maps
(InsertDataJSON.java:33-52), so emission is idempotent and order-free.

Rules honored (JSON2OWL.java:162-275):
* nested object  -> child individual + ``p_<parent>_<key>`` link + class triple
* primitive      -> ``has_<key>`` data triple (null skipped)
* primitive array-> repeated data triples
* object array   -> repeated linked individuals (index in IRI)
* root detection -> single-key dict whose value is an object: that key names
  the root class; otherwise the default root class ``Record``.
"""

from __future__ import annotations

import json

import pandas as pd
import pyarrow as pa
import ray.data

KG = "kg:"


def _lit(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


def flatten_record(obj, path: str = "/root") -> list[tuple[str, str, str | None]]:
    """-> rows (path, json_type, value_str) — M12 path flattener."""
    rows: list[tuple[str, str, str | None]] = []
    if obj is None:
        rows.append((path, "null", None))
    elif isinstance(obj, dict):
        rows.append((path, "object", None))
        for k, v in obj.items():
            rows.extend(flatten_record(v, f"{path}/{k}"))
    elif isinstance(obj, list):
        rows.append((path, "array", None))
        for i, v in enumerate(obj):
            rows.extend(flatten_record(v, f"{path}[{i}]"))
    else:
        t = "bool" if isinstance(obj, bool) else (
            "int" if isinstance(obj, int) else ("double" if isinstance(obj, float) else "string")
        )
        rows.append((path, t, _lit(obj)))
    return rows


def _cls(key: str) -> str:
    return KG + key[:1].upper() + key[1:]


def json_doc_triples(doc_id: str, obj) -> list[tuple[str, str, str]]:
    """One document -> (subj, pred, obj) triples with deterministic IRIs."""
    triples: list[tuple[str, str, str]] = []
    root_iri = f"{KG}json/{doc_id}"

    # root detection (JSON2OWL.java:102-136)
    root_key = "record"
    if isinstance(obj, dict) and len(obj) == 1:
        k = next(iter(obj))
        if isinstance(obj[k], dict):
            root_key, obj = k, obj[k]
    triples.append((root_iri, "rdf:type", _cls(root_key)))

    def walk(iri: str, cls_key: str, o) -> None:
        if not isinstance(o, dict):
            return
        for k, v in o.items():
            if v is None:
                continue  # null -> no triple (range defaulted at schema level)
            if isinstance(v, dict):
                child = f"{iri}/{k}"
                triples.append((iri, f"{KG}p_{cls_key}_{k}", child))
                triples.append((child, "rdf:type", _cls(k)))
                walk(child, k, v)
            elif isinstance(v, list):
                for i, item in enumerate(v):
                    if item is None:
                        continue
                    if isinstance(item, dict):
                        child = f"{iri}/{k}/{i}"
                        triples.append((iri, f"{KG}p_{cls_key}_{k}", child))
                        triples.append((child, "rdf:type", _cls(k)))
                        walk(child, k, item)
                    elif isinstance(item, list):
                        # mixed/nested arrays degrade to string (JSON2OWL.java:179-198)
                        triples.append((iri, f"{KG}has_{k}", json.dumps(item)))
                    else:
                        triples.append((iri, f"{KG}has_{k}", _lit(item)))
            else:
                triples.append((iri, f"{KG}has_{k}", _lit(v)))

    walk(root_iri, root_key, obj)
    return triples


class JsonTripleKernel:
    """map_batches kernel: (id, json string) rows -> triple rows."""

    def __init__(self, *, id_col: str, json_col: str):
        self.id_col, self.json_col = id_col, json_col

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        ids = batch[self.id_col].to_pylist()
        docs = batch[self.json_col].to_pylist()
        rows = {"subj": [], "pred": [], "obj": []}
        for i, raw in zip(ids, docs):
            if raw is None:
                continue
            try:
                obj = json.loads(raw)
            except (json.JSONDecodeError, TypeError):
                continue
            for s, p, o in json_doc_triples(str(i), obj):
                rows["subj"].append(s)
                rows["pred"].append(p)
                rows["obj"].append(o)
        return pd.DataFrame(rows, dtype=str)


def json_to_triples(
    ds: ray.data.Dataset, *, id_col: str, json_col: str
) -> ray.data.Dataset:
    return ds.map_batches(
        JsonTripleKernel(id_col=id_col, json_col=json_col), batch_format="pyarrow"
    )


def infer_json_schema(ds: ray.data.Dataset, *, json_col: str) -> pd.DataFrame:
    """R9/R10 schema inference: union of (path, json_type) across documents
    (per-batch sets -> groupby count). Null-only paths default to string
    (JSON2OWL.java:265-275)."""

    def paths(batch: pa.Table) -> pd.DataFrame:
        seen: dict[tuple[str, str], int] = {}
        for raw in batch[json_col].to_pylist():
            if raw is None:
                continue
            try:
                obj = json.loads(raw)
            except (json.JSONDecodeError, TypeError):
                continue
            for p, t, _ in flatten_record(obj):
                seen[(p, t)] = seen.get((p, t), 0) + 1
        return pd.DataFrame(
            [{"path": p, "json_type": t, "n": n} for (p, t), n in seen.items()]
        )

    agg = ds.map_batches(paths, batch_format="pyarrow").groupby(
        ["path", "json_type"]
    ).sum("n").to_pandas()
    # resolve: drop 'null' rows when a typed row exists for the same path;
    # null-only -> string
    out = []
    for path, g in agg.groupby("path"):
        types = set(g["json_type"])
        typed = types - {"null"}
        if not typed:
            out.append({"path": path, "json_type": "string"})
        elif len(typed) == 1:
            out.append({"path": path, "json_type": typed.pop()})
        else:
            non_cont = typed - {"object", "array"}
            out.append(
                {"path": path, "json_type": non_cont.pop() if len(non_cont) == 1 else "string"}
            )
    return pd.DataFrame(out).sort_values("path").reset_index(drop=True)
