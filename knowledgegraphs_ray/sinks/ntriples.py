"""N-Triples sink — the Turtle-writer analogue (S8).

Reference: individuals.ttl / fullGraph.ttl serialization
(E_CreateKG/InsertDataBase.java:226-259) via an in-memory Jena model. Here:
a vectorized formatting ``map_batches`` turns (subj, pred, obj) rows into
N-Triples lines and ``write_csv``-free text shards are written per block —
no global graph ever materializes.

IRI terms use the compact ``kg:``/``rdf:`` prefixes expanded to full IRIs;
objects that don't look like IRIs are emitted as escaped literals.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

PREFIXES = {
    "kg:": "http://kg.local/",
    "rdf:": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs:": "http://www.w3.org/2000/01/rdf-schema#",
    "owl:": "http://www.w3.org/2002/07/owl#",
    "xsd:": "http://www.w3.org/2001/XMLSchema#",
    "skos:": "http://www.w3.org/2004/02/skos/core#",
    "dpv:": "https://w3id.org/dpv#",
    "do:": "http://kg.local/do/",
}


def _expand(arr: pa.Array) -> pa.Array:
    out = arr
    for pfx, full in PREFIXES.items():
        mask = pc.starts_with(out, pfx)
        expanded = pc.binary_join_element_wise(
            pa.scalar(full), pc.utf8_slice_codeunits(out, len(pfx), 1 << 30), ""
        )
        out = pc.if_else(mask, expanded, out)
    return out


def _is_iri(arr: pa.Array) -> pa.Array:
    m = pc.starts_with(arr, "http://")
    for pfx in list(PREFIXES) + ["https://"]:
        m = pc.or_(m, pc.starts_with(arr, pfx))
    return m


def _escape_literal(arr: pa.Array) -> pa.Array:
    out = pc.replace_substring(arr, "\\", "\\\\")
    out = pc.replace_substring(out, '"', '\\"')
    out = pc.replace_substring(out, "\n", "\\n")
    return pc.replace_substring(out, "\r", "\\r")


def _s(col) -> pa.Array:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return arr.cast(pa.string())  # parquet round-trips may yield large_string


def to_ntriples_lines(batch: pa.Table) -> pa.Table:
    subj = _s(batch["subj"])
    pred = _expand(_s(batch["pred"]))
    obj = _s(batch["obj"])
    # blank nodes (restriction bnodes, "_:r0") are written bare
    subj_term = pc.if_else(
        pc.starts_with(subj, "_:"),
        subj,
        pc.binary_join_element_wise("<", _expand(subj), ">", ""),
    )
    iri_obj = pc.binary_join_element_wise("<", _expand(obj), ">", "")
    lit_obj = pc.binary_join_element_wise('"', _escape_literal(obj), '"', "")
    obj_term = pc.if_else(
        pc.starts_with(obj, "_:"),
        obj,
        pc.if_else(_is_iri(obj), iri_obj, lit_obj),
    )
    line = pc.binary_join_element_wise(
        subj_term, " <", pred, "> ", obj_term, " .", ""
    )
    return pa.table({"line": line})


try:
    from ray.data.datasource import BlockBasedFileDatasink

    class NTriplesDatasink(BlockBasedFileDatasink):
        """Shard-per-block .nt writer — Ray handles unique part naming,
        atomic task retries and distributed writes."""

        def __init__(self, path: str):
            super().__init__(path, file_format="nt")

        def write_block_to_file(self, block, file) -> None:
            tbl = block.to_arrow()
            col = tbl["line"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            # one big join instead of a Python line loop
            joined = pc.binary_join(
                pa.chunked_array([pa.ListArray.from_arrays([0, len(col)], col)]),
                "\n",
            )
            data = joined[0].as_py()
            if data:
                file.write((data + "\n").encode())

except ImportError:  # pragma: no cover - older Ray layouts
    NTriplesDatasink = None


def write_ntriples(triples: ray.data.Dataset, out_dir: str) -> dict:
    """Materialize the edge table as N-Triples shards (one file per block),
    then publish a ``_SUCCESS`` manifest with per-shard lineage (file, bytes,
    line count) — same contract as the Parquet stage checkpoints."""
    import json
    import os
    import time

    lines = triples.map_batches(
        to_ntriples_lines, batch_format="pyarrow", zero_copy_batch=True
    )
    lines.write_datasink(NTriplesDatasink(out_dir))

    shards = []
    total = 0
    for f in sorted(os.listdir(out_dir)):
        if not f.endswith(".nt"):
            continue
        path = os.path.join(out_dir, f)
        with open(path, "rb") as fh:
            n = sum(1 for _ in fh)
        total += n
        shards.append({"file": f, "bytes": os.path.getsize(path), "lines": n})
    manifest = {
        "triples": total,
        "shards": shards,
        "written_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    tmp = os.path.join(out_dir, "_SUCCESS.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, "_SUCCESS"))
    return manifest
