"""Post-KG service tail — the reference `Pipeline.java` epilogue: after
the graph is built, upload it to GraphDB and publish the PII findings to
the message bus.

Parity map: GraphDB upload = `E_CreateKG/GraphDB.java:150-163`
(re-expressed over the public RDF4J REST protocol in
``sinks/graphdb.py``); PII publish = `A_Coordinator/Kafka/
KafkaProducerService.java:28-56` (re-expressed as the partitioned topic
log in ``sinks/topiclog.py``). Both legs are optional and independent:
``flagship_job.py --graphdb URL [--graphdb-repo ID]`` and
``--publish-pii-root DIR`` wire them after the edges stage.

Scale shape: the GraphDB leg POSTs one N-Triples payload per edge block
straight from workers (no driver funnel); the PII leg publishes a
schema-result list (vocabulary-sized — one row per flagged column), so
it is driver-trivial by construction.
"""

from __future__ import annotations

import pandas as pd
import ray.data


def run_service_tail(
    edges: ray.data.Dataset | None = None,
    *,
    graphdb_endpoint: str | None = None,
    graphdb_repo: str = "kg",
    graphdb_rewrite: bool = False,
    pii_results: list[dict] | pd.DataFrame | None = None,
    topic_root: str | None = None,
    topic: str = "pii",
) -> dict:
    """Run whichever service legs are configured; -> per-leg accounting
    (triples uploaded / messages published), empty dict if nothing ran."""
    out: dict = {}
    if graphdb_endpoint is not None and edges is not None:
        from knowledgegraphs_ray.sinks.graphdb import upload_dataset

        acct = upload_dataset(
            edges,
            endpoint=graphdb_endpoint,
            repo_id=graphdb_repo,
            rewrite=graphdb_rewrite,
        )
        out["graphdb"] = {
            "repo": graphdb_repo,
            "triples": int(acct["rows"].sum()),
            "blocks": len(acct),
        }
    if topic_root is not None and pii_results is not None:
        from knowledgegraphs_ray.sinks.topiclog import publish_pii_results

        if isinstance(pii_results, pd.DataFrame):
            pii_results = pii_results.to_dict("records")
        n = publish_pii_results(pii_results, root=topic_root, topic=topic)
        out["pii_published"] = {"topic": topic, "messages": n}
    return out


def schema_pii_results(sf_dir: str) -> pd.DataFrame:
    """The flagship's PII payload: schema-level DPV identification over
    the relational tables (P1/P2), one row per flagged element — the
    reference's PIIresultsTemplate content."""
    from knowledgegraphs_ray.pipelines import catalog

    df = catalog.queries()["pii_schema"](sf_dir)
    # PIIresultsTemplate carries the dataset name; key messages by it
    return df.assign(dataset=df["element"].str.split(".").str[0])
