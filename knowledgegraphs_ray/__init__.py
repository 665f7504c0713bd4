"""knowledgegraphs_ray — a Ray-Data-native knowledge-graph construction engine.

Re-expresses the capabilities of the ENCRYPT KnowledgeGraphs reference
(ChristinaK97/KnowledgeGraphs) as idiomatic Ray Data pipelines:

* rule-based schema -> ontology extraction compiled into vectorized
  triple-extraction kernels (reference: ``C_POextractor/RDB2OWL/*`` and
  ``E_CreateKG/InsertData*``),
* entity/mention matching as actor-pool ``map_batches`` stages
  (reference: BERTMap ``align/bertmap/*`` + AAExpansion),
* canonicalization via groupby-on-mention-key union-find
  (reference: ``AAExpansion/source/util/NearDuplicates.py``),
* graph materialization as partitioned Parquet / N-Triples edge tables
  (reference: ``E_CreateKG/InsertDataBase.java``).

Nothing here calls ``ray.init`` — sessions are owned by CLI entry points,
``bench.py`` and the pytest fixture.
"""

__version__ = "0.1.0"
