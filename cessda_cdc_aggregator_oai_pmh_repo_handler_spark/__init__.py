"""PySpark-native analytics engine with the query and data-processing
capabilities of the CESSDA CDC Aggregator OAI-PMH Repo Handler
(reference: /root/reference, cessda/cessda.cdc.aggregator.oai-pmh-repo-handler).

Architecture (Spark-first, not a port):

- ``sources``    — parquet/YAML loaders, studies-corpus schema + fixtures.
- ``functions``  — Column-expression libraries: Mongo-ish predicate semantics
                   (SURVEY §2.2), per-record derivations (SURVEY §2.7), text
                   analysis, similarity primitives.
- ``operators``  — query-shaped operators: relational demos, pagination,
                   metrics rollup, dedup, ANN, multimodal plumbing.
- ``plans``      — OAI verb → DataFrame plan builder (the reference's only IR
                   is a Mongo filter dict + fields list; ours is a DataFrame).
- ``streaming``  — Structured Streaming ingestion (upsert + logical deletes).
- ``oai``        — thin OAI-PMH facade + XML rendering over Spark results.

Everything is DataFrame/SQL so Catalyst handles pruning/pushdown/codegen.
"""

__version__ = "0.1.0"
