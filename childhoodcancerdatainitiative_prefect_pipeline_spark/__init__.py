"""PySpark-native analytics engine with the query/data-processing
capabilities of CBIIT/ChildhoodCancerDataInitiative-Prefect_Pipeline.

The reference is a pandas/Prefect data-curation ETL (manifest
validation, repair, submission-artifact generation, graph-DB
extraction, catalog statistics).  This package re-expresses every
operator in SURVEY.md §2 as idiomatic Spark DataFrame transforms:
declarative plans optimized by Catalyst/AQE, broadcast joins for
small schema/lookup tables, and Pandas UDFs only where built-ins
genuinely cannot express the semantics (deterministic UUIDv5,
multimodal decode).

Layout
------
- ``session``    : tuned SparkSession builder (AQE, shuffle sizing)
- ``catalog``    : table loading / NA normalization / row indexing
- ``sources``    : parquet/TSV/JSON + Excel edge + S3 metadata utils
- ``operators``  : joins, aggregates, windows, reshape, set ops,
                   dedup (exact/minhash/simhash), similarity, text
- ``functions``  : scalar function packs (cleaning, checks, ids, urls)
- ``plans``      : rule engine (ValidationRy/CatchERR compiler),
                   liftover, catalog stats
- ``streaming``  : Structured Streaming over the events stream
"""

__version__ = "0.1.0"
