"""chainweb_data_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of kadena-io/chainweb-data.

The reference (/root/reference, Haskell + PostgreSQL) is an ETL + query service
for the Kadena Chainweb blockchain.  This package re-expresses its entire
operator inventory (SURVEY.md §2) Spark-first:

- ``schemas``    — StructTypes for the six relational tables + payload JSON.
- ``ingest``     — pure column-expression transforms payload → tables
                   (mirrors semantics of ``Lookups.hs``; no code is copied).
- ``operators``  — generic engine operators: keyset-cursor pagination,
                   bounded-scan governor, gap detection, search predicates,
                   dedup (exact/minhash/simhash/jaccard), similarity search,
                   text analysis, multimodal column plumbing.
- ``queries``    — one function per reference HTTP endpoint semantics.
- ``sources``    — table loaders / fetcher stubs.
- ``streaming``  — Structured Streaming listen path (foreachBatch, idempotent).
- ``plans``      — physical layout helpers (height-bucket partitioning,
                   sorted-on-write files) replacing the reference's indexes.
"""

__version__ = "0.1.0"
