"""Declared schemas for the curation sink's silver tables — the
``check-schema`` guard (sources/schema_check.py, the reference's
``Migration.hs`` refuse-to-run analog) extended to the beyond-reference
store so a long-running curation deployment also refuses to resume
against a drifted directory.

Digit-valued partition buckets (``_id_bucket`` — ``key_bucket`` on
curated_docs / curation_rejects / shingle_sets) are declared as the
INTEGER their all-numeric directory names re-infer to at read time;
letter-prefixed buckets (content_hashes' ``'h'``+hex, minhash_bands)
stay string.  ``batch_id`` is int where writers stamp ``F.lit(batch_id)``
and long where the frame declares it (curation_log).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _s(*fields: tuple) -> StructType:
    return StructType([StructField(n, t) for n, t in fields])


# tables in the sink's out_dir
CURATION_SCHEMAS: dict[str, StructType] = {
    "curated_docs": _s(
        ("doc_id", LongType()),
        ("text", StringType()),
        ("lang", StringType()),
        ("quality_score", DoubleType()),
        ("n_tokens", LongType()),
        ("content_hash", StringType()),
        ("batch_id", IntegerType()),
        ("key_bucket", IntegerType()),
    ),
    "curation_rejects": _s(
        ("doc_id", LongType()),
        ("reason", StringType()),
        ("detail", StringType()),
        ("batch_id", IntegerType()),
        ("key_bucket", IntegerType()),
    ),
    "content_hashes": _s(
        ("content_hash", StringType()),
        ("doc_id", LongType()),
        ("key_bucket", StringType()),
    ),
    "corpus_stats": _s(
        ("lang", StringType()),
        ("n_docs", LongType()),
        ("n_tokens", LongType()),
        ("n_chars", LongType()),
        ("batch_id", IntegerType()),
    ),
    "curation_log": _s(
        ("batch_id", LongType()),
        ("n_in", LongType()),
        ("n_kept", LongType()),
        ("n_quality", LongType()),
        ("n_exact", LongType()),
        # round 7: the sink gained the decontamination stage; the guard
        # refuses pre-r7 stores on the missing column (backfill = rewrite
        # curation_log with n_contam = 0)
        ("n_contam", LongType()),
        ("n_near", LongType()),
    ),
}

# tables in the sink's dedup_index/ subdirectory
DEDUP_INDEX_SCHEMAS: dict[str, StructType] = {
    "minhash_bands": _s(
        ("doc_id", LongType()),
        ("band", IntegerType()),
        ("bucket", StringType()),
        ("key_bucket", StringType()),
    ),
    "shingle_sets": _s(
        ("doc_id", LongType()),
        ("_sh", ArrayType(StringType())),
        ("key_bucket", IntegerType()),
    ),
    "bucket_counts": _s(
        ("band", IntegerType()),
        ("bucket", StringType()),
        ("n", LongType()),
        ("batch_id", IntegerType()),
    ),
}
