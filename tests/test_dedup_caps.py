"""Scale-safety caps on the dedup operators, exercised on pathological
(boilerplate-heavy) corpora where uncapped candidate generation would be
quadratic in corpus size.

- ngram_jaccard_pairs(max_df=...): stop-shingle document-frequency cap —
  shingles in more than max_df docs leave the Jaccard universe before the
  inverted-index self-join.
- lsh_candidate_pairs(max_bucket_size=...): band buckets holding more than
  the cap are dropped before the candidate self-join (a bucket of b docs
  yields b²/2 pairs).
"""

from pyspark.sql import functions as F

from chainweb_data_spark.operators import dedup as dd

BOILER = "terms of service apply to all users of this site"


def _corpus(spark, n_boiler=20):
    """n_boiler docs sharing ONLY a boilerplate sentence (unique tails),
    plus one true near-dup pair (9000/9001) with distinctive shared text."""
    rows = [
        (i, f"{BOILER} unique tail {i} alpha beta gamma delta {i}")
        for i in range(n_boiler)
    ]
    dup = "quick brown fox jumps over the lazy dog repeatedly tonight"
    rows += [(9000, dup + " first"), (9001, dup + " second")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_df_cap_drops_boilerplate_pairs(spark):
    docs = _corpus(spark)
    uncapped = dd.ngram_jaccard_pairs(docs, "doc_id", "text", k=3, min_jaccard=0.05)
    capped = dd.ngram_jaccard_pairs(
        docs, "doc_id", "text", k=3, min_jaccard=0.05, max_df=5
    )
    un = {(r.id_a, r.id_b) for r in uncapped.collect()}
    cp = {(r.id_a, r.id_b) for r in capped.collect()}
    # uncapped: every boilerplate pair shares 8 shingles -> quadratic blowup
    assert len(un) >= 20 * 19 // 2
    # capped: the boilerplate shingles (df=20 > 5) leave the universe, so
    # boilerplate-only pairs vanish; the true near-dup pair survives (its
    # shared shingles have df=2)
    assert (9000, 9001) in cp
    assert all(a >= 9000 for a, _ in cp), f"boilerplate pair leaked: {cp}"


def test_ngram_df_cap_bounds_join_cost(spark):
    """The capped shingle relation itself is bounded: no shingle appears in
    more than max_df docs, so the self-join cannot exceed n_shingles*cap²."""
    docs = _corpus(spark, n_boiler=30)
    sh = dd.word_shingles(docs, "doc_id", "text", k=3)
    keep = (
        sh.groupBy("shingle").agg(F.count("*").alias("d")).filter(F.col("d") <= 5)
    )
    capped_max = (
        sh.join(keep.select("shingle"), "shingle", "left_semi")
        .groupBy("shingle")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert capped_max <= 5


def test_lsh_bucket_cap_bounds_candidates(spark):
    # 40 identical docs -> every band bucket holds all 40 (780 pairs each
    # band, uncapped); 2 distinctive identical docs in their own buckets
    rows = [(i, BOILER) for i in range(40)]
    dup = "zephyr quantum maroon isotope gradient wavelet"
    rows += [(9000, dup), (9001, dup)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = dd.word_shingles(docs, "doc_id", "text", k=3)
    sig = dd.minhash_signatures(sh, "doc_id", num_hashes=16)

    uncapped = dd.lsh_candidate_pairs(sig, "doc_id", 16, 4).count()
    capped = dd.lsh_candidate_pairs(sig, "doc_id", 16, 4, max_bucket_size=10)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert uncapped >= 40 * 39 // 2
    # hot buckets (40 docs > cap 10) dropped; the selective bucket survives
    assert got == {(9000, 9001)}


def test_simhash_near_pairs_default_matches_pigeonhole(spark):
    """Default max_hamming must equal bands-1 (the recall guarantee)."""
    rows = [(1, "aa bb cc dd ee"), (2, "aa bb cc dd ff")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = dd.simhash(docs, "doc_id", "text")
    out = dd.simhash_near_pairs(sh, "doc_id", bands=4)
    assert all(r.hamming <= 3 for r in out.collect())


def test_matmul_envelope_enforced(spark):
    """The exact cosine tier must refuse (before collecting the corpus)
    beyond its broadcast envelope and point at the ANN path."""
    import pytest
    from pyspark.sql import functions as F

    from chainweb_data_spark.operators.similarity import (
        cosine_topk_matmul,
        near_dup_pairs_matmul,
    )

    df = spark.range(0, 100).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="lsh_ann_topk"):
        cosine_topk_matmul(df, "vec_id", "embedding", k=3, max_vectors=50)
    with pytest.raises(ValueError, match="lsh_ann_topk"):
        near_dup_pairs_matmul(df, "vec_id", "embedding", 0.9, max_vectors=50)
    # inside the envelope both build fine
    assert cosine_topk_matmul(df, "vec_id", "embedding", k=1).count() > 0


def test_duplicate_clusters_transitive_closure(spark):
    """A~B, B~C without A~C must still collapse to ONE component with the
    min-id representative; disjoint components stay separate; every member
    carries the component size."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 9), (20, 21), (40, 41), (41, 40)],
        "id_a long, id_b long",
    )
    got = {
        r["id"]: (r["cluster_rep"], r["cluster_size"])
        for r in dd.duplicate_clusters(pairs).collect()
    }
    assert got == {
        1: (1, 4), 2: (1, 4), 3: (1, 4), 9: (1, 4),
        20: (20, 2), 21: (20, 2),
        40: (40, 2), 41: (40, 2),
    }


def test_duplicate_clusters_long_chain_converges(spark):
    """A path graph has the worst diameter for min-label propagation —
    the label must still reach the far end (within max_iters)."""
    n = 12
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    rows = dd.duplicate_clusters(pairs, max_iters=n + 2).collect()
    assert len(rows) == n + 1
    assert all(r["cluster_rep"] == 0 and r["cluster_size"] == n + 1 for r in rows)


def test_decontamination_broadcast_envelope(spark):
    """The benchmark shingle broadcast must refuse loudly past its
    envelope (same policy as the exact-cosine tier)."""
    import pytest as _pytest

    docs = _corpus(spark)
    with _pytest.raises(ValueError, match="broadcast envelope"):
        dd.contaminated_docs(
            docs, docs, "doc_id", "text", max_bench_shingles=3
        )
