"""Physical-plan assertions: the scale properties SURVEY §4 demands are
checked on the actual Catalyst output, not by eyeball — filters reach the
parquet scan, small dims broadcast, top-k runs as TakeOrdered, and nothing
in the registry degenerates into a cartesian product.
"""

import pytest
from pyspark.sql import functions as F

from chainweb_data_spark.queries import query_fns

SF = "/root/testdata/sf0.01"


def plan_of(spark, name: str) -> str:
    df = query_fns()[name](spark, SF)
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_range(spark):
    p = plan_of(spark, "range_filter")
    assert "PushedFilters" in p
    # both the ts bounds and the value bound reach the scan
    assert "GreaterThanOrEqual(value,5" in p.replace(" ", "")


def test_filter_pushdown_like(spark):
    p = plan_of(spark, "doc_like_search")
    assert "StringContains(text,spark)" in p.replace(" ", "")
    assert "EqualTo(lang,en)" in p.replace(" ", "")


def test_column_pruning(spark):
    p = plan_of(spark, "groupby_minmax")
    # events has (event_id, ts, user_id, event_type, value, props, ...);
    # this query needs only three columns — props must NOT be read
    rs = [l for l in p.splitlines() if "ReadSchema" in l]
    assert rs and all("props" not in l for l in rs), rs


def test_broadcast_dims(spark):
    p = plan_of(spark, "region_revenue")
    assert p.count("BroadcastHashJoin") >= 2  # nation, region (+customer ok)
    assert "CartesianProduct" not in p


def test_topk_is_take_ordered(spark):
    p = plan_of(spark, "recent_events")
    assert "TakeOrderedAndProject" in p


def test_semi_join_physical(spark):
    p = plan_of(spark, "semi_join_exists")
    assert "LeftSemi" in p
    assert "GreaterThan(o_totalprice,400000" in p.replace(" ", "")


def test_keyset_page_pushdown(spark):
    # O5's point: the leading cursor column's range conjunct reaches the
    # scan.  The domain cursor leads on height (a NATIVE parquet column);
    # the testdata `ts` variant can't push because the loader derives ts
    # from the nanos-long workaround — a known environment artifact.
    p = plan_of(spark, "cw_events_page_after")
    flat = p.replace(" ", "")
    assert "PushedFilters" in p
    assert "LessThan(height," in flat or "LessThanOrEqual(height," in flat, p


def test_union_two_scans_only(spark):
    p = plan_of(spark, "union_legs")
    # both legs scan the same parquet with their own pushed filters; the
    # formatted detail section must show exactly the two declared scans
    assert p.count(") Scan parquet") == 2


def test_ann_candidate_join_is_equi(spark):
    # the (band, key) self-join is the only wide edge of the ANN path; it
    # must plan as a hash/merge equi-join, never a nested-loop over pairs
    p = plan_of(spark, "ann_lsh_topk")
    assert "BroadcastNestedLoopJoin" not in p
    assert any(j in p for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"))


def test_decontamination_broadcasts_benchmark(spark):
    # the benchmark shingle set must broadcast: the corpus token stream
    # never shuffles for the overlap lookup
    p = plan_of(spark, "decontaminate_docs")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_encode_vocab_lookup_broadcasts(spark):
    p = plan_of(spark, "encode_token_ids")
    assert "BroadcastHashJoin" in p


def test_pack_sequences_window_is_partitioned(spark):
    # the scale point of pack_offsets: the running sum must be a
    # PARTITIONED window (per-_pid cumsum + driver prefix), never a
    # single-partition global window over the corpus.  The production
    # path localCheckpoints the cumsum (pinning the range partitioning
    # across the totals job and the join job), which truncates lineage —
    # so the window shape is asserted on the unpinned twin, and the
    # gated plan is asserted window-FREE (the checkpoint swallowed it;
    # a global window reappearing there would be a regression too).
    from chainweb_data_spark.operators import text as tx
    from chainweb_data_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    unpinned = tx.pack_offsets(
        docs.select("doc_id", tx.token_count(F.col("text")).alias("n")),
        "doc_id",
        "n",
        2048,
        _pin_partitions=False,
    )
    p = spark._jvm.PythonSQLUtils.explainString(
        unpinned._jdf.queryExecution(), "formatted"
    ).replace(" ", "")
    assert "windowspecdefinition(_pid" in p, "global-window cumsum detected"
    gated = plan_of(spark, "pack_sequences").replace(" ", "")
    assert "windowspecdefinition()" not in gated, "unpartitioned window"


def test_chunking_is_shuffle_free(spark):
    # chunk_documents is projection + explode: the only exchange in the
    # gated plan is the final presentation sort's range partitioning
    p = plan_of(spark, "chunk_documents")
    # formatted plans list each node twice (tree + detail) — count tree nodes
    assert p.count("Exchange (") <= 1, "chunking plan grew a shuffle"
    assert "Generate" in p and "posexplode" in p


def test_unigram_model_broadcasts(spark):
    # the unigram model joins broadcast: the token stream never shuffles
    # for the logprob lookup (shuffles: vocab count + per-doc mean only)
    p = plan_of(spark, "unigram_ppl_docs")
    assert "BroadcastHashJoin" in p


def test_shuffle_shards_window_is_per_shard(spark):
    # the scale point of shuffle_shards: rank is a PER-SHARD window (hash
    # partition on shard), never a global-order single-partition window
    p = plan_of(spark, "shuffle_shards_docs").replace(" ", "")
    assert "windowspecdefinition(shard" in p, "global-order window detected"


def test_mixture_oversample_corpus_never_shuffles(spark):
    # rate rows broadcast onto the corpus; replication is a row-local
    # sequence-explode — no sort-merge join, no corpus-keyed exchange
    p = plan_of(spark, "mixture_epoch_docs")
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p
    assert "Generate" in p and "explode" in p


def test_select_canonical_has_no_window(spark):
    # canonical selection is a map-combined max_by aggregation, not a
    # per-cluster row_number window sort
    p = plan_of(spark, "dedup_canonical_docs")
    assert "Window" not in p, "canonical selection degenerated to a window"


def test_dsir_models_broadcast(spark):
    # both unigram models and the OOV floor broadcast onto the token
    # stream; the only corpus-keyed shuffle is the per-doc mean
    p = plan_of(spark, "dsir_sample_docs")
    assert p.count("BroadcastHashJoin") >= 2 and "SortMergeJoin" not in p
    assert "TakeOrderedAndProject" in p, "gumbel top-k must be TakeOrdered"


def test_epoch_pipeline_single_window(spark):
    # the mixture -> shuffle handoff must not re-sort: exactly one Window
    # node (the per-shard rank) in the whole composed plan
    p = plan_of(spark, "epoch_pipeline")
    detail = [l for l in p.splitlines() if l.startswith("(") and "Window" in l]
    assert len(detail) == 1, detail
    assert "SortMergeJoin" not in p


@pytest.mark.parametrize(
    "name",
    sorted(
        n
        for n in query_fns()
        # matmul/bounded queries run driver work at build time; plans of the
        # remaining registry must all be cartesian-free
        if n not in ("embed_cosine_topk", "embed_near_dup", "cw_bounded_search")
    ),
)
def test_no_cartesian_product(spark, name):
    p = plan_of(spark, name)
    assert "CartesianProduct" not in p, f"{name} degenerated to a cross join"
