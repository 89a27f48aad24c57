"""Trained quality classifier (operators/classifier.py): twin-trainer
bit-equality (Spark sample vs pyarrow registration twin), fit
determinism, and learnability on a separable corpus.  Cross-engine
scoring parity is pinned by the quality_classifier_docs oracle gate."""

from chainweb_data_spark.operators import classifier as clf
from chainweb_data_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_twin_trainers_bit_identical(spark):
    docs = load_table(spark, SF, "documents")
    a = clf.train_quality_lr(docs, "doc_id", "text")
    b = clf.train_quality_lr_parquet(SF + "/documents.parquet")
    assert a == b  # exact float equality: same sample, same fit core
    c = clf.train_quality_lr(docs, "doc_id", "text")
    assert a == c  # re-running is bit-stable


def test_classifier_separates_fluent_from_gibberish(spark):
    """Fluent docs (common vocabulary, stopwords, repetition) vs unique-
    token gibberish: the proxy-labeled fit must recover the split when
    scoring the very corpus it trained on."""
    vocab = "the of and to a in is it you that he was for on are".split()
    rows = []
    for i in range(40):
        sent = " ".join(vocab[(i + j) % len(vocab)] for j in range(30))
        rows.append((i, sent))
    for i in range(40, 80):
        rows.append((i, " ".join(f"zx{i}q{j}" for j in range(10))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    model = clf.train_quality_lr(docs, "doc_id", "text")
    got = {
        r["doc_id"]: r["keep"]
        for r in clf.score_quality_lr(docs, "doc_id", "text", model).collect()
    }
    acc = sum(
        1 for i in range(80) if got[i] == (i < 40)
    ) / 80
    assert acc >= 0.95, acc


def test_scoring_is_single_projection(spark):
    """The 100 TB contract: scoring is one codegen projection over the
    scan — no shuffle, no Python, no join in the plan."""
    docs = load_table(spark, SF, "documents")
    model = clf.train_quality_lr(docs, "doc_id", "text")
    plan = (
        clf.score_quality_lr(docs, "doc_id", "text", model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for bad in ("Exchange", "Join", "BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan, plan
