"""Invariants of the curation operators (sampling, packing, clustering)
that the oracle hash alone doesn't pin down: partitioning-invariance,
sample nesting, and the two-phase cumsum's exactness against a plain
Python prefix sum."""

from pyspark.sql import functions as F

from chainweb_data_spark.operators import dedup as dd
from chainweb_data_spark.operators import text as tx


def _counted(spark, n=500, seed_mult=2654435761):
    """Deterministic pseudo-random token counts, including zeros."""
    rows = [(i, (i * seed_mult) % 97 if i % 13 else 0) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, n long"), rows


def test_pack_offsets_is_exact_prefix_sum(spark):
    df, rows = _counted(spark)
    got = {
        r["doc_id"]: (r["start_offset"], r["chunk_start"], r["chunk_end"])
        for r in tx.pack_offsets(df, "doc_id", "n", 64).collect()
    }
    acc = 0
    for i, n in rows:
        start = acc
        end = start + max(n, 1) - 1
        assert got[i] == (start, start // 64, end // 64), (i, n, got[i])
        acc += n
    assert len(got) == len(rows)


def test_pack_offsets_partitioning_invariant(spark):
    """The two-phase cumsum must be a pure function of the DATA — the same
    offsets whatever partitioning the input arrives with."""
    df, _rows = _counted(spark, n=300)
    a = sorted(
        map(tuple, tx.pack_offsets(df, "doc_id", "n", 128).collect())
    )
    b = sorted(
        map(
            tuple,
            tx.pack_offsets(df.repartition(7), "doc_id", "n", 128).collect(),
        )
    )
    c = sorted(
        map(
            tuple,
            tx.pack_offsets(df.coalesce(1), "doc_id", "n", 128).collect(),
        )
    )
    assert a == b == c


def test_pack_offsets_exact_at_many_range_partitions(spark):
    """Regression: the totals collect and the final join are two JOBS over
    the range exchange; un-materialized, the RangePartitioner re-samples
    with a fresh seed per job and the second job's _pid assignments can
    diverge from the collected _base prefix sums (measured 249k/400k rows
    mis-based at 64 partitions).  The localCheckpoint pin makes both jobs
    read one materialized partitioning; verify against the plain prefix
    sum at a row count that forces real range sampling."""
    n = 60_000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97).alias("n")
    ).repartition(64)
    got = {
        r["doc_id"]: r["start_offset"]
        for r in tx.pack_offsets(df, "doc_id", "n", 2048).collect()
    }
    acc, bad = 0, 0
    for i in range(n):
        if got[i] != acc:
            bad += 1
        acc += i % 97
    assert bad == 0, f"{bad}/{n} rows mis-based"


def test_sample_pred_nesting_and_rate(spark):
    """Deterministic samples NEST (num/256 ⊆ (num+m)/256 — the property
    that lets a pipeline cheaply grow a sample without resampling) and hit
    the target rate within binomial noise."""
    df = spark.range(0, 4000).select(F.col("id"))
    sets = {}
    for num in (32, 64, 128, 256):
        sets[num] = {
            r[0] for r in df.filter(tx.sample_pred("id", num)).collect()
        }
    assert sets[32] <= sets[64] <= sets[128] <= sets[256]
    assert len(sets[256]) == 4000  # num == den keeps everything
    for num in (32, 64, 128):
        expect = 4000 * num / 256
        assert abs(len(sets[num]) - expect) < 4 * (expect ** 0.5) + 20
    # deterministic: a second evaluation yields the identical set
    again = {r[0] for r in df.filter(tx.sample_pred("id", 64)).collect()}
    assert again == sets[64]


def test_stratified_keeps_unlisted_strata_whole(spark):
    df = spark.createDataFrame(
        [(i, ["en", "fr", "de"][i % 3]) for i in range(300)],
        "doc_id long, lang string",
    )
    out = tx.stratified_sample(df, "doc_id", "lang", {"en": (64, 256)})
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang["fr"] == 100 and by_lang["de"] == 100  # kept whole
    assert 0 < by_lang.get("en", 0) < 100  # downsampled


def test_duplicate_clusters_partitioning_invariant(spark):
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40, 2)]  # 20 two-node components
        + [(100, 101), (101, 102), (102, 103)],  # one 4-node chain
        "id_a long, id_b long",
    )
    a = sorted(map(tuple, dd.duplicate_clusters(pairs).collect()))
    b = sorted(
        map(tuple, dd.duplicate_clusters(pairs.repartition(5)).collect())
    )
    assert a == b
    reps = {r for (_i, r, _s) in a}
    assert all(r in {i for (i, _r, _s) in a} for r in reps)


def test_duplicate_clusters_without_sizes_same_mapping(spark):
    # with_sizes=False must return exactly the (id, cluster_rep) mapping of
    # the full output — it skips only the size aggregate + join
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 40, 2)]
        + [(100, 101), (101, 102), (102, 103)],
        "id_a long, id_b long",
    )
    slim = dd.duplicate_clusters(pairs, with_sizes=False)
    assert slim.columns == ["id", "cluster_rep"]
    full = {
        (r["id"], r["cluster_rep"])
        for r in dd.duplicate_clusters(pairs).collect()
    }
    assert {tuple(r) for r in slim.collect()} == full


def test_stratified_sample_keeps_null_stratum(spark):
    from chainweb_data_spark.operators.text import stratified_sample

    df = spark.createDataFrame(
        [(1, "en"), (2, None), (3, "zz"), (4, None)],
        "doc_id long, lang string",
    )
    kept = {
        r["doc_id"]
        for r in stratified_sample(df, "doc_id", "lang", {"en": (0, 256)}).collect()
    }
    # en sampled at rate 0 (dropped); NULL and unmapped strata kept WHOLE
    assert kept == {2, 3, 4}


def test_duplicate_clusters_raises_on_nonconvergence(spark):
    import pytest as _pytest

    from chainweb_data_spark.operators.dedup import duplicate_clusters

    # a path component of diameter 6 cannot converge in 2 rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "id_a long, id_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        duplicate_clusters(pairs, max_iters=2)
    # and with enough rounds the same chain is ONE cluster
    ok = duplicate_clusters(pairs, max_iters=10).collect()
    assert {r["cluster_rep"] for r in ok} == {0}
    assert {r["cluster_size"] for r in ok} == {7}


def test_chunk_documents_covers_every_token(spark):
    """Window rule invariants: disjoint mode (stride == size) partitions
    the token sequence exactly; overlap mode covers every token at least
    once; empty docs produce no chunks; short docs one short chunk."""
    rows = [
        (1, " ".join(f"t{i}" for i in range(10))),
        (2, "only three tokens"),
        (3, ""),
        (4, "   "),
        (5, "single"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    disjoint = tx.chunk_documents(df, "doc_id", "text", 4).collect()
    by_doc = {}
    for r in sorted(disjoint, key=lambda r: (r["doc_id"], r["chunk_id"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 10 tokens -> chunks of 4,4,2; rebuild == original
    assert [r["n_chunk_tokens"] for r in by_doc[1]] == [4, 4, 2]
    assert " ".join(r["chunk_text"] for r in by_doc[1]) == rows[0][1]
    assert [r["n_chunk_tokens"] for r in by_doc[2]] == [3]
    assert 3 not in by_doc and 4 not in by_doc  # empty/whitespace: nothing
    assert by_doc[5][0]["chunk_text"] == "single"

    overlap = [
        r
        for r in tx.chunk_documents(df, "doc_id", "text", 4, stride=2).collect()
        if r["doc_id"] == 1
    ]
    toks = rows[0][1].split(" ")
    covered = set()
    for r in sorted(overlap, key=lambda r: r["chunk_id"]):
        start = r["chunk_id"] * 2
        assert r["chunk_text"] == " ".join(toks[start : start + 4])
        covered.update(range(start, min(start + 4, len(toks))))
    assert covered == set(range(len(toks)))  # every position appears


def test_unigram_nll_matches_hand_computation(spark):
    """Tiny corpus where the Laplace model is computable by hand: 5 'a',
    3 'b', N=8, V=2 -> p(a)=6/10, p(b)=4/10."""
    import math

    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "a a b b")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r for r in tx.unigram_nll_scores(df, "doc_id", "text").collect()
    }
    nll_a, nll_b = -math.log(6 / 10), -math.log(4 / 10)
    exp1 = (3 * nll_a + nll_b) / 4
    exp2 = (2 * nll_a + 2 * nll_b) / 4
    assert got[1]["n_tokens"] == 4 and got[2]["n_tokens"] == 4
    assert abs(got[1]["avg_nll"] - round(exp1, 6)) < 1e-9
    assert abs(got[2]["avg_nll"] - round(exp2, 6)) < 1e-9
    assert abs(got[2]["ppl"] - round(math.exp(exp2), 2)) < 1e-9
    # the rarer-token doc scores strictly worse (higher nll)
    assert got[2]["avg_nll"] > got[1]["avg_nll"]


def test_bigram_backoff_matches_hand_computation(spark):
    """Tiny corpus where every probability is hand-checkable: unigram
    Laplace fallback on the first token, discounted bigram on seen pairs,
    lambda * p_uni on the unseen pair (none here - all pairs seen)."""
    import math

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "b a c")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in tx.bigram_backoff_scores(df, "doc_id", "text").collect()
    }
    # corpus: a:3 b:3 c:1, N=7 V=3 -> p_uni = (c+1)/10
    # bigrams: (a,b):2 (b,a):2 (a,c):1; c1(a)=c1(b)=3
    nll1 = (-math.log(0.4) + 3 * -math.log((2 - 0.75) / 3)) / 4
    nll2 = (
        -math.log(0.4)
        - math.log((2 - 0.75) / 3)
        - math.log((1 - 0.75) / 3)
    ) / 3
    assert got[1]["n_tokens"] == 4 and got[2]["n_tokens"] == 3
    assert abs(got[1]["avg_nll"] - round(nll1, 6)) < 1e-9
    assert abs(got[2]["avg_nll"] - round(nll2, 6)) < 1e-9
    # the doc with the rare continuation scores worse
    assert got[2]["avg_nll"] > got[1]["avg_nll"]


def test_bigram_backoff_uses_unigram_for_unseen_pairs(spark):
    """An unseen bigram must fall back to lambda(w1) * p_uni(w2): score a
    doc whose pair never occurs in the training corpus by training on a
    separate model... the operator trains on its input, so craft input
    where a pair is unseen ACROSS docs is impossible - instead check the
    single-token doc path (pure unigram) and that all NLLs are finite."""
    import math

    df = spark.createDataFrame(
        [(1, "x"), (2, "x y x")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in tx.bigram_backoff_scores(df, "doc_id", "text").collect()
    }
    # x:3 y:1, N=4 V=2 -> p_uni(x) = 4/6
    assert got[1]["n_tokens"] == 1
    assert abs(got[1]["avg_nll"] - round(-math.log(4 / 6), 6)) < 1e-9
    assert got[2]["avg_nll"] > 0 and math.isfinite(got[2]["ppl"])


def test_temperature_sample_flattens_and_keeps_smallest_whole(spark):
    from pyspark.sql import functions as F

    rows = [(i, "big" if i < 900 else ("mid" if i < 990 else "small"))
            for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = tx.temperature_sample(df, "doc_id", "source", alpha=0.5)
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # smallest source: rate quantizes to 1.0 -> kept whole
    assert got["small"] == 10
    # target shares prop to sqrt(n): big/small = sqrt(900/10) = 9.49...,
    # original ratio was 90 - the mix must flatten toward that band
    ratio = got["big"] / got["small"]
    assert 5 <= ratio <= 15, got
    # deterministic
    assert out.count() == tx.temperature_sample(
        df, "doc_id", "source", alpha=0.5
    ).count()


def test_assign_splits_partitions_exactly(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    out = tx.assign_splits(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000  # total partition, nothing dropped
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    assert abs(counts["train"] - 1600) < 120  # md5-uniform within tolerance
    # replay-stable: same assignment again
    again = tx.assign_splits(
        df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    assert out.exceptAll(again).count() == 0


def test_temperature_sample_min_source_survives_float_roundtrip(spark):
    """Regression: for ~3.7% of source sizes n (e.g. 7), the float
    round-trip (c · √n / n) lands at 0.99999999999999989, flooring the
    keep rate to 65535/65536 — and any min-source row whose md5 hash hits
    bucket 65535 was silently dropped despite the keep-everything
    contract.  doc_id 215574 hashes to exactly that bucket; with a
    7-row smallest source it must survive."""
    small_ids = [215574, 1, 2, 3, 4, 5, 6]  # n=7: the 0.999... case
    rows = [(i, "small") for i in small_ids] + [
        (1000 + i, "big") for i in range(700)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = tx.temperature_sample(df, "doc_id", "source", alpha=0.5)
    kept_small = {r["doc_id"] for r in out.filter("source = 'small'").collect()}
    assert kept_small == set(small_ids), kept_small


def test_assign_splits_validates_and_full_weight_swallows_all(spark):
    """Regression pair: (a) over-summing weights raise instead of
    silently starving the remainder split; (b) a cumulative bound of
    exactly 1.0 swallows EVERYTHING — doc_id 40691's md5 prefix is
    'ffff', the 1/65536 slice the old 0xffff clamp leaked into the next
    split (quiet train/test contamination at weight 0)."""
    import pytest

    df = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    with pytest.raises(ValueError, match="sum"):
        tx.assign_splits(df, "doc_id", {"train": 0.8, "val": 0.4})
    with pytest.raises(ValueError, match="negative"):
        tx.assign_splits(df, "doc_id", {"train": -0.1, "val": 1.0})

    edge = spark.createDataFrame([(40691,), (1,)], "doc_id long")
    out = tx.assign_splits(edge, "doc_id", {"train": 1.0, "test": 0.0})
    assert {r["split"] for r in out.collect()} == {"train"}


def test_fingerprint_null_text_is_null_in_every_mode(spark):
    """Regression: xxhash64(NULL) ignores the null and returns the SEED
    (42), so NULL-text docs all collided into one constant fingerprint
    bucket in that mode while md5/rolling64 returned NULL."""
    df = spark.createDataFrame(
        [(1, None), (2, "some real text here")], "doc_id long, t string"
    )
    for mode in ("md5", "xxhash64", "rolling64"):
        got = {
            r["doc_id"]: r["fp"]
            for r in tx.fingerprint(df, "t", k=8, mode=mode).collect()
        }
        assert got[1] is None, (mode, got[1])
        assert got[2] is not None, mode


def test_temperature_sample_keeps_null_source_stratum(spark):
    rows = [(i, None if i % 10 == 0 else "big") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = tx.temperature_sample(df, "doc_id", "source", alpha=0.5)
    # NULL stratum (50 rows, the smallest) survives whole, never dropped
    assert out.filter("source IS NULL").count() == 50
    assert "_src_key" not in out.columns


def test_unigram_external_model_oov_handling(spark):
    """With an external model, unknown tokens either drop (inner join,
    default) or score at oov_nll - n_tokens tells which happened."""
    df = spark.createDataFrame([(1, "a b zzz")], "doc_id long, text string")
    model = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0)], "token string, nll double"
    )
    strict = tx.unigram_nll_scores(df, "doc_id", "text", model=model).collect()[0]
    assert strict["n_tokens"] == 2 and strict["avg_nll"] == 1.5
    loose = tx.unigram_nll_scores(
        df, "doc_id", "text", model=model, oov_nll=9.0
    ).collect()[0]
    assert loose["n_tokens"] == 3 and loose["avg_nll"] == 4.0


def test_select_canonical_policy_and_survivors(spark):
    # clusters: {1,2,3} rep=1, {10,11} rep=10; docs 20, 21 unclustered
    docs = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (10, 4), (11, 2), (20, 7), (21, 0)],
        "doc_id long, n_tokens long",
    )
    clusters = spark.createDataFrame(
        [(1, 1, 3), (2, 1, 3), (3, 1, 3), (10, 10, 2), (11, 10, 2)],
        "id long, cluster_rep long, cluster_size long",
    )
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in dd.select_canonical(
            docs, clusters, "doc_id", "n_tokens"
        ).collect()
    }
    # cluster 1: docs 2 and 3 tie at 9 tokens -> min id 2 survives;
    # cluster 10: doc 10 (4 > 2); unclustered 20, 21 pass through
    assert got == {2: 9, 10: 4, 20: 7, 21: 0}


def test_shuffle_shards_is_a_permutation(spark):
    docs = spark.range(0, 300).select(F.col("id").alias("doc_id"))
    out = tx.shuffle_shards(docs, "doc_id", n_shards=7, seed="s").collect()
    assert len(out) == 300 and len({r["doc_id"] for r in out}) == 300
    # pos is 1..k dense within each shard, keys strictly ordered
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append((r["pos"], r["shuffle_key"]))
    for shard, rows in by_shard.items():
        rows.sort()
        assert [p for p, _ in rows] == list(range(1, len(rows) + 1))
        keys = [k for _, k in rows]
        assert keys == sorted(keys)
    # a different seed produces a different permutation (same membership)
    out2 = tx.shuffle_shards(docs, "doc_id", n_shards=7, seed="t").collect()
    k1 = {r["doc_id"]: (r["shard"], r["pos"]) for r in out}
    k2 = {r["doc_id"]: (r["shard"], r["pos"]) for r in out2}
    assert k1 != k2 and set(k1) == set(k2)


def test_mixture_oversample_hits_target_counts(spark):
    # two sources, 100 rows each; weights 0.75 / 0.25 over N=200
    # -> src a: 0.75*200/100 = 1.5 copies; src b: 0.25*200/100 = 0.5
    docs = spark.createDataFrame(
        [(i, "a" if i < 100 else "b") for i in range(200)],
        "doc_id long, source string",
    )
    out = tx.mixture_oversample(
        docs, "doc_id", "source", {"a": 0.75, "b": 0.25}
    ).collect()
    per_src = {}
    for r in out:
        per_src[r["source"]] = per_src.get(r["source"], 0) + 1
    # every 'a' row appears 1 or 2 times (frac 0.5), every 'b' 0 or 1
    assert 100 <= per_src["a"] <= 200 and 0 <= per_src["b"] <= 100
    # md5 coin at frac_q=32768/65536 lands near half: loose 3-sigma band
    assert 120 <= per_src["a"] <= 180 and 30 <= per_src["b"] <= 70
    # copy_id is dense 1..k per doc
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r["copy_id"])
    for cids in per_doc.values():
        assert sorted(cids) == list(range(1, len(cids) + 1))
    # replay-exact
    out2 = tx.mixture_oversample(
        docs, "doc_id", "source", {"a": 0.75, "b": 0.25}
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_mixture_oversample_unweighted_sources_drop(spark):
    docs = spark.createDataFrame(
        [(1, "x"), (2, "y")], "doc_id long, source string"
    )
    out = tx.mixture_oversample(docs, "doc_id", "source", {"x": 1.0}).collect()
    assert {r["source"] for r in out} == {"x"}


def test_mixture_oversample_matches_python_reference(spark):
    # exact cross-check of the full copy-count arithmetic (rate doubles,
    # floor quantization, md5 coin) against an independent pure-Python
    # computation — pins every bit of the replication rule
    import hashlib
    import math

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(90)]
    weights = {"a": 0.5, "b": 0.3, "c": 0.2}
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    got = {}
    for r in tx.mixture_oversample(docs, "doc_id", "source", weights).collect():
        got[r["doc_id"]] = got.get(r["doc_id"], 0) + 1

    n = len(rows)
    ns = {s: sum(1 for _, x in rows if x == s) for s in weights}
    expected = {}
    for i, s in rows:
        f = weights[s] * float(n) / float(ns[s])
        k = math.floor(f)
        frac_q = math.floor((f - k) * 65536)
        h = int(hashlib.md5(f"{i}+".encode()).hexdigest()[:8], 16) % 65536
        c = int(k) + (1 if h < frac_q else 0)
        if c > 0:
            expected[i] = c
    assert got == expected


def test_shuffle_shards_matches_python_reference(spark):
    import hashlib

    docs = spark.createDataFrame(
        [(i,) for i in range(120)], "doc_id long"
    )
    out = tx.shuffle_shards(docs, "doc_id", n_shards=5, seed="q").collect()
    keys = {
        i: hashlib.md5(f"q:{i}".encode()).hexdigest() for i in range(120)
    }
    shards = {i: int(k[:8], 16) % 5 for i, k in keys.items()}
    pos = {}
    for sh in range(5):
        members = sorted(
            (k, i) for i, k in keys.items() if shards[i] == sh
        )
        for p, (_, i) in enumerate(members, start=1):
            pos[i] = (sh, p)
    got = {r["doc_id"]: (r["shard"], r["pos"]) for r in out}
    assert got == pos


def test_length_batches_invariants(spark):
    rows = [(i, 10 + (i * 37) % 100) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    out = tx.length_batches(
        df, "doc_id", "n", bin_width=16, batch_size=8, n_salts=3, seed="x"
    ).collect()
    assert len(out) == 400
    cells = {}
    for r in out:
        assert r["bucket"] == r["n"] // 16
        cells.setdefault((r["bucket"], r["salt"]), []).append(
            (r["batch_id"], r["pos"])
        )
    for cell, members in cells.items():
        members.sort()
        # batches fill densely: pos is 1..batch_size per batch, only the
        # LAST batch of a cell may be partial
        n = len(members)
        for idx, (b, p) in enumerate(members):
            assert b == idx // 8 and p == idx % 8 + 1
    # n_salts=1 puts each bucket in one cell (exact single-cell batching)
    out1 = tx.length_batches(
        df, "doc_id", "n", bin_width=16, batch_size=8, n_salts=1, seed="x"
    ).collect()
    assert {r["salt"] for r in out1} == {0}


def test_strip_boilerplate_lines_semantics(spark):
    """Line-dedup contract: hot lines (df >= min_df, trimmed-non-empty)
    drop everywhere; order and empty lines of kept text survive; a doc
    whose every line was boilerplate comes back as the empty string; and
    empty lines never count toward hotness."""
    docs = spark.createDataFrame(
        [
            (1, "alpha one\nFOOTER\n\nbody a\nFOOTER"),
            (2, "FOOTER\nbody b\n"),
            (3, "FOOTER"),
            (4, "\n\n"),  # only empty lines: untouched, never hot
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["stripped"]
        for r in dd.strip_boilerplate_lines(
            docs, "doc_id", "text", min_df=2
        ).collect()
    }
    assert got[1] == "alpha one\n\nbody a"  # both FOOTERs gone, gap kept
    assert got[2] == "body b\n"             # trailing empty line kept
    assert got[3] == ""                     # fully boilerplate
    assert got[4] == "\n\n"                 # empty lines are not boilerplate
    # NULL text stays NULL — never silently rewritten to the empty string
    docs_null = docs.union(
        spark.createDataFrame([(5, None)], "doc_id long, text string")
    )
    got5 = {
        r["doc_id"]: r["stripped"]
        for r in dd.strip_boilerplate_lines(
            docs_null, "doc_id", "text", min_df=2
        ).collect()
    }
    assert got5[5] is None and got5[3] == ""
    hot = dd.boilerplate_lines(docs, "doc_id", "text", min_df=2).collect()
    assert len(hot) == 1 and hot[0]["df"] == 3


def test_strip_boilerplate_envelope_refuses(spark):
    """The hot-line broadcast refuses loudly past the envelope instead of
    shipping an unbounded set."""
    import pytest

    docs = spark.createDataFrame(
        [(1, "x\ny"), (2, "x\ny")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="envelope"):
        dd.strip_boilerplate_lines(
            docs, "doc_id", "text", min_df=2, max_hot_lines=1
        )


def test_strip_boilerplate_matches_python_reference(spark):
    """Seeded random multi-line corpora cross-checked exactly against a
    pure-Python line-dedup reference (trimmed-non-empty lines with
    df >= min_df drop everywhere, order and empty lines preserved)."""
    import random

    for seed in range(4):
        rng = random.Random(seed)
        vocab = [f"line_{seed}_{i}" for i in range(6)] + ["", "  "]
        docs = []
        for d in range(12):
            n = rng.randint(0, 5)
            docs.append((d, "\n".join(rng.choice(vocab) for _ in range(n + 1))))
        min_df = 2
        df_count = {}
        for d, t in docs:
            for ln in set(t.split("\n")):
                if ln.strip():
                    df_count[ln] = df_count.get(ln, 0) + 1
        hot = {ln for ln, c in df_count.items() if c >= min_df}
        want = {
            d: "\n".join(ln for ln in t.split("\n") if ln not in hot)
            for d, t in docs
        }
        got = {
            r["doc_id"]: r["stripped"]
            for r in dd.strip_boilerplate_lines(
                spark.createDataFrame(docs, "doc_id long, text string"),
                "doc_id",
                "text",
                min_df=min_df,
            ).collect()
        }
        assert got == want, f"seed {seed}"


def test_contaminated_spans_and_trim(spark):
    """Span-level decontamination: only the benchmark-overlapping token
    range trims; the rest of the doc (and clean docs) pass verbatim, and
    the envelope refuses an oversized benchmark gram set loudly."""
    import pytest

    bench_txt = " ".join(f"b{i}" for i in range(8))  # one 8-gram exactly
    clean = " ".join(f"c{i}" for i in range(12))
    mixed = "lead in " + bench_txt + " tail out"
    docs = spark.createDataFrame(
        [(1, mixed), (2, clean)], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(100, bench_txt)], "doc_id long, text string")
    spans = dd.contaminated_spans(docs, bench, "doc_id", "text", k=8).collect()
    assert [(r["doc_id"], r["span_start"], r["span_end"]) for r in spans] == [
        (1, 2, 10)
    ]
    got = {
        r["doc_id"]: r["trimmed"]
        for r in dd.trim_duplicate_spans(
            docs,
            dd.contaminated_spans(docs, bench, "doc_id", "text", k=8),
            "doc_id",
            "text",
        ).collect()
    }
    assert got[1] == "lead in tail out"
    assert got[2] == clean
    with pytest.raises(ValueError, match="envelope"):
        dd.contaminated_spans(
            docs, bench, "doc_id", "text", k=8, max_bench_grams=0
        )


def test_cluster_splits_eliminate_leakage(spark):
    """The audit→fix arc: plain id-hash splits leak (the fixture has
    real cross-split near-dup pairs); cluster-aware splits put every
    verified near-dup component in one split, so the SAME pair relation
    straddles nothing."""
    from chainweb_data_spark.queries import query_fns

    sf = "/root/testdata/sf0.01"
    fns = query_fns()
    leaks = fns["split_leakage_pairs"](spark, sf)
    assert leaks.count() > 0  # the bug is real under id-hash splits
    fixed = fns["split_by_cluster_docs"](spark, sf).select("doc_id", "split")
    pairs = leaks.select("id_a", "id_b")  # the known-leaking pairs
    joined = (
        pairs.join(
            fixed.select(
                F.col("doc_id").alias("id_a"), F.col("split").alias("sa")
            ),
            "id_a",
        )
        .join(
            fixed.select(
                F.col("doc_id").alias("id_b"), F.col("split").alias("sb")
            ),
            "id_b",
        )
    )
    assert joined.filter(F.col("sa") != F.col("sb")).count() == 0
