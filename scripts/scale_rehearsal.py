#!/usr/bin/env python
"""sf1 scale rehearsal: empirically confirm the dedup/ANN headliners grow
sub-quadratically before claiming the 100× story (r02 verdict stretch item).

Builds an N×-scaled copy of sf0.1's documents/embeddings under /tmp (text
perturbed per replica so replicas are near- but not exact duplicates;
embedding tails perturbed deterministically), then times the pair-generating
headline queries at sf0.1 and at the scaled dir and prints one JSON line
with the times and growth ratios.  A query with quadratic pair cost would
show ratio ≈ N²; the capped/banded designs should stay near N·log-ish.

Two corpus regimes, because they scale differently BY CONSTRUCTION:

- near-dup (default): each base doc gets N-1 near-twin replicas (one token
  appended).  True pair output per shingle grows ~N², so this is the
  adversarial case the DF/bucket caps exist for — the measured growth shows
  how well the rails hold when the DATA is quadratic.
- distinct (--distinct): replicas get a replica token interleaved between
  every base token, so cross-replica shingle overlap vanishes — the normal
  "10× more content" case, where a healthy plan should grow ~linearly.

Usage:  python scripts/scale_rehearsal.py [multiplier=10] [--distinct]
(Run on an idle machine — same caveat as bench.py.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = [
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_near_pairs",
    "ann_lsh_topk",
    "embed_cosine_topk",  # exact tier: FLOPs grow N² but BLAS amortizes
]


def build_scaled(spark, mult: int, distinct: bool = False) -> str:
    from pyspark.sql import functions as F

    out = f"/tmp/cds_scale/sf0.1x{mult}{'d' if distinct else ''}"
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    reps = spark.range(0, mult).select(F.col("id").alias("rep"))

    docs = spark.read.parquet(os.path.join(BASE_SF, "documents.parquet"))
    n_docs = docs.count()
    if distinct:
        # suffix every token with the replica id: token universes of
        # different replicas are disjoint, so the shingle universe grows N×
        # while every per-shingle document frequency stays at its base value
        # — the clean "N× new content" regime.  (Interleaving a shared
        # separator token instead would COLLAPSE 3-gram entropy to 2-word
        # pairs and inflate dfs — measured 76× growth; don't.)
        perturbed = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda t: F.concat(t, F.lit("~"), F.col("rep")),
            ),
            " ",
        )
    else:
        # append one replica token: replicas are near-duplicates (the
        # realistic hard case for dedup) rather than byte-identical
        perturbed = F.concat_ws(
            " ", F.col("text"), F.concat(F.lit("rep"), F.col("rep"))
        )
    scaled_docs = (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("rep") * n_docs).alias("doc_id"),
            F.when(F.col("rep") == 0, F.col("text")).otherwise(perturbed).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )
    scaled_docs.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))

    emb = spark.read.parquet(os.path.join(BASE_SF, "embeddings.parquet"))
    n_vecs = emb.count()
    scaled_emb = (
        emb.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") + F.col("rep") * n_vecs).alias("vec_id"),
            # deterministic tail perturbation keyed by replica: rotates
            # vectors slightly so buckets/neighbors differ per replica
            F.transform(
                F.col("embedding"),
                lambda x, i: x
                + (F.col("rep").cast("float") * (i.cast("float") + F.lit(1.0)))
                / F.lit(1000.0),
            ).alias("embedding"),
            "label",
        )
    )
    scaled_emb.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))
    open(marker, "w").close()
    return out


def timed(fn, spark, sf_dir) -> float:
    fn(spark, sf_dir).collect()  # warm: codegen + page cache
    df = fn(spark, sf_dir)
    t0 = time.perf_counter()
    df.collect()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    from chainweb_data_spark.queries import query_fns
    from chainweb_data_spark.session import get_spark

    args = [a for a in sys.argv[1:] if a != "--distinct"]
    distinct = "--distinct" in sys.argv[1:]
    mult = int(args[0]) if args else 10
    spark = get_spark("cds-scale-rehearsal")
    fns = query_fns()
    scaled_dir = build_scaled(spark, mult, distinct)

    result = {
        "multiplier": mult,
        "regime": "distinct" if distinct else "near_dup",
        "base_sf_dir": BASE_SF,
        "queries": {},
    }
    for name in QUERIES:
        t_base = timed(fns[name], spark, BASE_SF)
        t_scaled = timed(fns[name], spark, scaled_dir)
        result["queries"][name] = {
            "base_s": t_base,
            "scaled_s": t_scaled,
            "growth": round(t_scaled / max(t_base, 1e-9), 2),
            "quadratic_would_be": mult * mult,
        }

    # the gated ann_lsh_topk pins 16 planes for its oracle, so bucket
    # occupancy — and rerank pair count — grows linearly with the corpus
    # and the query goes ~quadratic at 10×.  The production knob is
    # auto_num_planes (planes ∝ log₂ n keeps occupancy constant): measure
    # it so the rehearsal shows the knob working, not just documented.
    def ann_auto(spark_, sf_dir):
        from chainweb_data_spark.operators.similarity import lsh_ann_topk
        from chainweb_data_spark.sources.tables import load_table

        emb = load_table(spark_, sf_dir, "embeddings")
        return lsh_ann_topk(emb, "vec_id", "embedding", k=5, num_planes=None)

    t_base = timed(ann_auto, spark, BASE_SF)
    t_scaled = timed(ann_auto, spark, scaled_dir)
    result["queries"]["ann_lsh_topk_autoplanes"] = {
        "base_s": t_base,
        "scaled_s": t_scaled,
        "growth": round(t_scaled / max(t_base, 1e-9), 2),
        "quadratic_would_be": mult * mult,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
