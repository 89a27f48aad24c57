#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Query families mirror BASELINE.md's bench definition (reference
bench/Bench.hs:141-170 — code-search / event-search / account two-leg union)
plus the aggregation, join, window, pagination, dedup, text, and similarity
headliners.  Each query is fully executed (count of collected rows) after one
untimed warm-up of the session.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# headline set: one per family (SURVEY §2 / BASELINE.md bench definition)
HEADLINE = [
    "like_search",          # event-search family (Bench.hs event family)
    "doc_like_search",      # code-search family (Bench.hs code family)
    "union_legs",           # account-transfers two-leg union family
    "keyset_page",          # keyset pagination (O5)
    "pricing_summary",      # wide aggregation (A1/A7)
    "region_revenue",       # multi-join + agg (J1..J3)
    "topk_per_group",       # ranked window top-k (O7)
    "gap_detection",        # lead-window gaps (W1)
    "latest_per_user",      # latest-per-key (J6)
    "minhash_lsh_pairs",    # dedup at scale (north star)
    "ngram_jaccard_pairs",  # exact near-dup (north star)
    "text_quality",         # text analysis (north star)
    "embed_cosine_topk",    # similarity search baseline (north star)
    "ann_lsh_topk",         # ANN scale path (north star)
]


def main() -> None:
    from chainweb_data_spark.session import get_spark
    from chainweb_data_spark.queries import query_fns

    spark = get_spark("cds-bench")
    fns = query_fns()

    # warm-up: JVM, parquet footer caches, and Python/Arrow workers (untimed)
    fns["recent_events"](spark, SF_DIR).collect()
    import pandas as _pd

    spark.createDataFrame(_pd.DataFrame({"x": [1, 2]})).mapInPandas(
        lambda it: it, "x long"
    ).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        rows = fns[name](spark, SF_DIR).collect()
        timings[name] = round(time.perf_counter() - t0, 4)
        del rows

    total = round(sum(timings.values()), 4)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
