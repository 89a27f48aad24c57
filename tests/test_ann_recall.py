"""Recall floors for the gated ANN variants (round-6 verdict #3).

`scripts/ann_recall.py` measures recall@k but nothing GATED it — a
candidate-pruning "optimization" could silently trade recall for speed
(the class of bug round 6's per-cell top-k emission fix could have
introduced).  These tests pin recall@5 on the sf0.01 gate fixture against
the exact matmul tier.

Floor calibration: the fixture's embeddings are near-isotropic synthetic
vectors — the ADVERSARIAL regime for ANN, where no cluster structure
exists to exploit and recall ≈ probed fraction (ann_recall.py's header
documents this; clustered real-text embeddings sit far higher at the same
knobs).  Measured on the fixture this round: lsh_auto 0.394, ivf 0.403,
ivfpq_rerank 0.390.  The floors below are measured-minus-slack (≥ 0.34),
not an absolute 0.95 — the quantizers are deterministic (seeded planes,
md5-sampled k-means), so a drop below the floor is a code change, not
noise.  The negative control proves the gate bites: artificially lowering
nprobe to 1 must fall well under the floor.
"""

import pytest
from pyspark.sql import functions as F  # noqa: F401

SF = "/root/testdata/sf0.01"

FLOORS = {
    "ann_lsh_auto_topk": 0.35,
    "ann_ivf_topk": 0.35,
    "ann_ivfpq_rerank_topk": 0.34,
}


def _sets(rows):
    out = {}
    for r in rows:
        out.setdefault(r[0], set()).add(r[1])
    return out


@pytest.fixture(scope="module")
def exact_topk(spark):
    from chainweb_data_spark.queries import query_fns

    rows = (
        query_fns()["embed_cosine_topk"](spark, SF)
        .select("vec_id", "neighbor_id")
        .collect()
    )
    return _sets(rows)


def _recall(approx: dict, exact: dict) -> float:
    return sum(
        len(approx.get(q, set()) & nbrs) / len(nbrs)
        for q, nbrs in exact.items()
    ) / len(exact)


@pytest.mark.heavy
@pytest.mark.parametrize("name", sorted(FLOORS))
def test_gated_ann_variant_holds_recall_floor(spark, exact_topk, name):
    from chainweb_data_spark.queries import query_fns

    rows = (
        query_fns()[name](spark, SF).select("vec_id", "neighbor_id").collect()
    )
    recall = _recall(_sets(rows), exact_topk)
    assert recall >= FLOORS[name], (
        f"{name} recall@5 {recall:.4f} fell below its floor "
        f"{FLOORS[name]} — a candidate-pruning change traded recall away"
    )


def test_lowered_nprobe_fails_the_floor(spark, exact_topk):
    """The gate must BITE: the same IVF operator with nprobe artificially
    lowered to 1 (the gated config probes 2) loses roughly half its
    probed fraction and must land clearly under the ann_ivf_topk floor —
    if this ever passes the floor, the floor is too loose to catch a
    halved candidate set."""
    from chainweb_data_spark.operators import similarity as sim
    from chainweb_data_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    rows = (
        sim.ivf_topk(
            emb, "vec_id", "embedding", k=5, n_cells=16, nprobe=1
        )
        .select("vec_id", "neighbor_id")
        .collect()
    )
    recall = _recall(_sets(rows), exact_topk)
    assert recall < FLOORS["ann_ivf_topk"] - 0.05, (
        f"nprobe=1 recall {recall:.4f} is too close to the floor — "
        "tighten the floor"
    )
