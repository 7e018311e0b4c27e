"""Recall/cost-frontier building blocks: the radius-r multi-probe
bucket expression must enumerate exactly the hamming-<=r ball around
the query bucket, and ivf_candidates must be ivf_topk's candidate set
(the frontier's cost denominator is that set's size)."""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pixcrawler_spark.operators import similarity


def _ball(bucket: str, radius: int) -> set[str]:
    """All bit-strings within hamming distance <= radius of bucket."""
    n = len(bucket)
    out = {bucket}
    for r in range(1, radius + 1):
        for pos in combinations(range(n), r):
            b = list(bucket)
            for p in pos:
                b[p] = "0" if b[p] == "1" else "1"
            out.add("".join(b))
    return out


@pytest.mark.parametrize("n_planes,radius", [(4, 1), (6, 2), (5, 3)])
def test_multiprobe_expr_enumerates_exact_hamming_ball(
    spark, n_planes, radius
):
    buckets = ["0" * n_planes, "1" * n_planes, ("10" * n_planes)[:n_planes]]
    df = spark.createDataFrame([(b,) for b in buckets], "bucket string")
    rows = df.select(
        "bucket",
        similarity.multiprobe_buckets_expr(
            F.col("bucket"), n_planes, radius
        ).alias("pb"),
    ).collect()
    for row in rows:
        expect = _ball(row["bucket"], radius)
        got = list(row["pb"])
        # exact set AND no duplicate probes (each bucket joined once)
        assert len(got) == len(set(got))
        assert set(got) == expect
        assert len(got) == sum(
            len(list(combinations(range(n_planes), r)))
            for r in range(radius + 1)
        )


def test_ivf_candidates_superset_contains_topk_and_counts_probed_lists(
    spark,
):
    rng = np.random.default_rng(7)
    n = 120
    vecs = rng.normal(size=(n, 8)).round(3)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    kc = similarity.centroids_for(n)
    cand = similarity.ivf_candidates(
        df, "vec_id", "embedding", query_id=0, k_centroids=kc, nprobe=2
    )
    cand_ids = {r["vec_id"] for r in cand.collect()}
    top = similarity.ivf_topk(
        df, "vec_id", "embedding", query_id=0, k=10, k_centroids=kc, nprobe=2
    )
    top_ids = {r["vec_id"] for r in top.collect()}
    assert top_ids <= cand_ids
    assert len(top_ids) == 10
    # candidate count equals the membership of the 2 probed lists,
    # recomputed independently in numpy (same codebook/tiebreak rules)
    def cos(a, b):
        return round(
            float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6
        )

    cents = vecs[:kc]
    assign = []
    qprobe = None
    for i, v in enumerate(vecs):
        ranked = sorted(range(kc), key=lambda c: (-cos(v, cents[c]), c))
        assign.append(ranked[0])
        if i == 0:
            qprobe = set(ranked[:2])
    expect = {i for i in range(n) if assign[i] in qprobe}
    assert cand_ids == expect
