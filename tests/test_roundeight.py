"""Invariant tests for the round-5 third batch: Poisson-bootstrap
CIs, bucketed IP-range join, readability scoring, mojibake detection.

DuckDB oracle equivalence is covered by tests/test_queries_oracle.py,
ANSI-on materialization by tests/test_ansi_sweep.py; this file pins
the semantics the oracle cannot: statistical sanity, partition-of-
space exactness, equivalence to the naive non-equi plan, and
Python-recomputed formulas.
"""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from pixcrawler_spark.queries import REGISTRY
from pixcrawler_spark.queries.roundeight import (
    _IP_SPACE,
    _PB_CDF,
    PB_REPLICAS,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# stats_poisson_bootstrap
# ---------------------------------------------------------------------------
def test_bootstrap_ci_sanity(spark):
    row = (
        REGISTRY["stats_poisson_bootstrap"].fn(spark, SF).toPandas().iloc[0]
    )
    assert row["ci_lo"] < row["point_estimate"] < row["ci_hi"]
    assert row["boot_se"] > 0
    # the bootstrap distribution centers on the point estimate:
    # |boot_mean - point| should be well within a few standard errors
    assert abs(row["boot_mean"] - row["point_estimate"]) < 3 * row["boot_se"]


def test_bootstrap_weights_poisson_shape(spark):
    """Mean Poisson(1) weight over all (replica, row) draws is ~1 and
    the k=0 fraction is ~e^-1 — the deterministic inverse-CDF really
    produces the Poisson shape."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    reps = ev.select(
        "event_id",
        F.explode(F.sequence(F.lit(0), F.lit(PB_REPLICAS - 1))).alias(
            "replica"
        ),
    )
    from pixcrawler_spark.operators import sketches as sk

    u = (
        sk.h60(
            F.concat(
                F.lit("pb:"),
                F.col("replica").cast("string"),
                F.lit(":"),
                F.col("event_id").cast("string"),
            )
        )
        % 1000000
    ) / F.lit(1000000.0)
    w = F.lit(6)
    for k in range(len(_PB_CDF) - 1, -1, -1):
        w = F.when(u < _PB_CDF[k], F.lit(k)).otherwise(w)
    stats = reps.select(w.alias("w")).agg(
        F.avg("w").alias("mean_w"),
        F.avg((F.col("w") == 0).cast("int")).alias("p0"),
    ).collect()[0]
    n = 1000 * PB_REPLICAS
    # mean 1 with var 1: 6-sigma tolerance 6/sqrt(n)
    assert abs(stats["mean_w"] - 1.0) < 6 / (n ** 0.5)
    assert abs(stats["p0"] - 0.3678794412) < 6 * (0.37 * 0.63 / n) ** 0.5


def test_bootstrap_partitioning_invariant(spark):
    """Weights are a pure row hash — the CI is identical under any
    input partitioning."""
    base = REGISTRY["stats_poisson_bootstrap"].fn(spark, SF).toPandas()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    for nparts in (1, 7):
        # identical rows, different physical layout: the rounded CI
        # columns must come back bit-for-bit identical
        probe_dir = f"/tmp/_pb_probe_{nparts}"
        ev.repartition(nparts).write.mode("overwrite").parquet(
            f"{probe_dir}/events.parquet"
        )
        got = (
            REGISTRY["stats_poisson_bootstrap"].fn(spark, probe_dir)
            .toPandas()
        )
        assert got.equals(base), nparts


# ---------------------------------------------------------------------------
# crawl_ip_range_join
# ---------------------------------------------------------------------------
def _h60_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_ip_ranges_partition_address_space(spark):
    """The synthesized ranges tile [0, 2^28) with no gaps/overlaps, so
    every address joins exactly one range: sum(n_ips) == |events|."""
    pdf = REGISTRY["crawl_ip_range_join"].fn(spark, SF).toPandas()
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert pdf["n_ips"].sum() == n_events
    # recompute the range bounds in python and bound-check the extrema
    nat = (
        spark.read.parquet(f"{SF}/nation.parquet")
        .select("n_nationkey", "n_name")
        .toPandas()
        .sort_values("n_nationkey")
    )
    wts = [1 + _h60_py(f"ipw:{k}") % 7 for k in nat["n_nationkey"]]
    tot = sum(wts)
    cum = 0
    bounds = {}
    for (_, r), w in zip(nat.iterrows(), wts):
        lo = cum * _IP_SPACE // tot
        hi = (cum + w) * _IP_SPACE // tot - 1
        bounds[r["n_name"]] = (lo, hi)
        cum += w
    for _, r in pdf.iterrows():
        lo, hi = bounds[r["asn"]]
        assert lo <= r["min_ip"] <= r["max_ip"] <= hi, r["asn"]


def test_ip_range_join_equals_naive_between(spark):
    """The bucketed equi-join returns exactly what the naive broadcast
    BETWEEN join returns."""
    from pixcrawler_spark.queries.roundeight import crawl_ip_range_join

    got = (
        crawl_ip_range_join(spark, SF)
        .toPandas()
        .sort_values("asn", ignore_index=True)
    )
    # naive: recompute ranges, broadcast, theta-join
    nat = spark.read.parquet(f"{SF}/nation.parquet").toPandas().sort_values(
        "n_nationkey"
    )
    import pandas as pd

    wts = [1 + _h60_py(f"ipw:{k}") % 7 for k in nat["n_nationkey"]]
    tot, cum, rows = sum(wts), 0, []
    for (_, r), w in zip(nat.iterrows(), wts):
        rows.append(
            (
                r["n_name"],
                cum * _IP_SPACE // tot,
                (cum + w) * _IP_SPACE // tot - 1,
            )
        )
        cum += w
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ips = (ev["event_id"] * 2654435761 + ev["user_id"] * 40503) % _IP_SPACE
    recs = []
    for asn, lo, hi in rows:
        sel = ips[(ips >= lo) & (ips <= hi)]
        if len(sel):
            recs.append((asn, len(sel), int(sel.min()), int(sel.max())))
    want = pd.DataFrame(
        recs, columns=["asn", "n_ips", "min_ip", "max_ip"]
    ).sort_values("asn", ignore_index=True)
    assert got.astype(str).equals(want.astype(str))


# ---------------------------------------------------------------------------
# text_readability_score
# ---------------------------------------------------------------------------
def test_readability_matches_python(spark):
    pdf = (
        REGISTRY["text_readability_score"].fn(spark, SF)
        .toPandas()
        .set_index("doc_id")
    )
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    for _, r in docs.head(50).iterrows():
        s = r["text"].strip().lower()
        sents = re.split(r"[.!?]+\s*", s)
        n_sent = max(len(sents) - (1 if s and s[-1] in ".!?" else 0), 1)
        n_words = len(re.split(r"\s+", s))
        n_syll = max(len(re.findall(r"[aeiouy]+", s)), 1)
        fk = 0.39 * n_words / n_sent + 11.8 * n_syll / n_words - 15.59
        row = pdf.loc[r["doc_id"]]
        assert row["n_sentences"] == n_sent
        assert row["n_words"] == n_words
        assert row["n_syllables"] == n_syll
        assert abs(row["fk_grade"] - round(fk, 6)) < 1e-9


# ---------------------------------------------------------------------------
# text_mojibake_detect
# ---------------------------------------------------------------------------
def test_mojibake_planted_docs_flagged(spark):
    pdf = REGISTRY["text_mojibake_detect"].fn(spark, SF).toPandas()
    planted = pdf[pdf["doc_id"] % 13 < 2]
    clean = pdf[pdf["doc_id"] % 13 >= 2]
    assert (planted["n_markers"] >= 2).all()
    assert planted["is_mojibake"].all()
    assert (clean["n_markers"] == 0).all()
    assert (~clean["is_mojibake"]).all()
