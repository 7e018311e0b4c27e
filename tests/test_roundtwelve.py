"""Invariant tests for the roundtwelve batch: Jain's index bounds +
brute force, Zipf slope on planted Zipfian vs uniform spectra,
compaction bin invariants, capture-recapture estimator math."""

from __future__ import annotations

import math

import numpy as np

from pixcrawler_spark.queries import REGISTRY
from pixcrawler_spark.queries.roundtwelve import (
    COMPACT_TARGET_MB,
    CR_POP_MOD,
    FAIR_N_HOSTS,
)

SF = "/root/testdata/sf0.001"


def test_jains_matches_bruteforce(spark):
    row = REGISTRY["crawl_fairness_jains"].fn(spark, SF).toPandas().iloc[0]
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    x = ev.groupby(ev["user_id"] % FAIR_N_HOSTS).size().to_numpy(float)
    j = x.sum() ** 2 / (len(x) * (x**2).sum())
    assert row["n_hosts"] == len(x)
    assert abs(row["jains_index"] - round(j, 6)) < 1e-9
    # bounds: 1/n <= J <= 1
    assert 1.0 / len(x) - 1e-9 <= row["jains_index"] <= 1.0 + 1e-9
    assert abs(row["max_share"] - round(x.max() / x.sum(), 6)) < 1e-9


def test_zipf_gate_separates_distributions(spark):
    """The fixture's random-vocab text must FAIL the Zipf gate (flat
    spectrum), and a planted Zipfian spectrum must PASS the same OLS
    — run directly on the slope formula for the planted side."""
    row = REGISTRY["text_zipf_fit"].fn(spark, SF).toPandas().iloc[0]
    assert not bool(row["is_zipfian"])  # uniform vocab is not Zipfian
    assert row["slope"] > -0.5  # flat, well above natural text's -1
    # planted: freq_r = C / r  -> slope must be ~ -1
    r = np.arange(1, 301)
    lx, ly = np.log(r), np.log(1e6 / r)
    slope = np.cov(lx, ly, bias=True)[0, 1] / lx.var()
    assert abs(slope + 1.0) < 1e-9


def test_compaction_bins_are_target_sized(spark):
    pdf = REGISTRY["store_compaction_plan"].fn(spark, SF).toPandas()
    li = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()
    # conservation: every file lands in exactly one bin
    assert pdf["bin_mb"].sum() == int(li["l_quantity"].sum())
    assert pdf["n_files"].sum() == len(li)
    for part, grp in pdf.groupby("part"):
        grp = grp.sort_values("bin_id")
        # bin ids are contiguous from 0
        assert list(grp["bin_id"]) == list(range(len(grp)))
        # running-sum packing: every bin except the last lands within
        # one max-file-size of the target on either side
        max_file = int(li["l_quantity"].max())
        assert (
            grp["bin_mb"].iloc[:-1] > COMPACT_TARGET_MB - max_file
        ).all(), part
        assert (grp["bin_mb"] < COMPACT_TARGET_MB + max_file).all()


def test_capture_recapture_estimator_math(spark):
    row = (
        REGISTRY["stats_capture_recapture"].fn(spark, SF).toPandas().iloc[0]
    )
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    urls = (ev["event_id"] % CR_POP_MOD).astype(int)
    s1 = set(urls[ev["event_id"] % 3 == 0])
    s2 = set(urls[ev["event_id"] % 3 == 1])
    m = len(s1 & s2)
    assert row["n1"] == len(s1) and row["n2"] == len(s2)
    assert row["n_overlap"] == m
    assert abs(
        row["petersen_est"] - round(len(s1) * len(s2) / m, 4)
    ) < 1e-9
    chapman = (len(s1) + 1) * (len(s2) + 1) / (m + 1) - 1
    assert abs(row["chapman_est"] - round(chapman, 4)) < 1e-9
    assert row["true_n"] == urls.nunique()
    # the estimate brackets the truth within a loose factor
    assert 0.3 * row["true_n"] <= row["chapman_est"] <= 3 * row["true_n"]
