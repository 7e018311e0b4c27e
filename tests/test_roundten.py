"""Invariant tests for the roundten batch: Gini bounds + brute-force
recompute, KS statistic vs a direct ECDF scan, conditional-GET
decision partition, and canonical election vs a pandas groupby."""

from __future__ import annotations

import hashlib
import math

import numpy as np

from pixcrawler_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def test_gini_matches_bruteforce(spark):
    row = (
        REGISTRY["stats_gini_concentration"].fn(spark, SF).toPandas().iloc[0]
    )
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    counts = np.sort(
        ev.groupby(ev["user_id"] % 40).size().to_numpy()
    ).astype(float)
    n, tot = len(counts), counts.sum()
    i = np.arange(1, n + 1)
    gini = (2.0 * (i * counts).sum()) / (n * tot) - (n + 1.0) / n
    assert row["n_domains"] == n
    assert row["total_pages"] == tot
    assert abs(row["gini"] - round(gini, 6)) < 1e-9
    assert 0.0 <= row["gini"] < 1.0


def test_ks_matches_bruteforce(spark):
    row = REGISTRY["stats_ks_drift"].fn(spark, SF).toPandas().iloc[0]
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    bins = np.floor(ev["value"].to_numpy() * 100).astype(np.int64)
    grp = (ev["event_id"].to_numpy() % 2).astype(np.int64)
    xs = np.unique(bins)
    a, b = bins[grp == 0], bins[grp == 1]
    f_a = np.searchsorted(np.sort(a), xs, side="right") / len(a)
    f_b = np.searchsorted(np.sort(b), xs, side="right") / len(b)
    d = np.abs(f_a - f_b).max()
    crit = 1.358 * math.sqrt((len(a) + len(b)) / (len(a) * len(b)))
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    assert abs(row["ks_d"] - round(d, 6)) < 1e-9
    assert abs(row["ks_crit"] - round(crit, 6)) < 1e-9
    assert bool(row["drifted"]) == (d > crit)


def test_conditional_get_partitions_frontier(spark):
    pdf = REGISTRY["crawl_conditional_get"].fn(spark, SF).toPandas()
    orders = spark.read.parquet(f"{SF}/orders.parquet").toPandas()
    # every URL is decided exactly once, decisions are the known set
    assert pdf["n_urls"].sum() == len(orders)
    assert set(pdf["decision"]) <= {
        "FRESH_SKIP",
        "REVALIDATE_304",
        "REFETCH_200",
    }
    # revisit policy must actually save traffic: full refetches are a
    # strict minority (only stale AND changed URLs)
    refetch = pdf[pdf["decision"] == "REFETCH_200"]["n_urls"].sum()
    assert refetch < len(orders) / 2


def test_canonical_election_matches_pandas(spark):
    pdf = (
        REGISTRY["dedup_cluster_canonical"]
        .fn(spark, SF)
        .toPandas()
        .set_index("cluster_id")
        .sort_index()
    )
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    docs["cluster_id"] = [
        f"{la}:{hashlib.md5(f'clu:{s}'.encode()).hexdigest()[:1]}"
        for la, s in zip(docs["lang"], docs["source"])
    ]
    for cid, grp in docs.groupby("cluster_id"):
        want = grp.sort_values(
            ["n_chars", "doc_id"], ascending=[False, True]
        ).iloc[0]
        got = pdf.loc[cid]
        assert got["canonical_doc_id"] == want["doc_id"], cid
        assert got["n_members"] == len(grp)
        assert (
            got["bytes_dropped"]
            == grp["n_chars"].sum() - want["n_chars"]
        )
    # one canonical per cluster, clusters are multi-member somewhere
    assert pdf.index.is_unique
    assert (pdf["n_members"] > 1).any()
