"""Invariant tests for the round-5 second batch: URL template mining,
bounded k-core peeling, MG-pruned exact heavy hitters, median/MAD
latency anomalies, and positional phrase search.

DuckDB oracle equivalence is covered by tests/test_queries_oracle.py
(parameterized over the whole registry) and ANSI-on materialization by
tests/test_ansi_sweep.py; this file pins the SEMANTIC invariants the
oracle comparison cannot express — fixpoint convergence, pruning
losslessness, partitioning independence, brute-force equality.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
from pyspark.sql import functions as F

from pixcrawler_spark.queries import REGISTRY
from pixcrawler_spark.queries.roundseven import (
    KCORE_K,
    MG_COUNTERS,
    PHRASE_W1,
    PHRASE_W2,
    TEMPLATE_SPACE_MIN,
    _KC_DST,
    _KC_SRC,
    _mg_candidates,
)

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


# ---------------------------------------------------------------------------
# crawl_url_template_mining
# ---------------------------------------------------------------------------
def test_template_mining_shapes(spark):
    pdf = REGISTRY["crawl_url_template_mining"].fn(spark, SF).toPandas()
    # templating must leave no raw digit runs in any template
    assert not pdf["template"].str.contains(r"[0-9]").any()
    expected = {
        "/product/(n)/view",
        "/session/(h)/cart",
        "/(n)/(n)/post-(n)",
        "/about",
    }
    assert set(pdf["template"]) == expected
    # flag semantics: parameterized AND big enough
    for _, r in pdf.iterrows():
        assert r["is_crawl_space"] == (
            r["n_urls"] >= TEMPLATE_SPACE_MIN and "(" in r["template"]
        )


def test_template_mining_counts_partition(spark):
    """n_urls per (domain, template) partitions the distinct URL set."""
    pdf = REGISTRY["crawl_url_template_mining"].fn(spark, SF).toPandas()
    n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
    # every synthesized URL is distinct (orderkey is embedded in 3 of 4
    # shapes; the 4th collapses to one URL per domain)
    assert pdf["n_urls"].sum() <= n_orders
    assert (pdf["n_urls"] >= 1).all()


# ---------------------------------------------------------------------------
# graph_kcore
# ---------------------------------------------------------------------------
def _edges_pandas(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    lo = (ev["user_id"] % _KC_SRC).astype("int64")
    hi = (ev["event_id"] % _KC_DST).astype("int64")
    a, b = lo.where(lo < hi, hi), hi.where(lo < hi, lo)
    e = pd.DataFrame({"lo": a, "hi": b})
    return e[e["lo"] != e["hi"]].drop_duplicates(ignore_index=True)


def _peel_to_fixpoint(edges: pd.DataFrame, k: int):
    """Exact k-core by peeling until nothing changes."""
    e = edges
    while True:
        deg = Counter(e["lo"].tolist()) + Counter(e["hi"].tolist())
        keep = {n for n, d in deg.items() if d >= k}
        nxt = e[e["lo"].isin(keep) & e["hi"].isin(keep)]
        if len(nxt) == len(e):
            return keep, nxt
        e = nxt


def test_kcore_bounded_rounds_reach_fixpoint(spark):
    """At test scale the bounded peel converges: the query's in_core
    set equals the exact fixpoint k-core."""
    pdf = REGISTRY["graph_kcore"].fn(spark, SF).toPandas()
    edges = _edges_pandas(spark, SF)
    core_nodes, core_edges = _peel_to_fixpoint(edges, KCORE_K)
    got = set(pdf[pdf["in_core"]]["domain"])
    assert got == core_nodes
    # core_degree: degree within the final induced subgraph
    deg = Counter(core_edges["lo"].tolist()) + Counter(
        core_edges["hi"].tolist()
    )
    for _, r in pdf.iterrows():
        assert r["core_degree"] == deg.get(r["domain"], 0)


def test_kcore_basic_invariants(spark):
    pdf = REGISTRY["graph_kcore"].fn(spark, SF).toPandas()
    # a removed node keeps no core edges; core degree never exceeds
    # the original degree; core members had original degree >= k
    assert (pdf.loc[~pdf["in_core"], "core_degree"] == 0).all()
    assert (pdf["core_degree"] <= pdf["degree"]).all()
    assert (pdf.loc[pdf["in_core"], "degree"] >= KCORE_K).all()


# ---------------------------------------------------------------------------
# sketch_spacesaving_topk
# ---------------------------------------------------------------------------
def _exact_heavy_hitters(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    host = F.concat(
        F.lit("h"),
        F.when(F.col("event_id") % 2 == 0, F.col("user_id") % 3)
        .otherwise(3 + (F.col("user_id") % 997))
        .cast("string"),
    )
    pdf = ev.select(host.alias("host")).groupBy("host").count().toPandas()
    n = pdf["count"].sum()
    return set(pdf[pdf["count"] * (MG_COUNTERS + 1) > n]["host"]), int(n)


def test_spacesaving_equals_exact(spark):
    """The MG candidate pass loses no heavy hitter: output == the
    brute-force full-groupBy answer."""
    for sf in (SF, SF01):
        pdf = REGISTRY["sketch_spacesaving_topk"].fn(spark, sf).toPandas()
        want, n = _exact_heavy_hitters(spark, sf)
        assert set(pdf["host"]) == want, sf
        assert (pdf["n_fetches"] * (MG_COUNTERS + 1) > n).all()


def test_spacesaving_partitioning_invariant(spark):
    """Output is identical under different input partitionings — the
    MG summaries differ, but the exact-count filter makes the final
    answer partitioning-independent."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    host = F.concat(
        F.lit("h"),
        F.when(F.col("event_id") % 2 == 0, F.col("user_id") % 3)
        .otherwise(3 + (F.col("user_id") % 997))
        .cast("string"),
    )
    results = []
    for nparts in (1, 5, 32):
        hosts = ev.select(host.alias("host")).repartition(nparts)
        summ = hosts.mapInPandas(
            _mg_candidates, "host string, cnt long"
        ).persist()
        cand = (
            summ.where(F.col("host").isNotNull())
            .select("host")
            .distinct()
        )
        total = summ.agg(F.sum("cnt").cast("bigint").alias("n_total"))
        out = (
            hosts.join(F.broadcast(cand), "host", "left_semi")
            .groupBy("host")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_fetches"))
            .crossJoin(F.broadcast(total))
            .where(
                F.col("n_fetches") * (MG_COUNTERS + 1) > F.col("n_total")
            )
            .select("host", "n_fetches")
            .toPandas()
            .sort_values("host", ignore_index=True)
        )
        results.append(out)
    assert results[0].equals(results[1])
    assert results[0].equals(results[2])


def test_mg_summary_is_bounded():
    """The per-partition summary never exceeds MG_COUNTERS candidate
    entries (+ the one row-count sentinel), and the sentinel carries
    the exact partition row count."""
    batches = [
        pd.DataFrame({"host": [f"h{i % 40}" for i in range(j, j + 500)]})
        for j in range(0, 5000, 500)
    ]
    (out,) = list(_mg_candidates(iter(batches)))
    cand = out[out["host"].notna()]
    sentinel = out[out["host"].isna()]
    assert len(cand) <= MG_COUNTERS
    assert len(sentinel) == 1
    assert sentinel["cnt"].iloc[0] == 5000
    assert (cand["cnt"] == 0).all()


# ---------------------------------------------------------------------------
# crawl_latency_anomaly
# ---------------------------------------------------------------------------
def test_latency_anomaly_matches_pandas(spark):
    pdf = (
        REGISTRY["crawl_latency_anomaly"].fn(spark, SF)
        .toPandas()
        .set_index("host")
    )
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["host"] = "host" + (ev["user_id"] % 50).astype(str)
    for host, g in ev.groupby("host"):
        med = g["value"].median()
        adev = (g["value"] - med).abs()
        mad = adev.median()
        row = pdf.loc[host]
        assert row["n_fetches"] == len(g)
        assert abs(row["med_latency"] - round(med, 6)) < 1e-9
        assert abs(row["mad_latency"] - round(mad, 6)) < 1e-9
        assert row["n_anomalies"] == int((adev > 4.4478 * mad).sum())


def test_latency_anomaly_bounds(spark):
    # sf0.001 has only 15 distinct users; every host bucket present in
    # the data must appear exactly once
    pdf = REGISTRY["crawl_latency_anomaly"].fn(spark, SF).toPandas()
    n_hosts = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select((F.col("user_id") % 50).alias("h"))
        .distinct()
        .count()
    )
    assert len(pdf) == n_hosts
    assert (pdf["mad_latency"] >= 0).all()
    assert (pdf["n_anomalies"] <= pdf["n_fetches"]).all()


# ---------------------------------------------------------------------------
# text_phrase_postings
# ---------------------------------------------------------------------------
def test_phrase_postings_matches_python(spark):
    pdf = (
        REGISTRY["text_phrase_postings"].fn(spark, SF)
        .toPandas()
        .set_index("doc_id")["n_occurrences"]
        .to_dict()
    )
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    want = {}
    for _, r in docs.iterrows():
        toks = re.split(r"\s+", r["text"].strip().lower())
        n = sum(
            1
            for i in range(len(toks) - 1)
            if toks[i] == PHRASE_W1 and toks[i + 1] == PHRASE_W2
        )
        if n:
            want[r["doc_id"]] = n
    assert pdf == want
    assert all(v >= 1 for v in pdf.values())
