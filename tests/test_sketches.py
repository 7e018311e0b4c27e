"""Property tests for the sketch operators (operators/sketches.py):
accuracy bounds, the CMS one-sided guarantee, and — the property that
makes them usable at 10^10 rows — mergeability of the partial states.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pixcrawler_spark.operators import sketches as sk
from pixcrawler_spark.queries.registry import REGISTRY
from pixcrawler_spark.sources.tables import load_table

SF01 = "/root/testdata/sf0.01"


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------
def test_hll_error_bound(spark):
    li = load_table(spark, SF01, "lineitem")
    reg = sk.hll_registers(li, ["l_returnflag"], F.col("l_orderkey").cast("string"))
    est = {
        r["l_returnflag"]: r["hll_distinct"]
        for r in sk.hll_estimate(reg, ["l_returnflag"]).collect()
    }
    exact = {
        r["l_returnflag"]: r["c"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("c"))
        .collect()
    }
    assert set(est) == set(exact)
    for flag, e in est.items():
        # m=512 -> sigma ~4.6%; 3 sigma < 14%
        assert abs(e - exact[flag]) / exact[flag] < 0.14, (flag, e, exact[flag])


def test_hll_registers_merge(spark):
    """max-merge of two halves' registers == registers of the whole —
    the property that lets the round loop keep per-partition HLL state
    and fold it without rescanning (and why Catalyst can partial-agg
    it map-side)."""
    li = load_table(spark, SF01, "lineitem").withColumn(
        "half", (F.col("l_orderkey") % 2).cast("int")
    )
    key = F.col("l_orderkey").cast("string")
    whole = sk.hll_registers(li, [], key)
    halves = sk.hll_registers(li, ["half"], key)
    merged = halves.groupBy("bucket").agg(F.max("rho").alias("rho"))
    diff = merged.join(whole, "bucket").filter(
        merged["rho"] != whole["rho"]
    ).count()
    assert diff == 0
    assert merged.count() == whole.count()


def test_hll_register_count_bounded(spark):
    li = load_table(spark, SF01, "lineitem")
    reg = sk.hll_registers(li, ["l_returnflag"], F.col("l_orderkey").cast("string"))
    per_group = reg.groupBy("l_returnflag").count().collect()
    assert all(r["count"] <= sk.HLL_M for r in per_group)


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------
def test_cms_one_sided_and_bounded(spark):
    ev = load_table(spark, SF01, "events").select(
        F.col("user_id").cast("string").alias("k")
    )
    counters = sk.cms_counters(ev, F.col("k"))
    exact = ev.groupBy("k").agg(F.count(F.lit(1)).alias("exact"))
    est = sk.cms_estimate(counters, exact.select("k"), "k")
    rows = exact.join(est, "k").collect()
    n_total = sum(r["exact"] for r in rows)
    for r in rows:
        assert r["cms_est"] >= r["exact"], r  # never underestimates
        # standard CMS bound: overcount <= e*N/w with prob 1-(1/e)^d;
        # allow the full e*N/w here (w=64 is deliberately tight)
        assert r["cms_est"] - r["exact"] <= 2.72 * n_total / sk.CMS_WIDTH, r


def test_cms_counters_mergeable(spark):
    """SUM-merge of per-half counters == counters of the whole."""
    ev = load_table(spark, SF01, "events").select(
        F.col("user_id").cast("string").alias("k"),
        (F.col("event_id") % 2).alias("half"),
    )
    whole = sk.cms_counters(ev, F.col("k"))
    h0 = sk.cms_counters(ev.filter("half = 0"), F.col("k"))
    h1 = sk.cms_counters(ev.filter("half = 1"), F.col("k"))
    merged = (
        h0.union(h1).groupBy("j", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    diff = (
        merged.join(whole, ["j", "bucket"], "full")
        .filter(
            F.coalesce(merged["cnt"], F.lit(0))
            != F.coalesce(whole["cnt"], F.lit(0))
        )
        .count()
    )
    assert diff == 0


# ---------------------------------------------------------------------------
# KMV
# ---------------------------------------------------------------------------
def test_kmv_estimate_accuracy(spark):
    o = load_table(spark, SF01, "orders")
    key = F.col("o_custkey").cast("string")
    exact = o.select("o_custkey").distinct().count()
    bk = sk.kmv_bottomk(o, key)
    kth = bk.agg(F.max("hv")).collect()[0][0]
    est = float(sk.KMV_K - 1) * float(1 << sk.HASH_BITS) / kth
    # k=256 -> sigma ~ 1/sqrt(k) ~ 6.3%; allow 3 sigma
    assert abs(est - exact) / exact < 0.19, (est, exact)


def test_kmv_bottomk_is_k_smallest(spark):
    o = load_table(spark, SF01, "orders")
    key = F.col("o_custkey").cast("string")
    got = [r["hv"] for r in sk.kmv_bottomk(o, key).collect()]
    allh = sorted(
        r["hv"] for r in o.select(sk.h60(key).alias("hv")).distinct().collect()
    )
    assert got == allh[: sk.KMV_K]


# ---------------------------------------------------------------------------
# trap detection / recrawl semantics (via the registered queries)
# ---------------------------------------------------------------------------
def test_trap_variants_classified(spark, sf_dir):
    rows = REGISTRY["crawl_trap_detection"].fn(spark, sf_dir).collect()
    by_kind = {"benign": [], "repeat": [], "calendar": [], "session": []}
    for r in rows:
        if "/products/" in r["url"]:
            by_kind["benign"].append(r)
        elif "/cat/cat/" in r["url"]:
            by_kind["repeat"].append(r)
        elif "/post" in r["url"]:
            by_kind["calendar"].append(r)
        else:
            by_kind["session"].append(r)
    assert all(len(v) > 0 for v in by_kind.values())
    assert all(not r["is_trap"] and r["trap_score"] == 0 for r in by_kind["benign"])
    assert all(r["has_repeat"] and r["is_trap"] for r in by_kind["repeat"])
    # calendar urls: /2023/{mm}/{dd}/... — when mm == dd the adjacent
    # segments genuinely repeat, so has_repeat is data-dependent there
    assert all(r["has_calendar"] for r in by_kind["calendar"])
    assert all(
        r["has_session"] and r["depth"] == 9 and r["n_params"] == 5
        and r["trap_score"] == 5 and r["is_trap"]
        for r in by_kind["session"]
    )


def test_recrawl_monotonic_in_change_rate(spark, sf_dir):
    rows = REGISTRY["crawl_recrawl_schedule"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r["n_changes"] <= r["n_obs"]
        assert r["interval_s"] >= 1
        if r["n_changes"] == 0:
            # no observed change -> rate clamps to the floor -> max wait
            assert r["interval_s"] == 86400000
    # more changes per observation => shorter interval (same n_obs)
    by_obs: dict[int, list] = {}
    for r in rows:
        by_obs.setdefault(r["n_obs"], []).append(r)
    for obs_rows in by_obs.values():
        s = sorted(obs_rows, key=lambda r: r["n_changes"])
        for a, b in zip(s, s[1:]):
            if a["n_changes"] < b["n_changes"]:
                assert a["interval_s"] >= b["interval_s"]


def test_span_dedup_bounds(spark, sf_dir):
    rows = REGISTRY["text_span_dedup"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r["dup_spans"] <= r["n_spans"]
        assert 0.0 <= r["dup_frac"] <= 1.0


def test_mixture_respects_budget_direction(spark, sf_dir):
    rows = REGISTRY["sample_corpus_mixture"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["kept_docs"] <= r["n_docs"]
        assert r["kept_tokens"] <= r["total_tokens"]
        if r["sample_rate"] >= 1.0:
            assert r["kept_docs"] == r["n_docs"]


def test_waterfill_invariants(spark, sf_dir):
    from pixcrawler_spark.queries.roundfive import WATERFILL_BUDGET

    rows = REGISTRY["crawl_budget_waterfill"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    total_demand = sum(r["demand"] for r in rows)
    total_alloc = sum(r["allocated"] for r in rows)
    unsat = [r for r in rows if not r["satisfied"]]
    if total_demand <= WATERFILL_BUDGET:
        assert not unsat
        assert all(r["allocated"] == r["demand"] for r in rows)
    else:
        assert unsat
        # allocations exhaust the budget (up to the 4-dp rounding)
        assert abs(total_alloc - WATERFILL_BUDGET) < 0.001 * len(rows)
        level = unsat[0]["allocated"]
        # max-min fairness: one common water level for the unsatisfied,
        # and every fully-granted demand sits at or below it
        assert all(r["allocated"] == level for r in unsat)
        assert all(
            r["demand"] <= level + 1e-9 for r in rows if r["satisfied"]
        )
        assert all(r["allocated"] <= r["demand"] for r in rows)


def test_sitemap_extract_counts(spark, sf_dir):
    rows = REGISTRY["crawl_sitemap_extract"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        # one sitemap inside the googlebot group (always extracted —
        # non-group record), plus one more for odd-length domains
        assert r["n_sitemaps"] == 1 + len(r["domain"]) % 2
        assert r["first_sitemap"].endswith("/sitemap0.xml")
        assert r["first_sitemap"].startswith(f"https://{r['domain']}.")


def test_extract_anchors_oracle_and_udf(spark):
    from pixcrawler_spark.functions.text import (
        extract_anchors_py,
        extract_anchors_udf,
    )

    cases = [
        (None, None),
        (b"<html>no links</html>", []),
        (b'<a href="u1">one</a>', [{"href": "u1", "anchor": "one"}]),
        # attributes after href, multiline anchor, duplicates preserved
        (
            b'<a href="u1" rel="nofollow">a\nb</a><a href="u1">c</a>',
            [
                {"href": "u1", "anchor": "a\nb"},
                {"href": "u1", "anchor": "c"},
            ],
        ),
        # unterminated anchor -> no match (deterministic on truncation)
        (b'<a href="u2">dangling', []),
    ]
    for html, want in cases:
        assert extract_anchors_py(html) == want, html
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "i int, html binary"
    )
    got = {
        r["i"]: r["a"]
        for r in df.select("i", extract_anchors_udf("html").alias("a")).collect()
    }
    for i, (_, want) in enumerate(cases):
        if want is None:
            assert got[i] is None
        else:
            assert [{"href": x["href"], "anchor": x["anchor"]} for x in got[i]] == want


def test_hll_fast_path_accuracy(spark):
    """The xxhash64 production path (PLANS.md: 10x faster than exact
    countDistinct at 6M rows) meets the same error bound as the
    portable md5 path — different hash, same register algebra."""
    li = load_table(spark, SF01, "lineitem")
    reg = sk.hll_registers(li, ["l_returnflag"], F.col("l_orderkey"), fast=True)
    est = {
        r["l_returnflag"]: r["hll_distinct"]
        for r in sk.hll_estimate(reg, ["l_returnflag"]).collect()
    }
    exact = {
        r["l_returnflag"]: r["c"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("c"))
        .collect()
    }
    for flag, e in est.items():
        assert abs(e - exact[flag]) / exact[flag] < 0.14, (flag, e, exact[flag])
    per_group = reg.groupBy("l_returnflag").count().collect()
    assert all(r["count"] <= sk.HLL_M for r in per_group)


def test_waterfill_operator_properties(spark):
    """waterfill_allocate over a range of budgets: conservation
    (allocations sum to min(budget, total demand)), max-min fairness
    (unique water level; full grants only below it), monotonicity
    (bigger budget never shrinks anyone's allocation)."""
    import pytest
    from pixcrawler_spark.operators.politeness import waterfill_allocate

    demands = [("d%02d" % i, (i * 7) % 23 + 1) for i in range(30)]
    dem = spark.createDataFrame(demands, "domain string, demand long")
    total = sum(d for _, d in demands)
    prev = None
    for budget in [1, 37, total // 3, total - 1, total, total + 50]:
        rows = {r["domain"]: r for r in waterfill_allocate(dem, budget).collect()}
        alloc = sum(r["allocated"] for r in rows.values())
        assert alloc == pytest.approx(min(budget, total), abs=0.01 * len(rows))
        unsat = [r for r in rows.values() if not r["satisfied"]]
        if budget >= total:
            assert not unsat
        else:
            levels = {r["allocated"] for r in unsat}
            assert len(levels) == 1
            level = levels.pop()
            assert all(
                r["demand"] <= level + 1e-9
                for r in rows.values()
                if r["satisfied"]
            )
        for d, r in rows.items():
            assert r["allocated"] <= r["demand"] + 1e-9
            if prev is not None:
                assert r["allocated"] >= prev[d]["allocated"] - 1e-9
        prev = rows


def test_quality_budget_greedy_prefix(spark, sf_dir):
    from pixcrawler_spark.queries.roundfive import QB_BUDGET_TOKENS

    rows = REGISTRY["sample_quality_budget"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        kept = [r for r in rs if r["kept"]]
        dropped = [r for r in rs if not r["kept"]]
        assert sum(r["n_tok"] for r in kept) <= QB_BUDGET_TOKENS
        if kept and dropped:
            # greedy prefix: the worst kept quality >= best dropped
            # quality, except docs skipped only at the budget boundary
            min_kept = min(r["quality"] for r in kept)
            better_dropped = [
                r for r in dropped if r["quality"] > min_kept
            ]
            # any higher-quality dropped doc must sit past the budget
            # in cumulative order
            for r in better_dropped:
                assert r["cum_tokens"] > QB_BUDGET_TOKENS
