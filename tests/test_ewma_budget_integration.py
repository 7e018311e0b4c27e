"""Composition test: the EWMA host-load forecast plugs into the crawl
engine's politeness budget. A synthetic latency log yields per-domain
forecast capacities (floor(round_len_ms / ewma)); robots'
``max_per_round`` is tightened to min(original, forecast); the engine
round must then admit no more than the forecast budget per domain —
the feedback loop crawl_hostload_ewma exists for, driven end-to-end
through the real engine API (CrawlEngine accepts a robots DataFrame)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pixcrawler_spark.fixtures import (
    FixtureSpec,
    generate_pages,
    seed_urls,
    write_fixtures,
)
from pixcrawler_spark.plans.crawl import CrawlConfig, CrawlEngine
from pixcrawler_spark.sources.tables import TableStore

ROWS = 2000
SEED = 42
ROUND_MS = 2000.0  # matches round_len_s=2.0


def _forecast(spark, robots):
    """Deterministic synthetic latency log: domain d's fetches take
    (50 + 37 * (hash-ish)) ms, 20 observations each, then the EWMA
    closed form with alpha = 1/2 — mirroring crawl_hostload_ewma."""
    domains = robots.select("domain")
    obs = domains.select(
        "domain",
        F.explode(F.sequence(F.lit(1), F.lit(20))).alias("i"),
    ).select(
        "domain",
        "i",
        (
            50.0
            + 37.0 * (F.abs(F.hash("domain", "i")) % 20)
        ).alias("latency_ms"),
    )
    part = Window.partitionBy("domain")
    w = part.orderBy("i")
    pos = obs.select(
        "domain",
        "latency_ms",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(part).alias("n"),
    )
    weight = F.when(
        F.col("rn") == 1, F.pow(F.lit(0.5), F.col("n") - 1)
    ).otherwise(0.5 * F.pow(F.lit(0.5), F.col("n") - F.col("rn")))
    return pos.groupBy("domain").agg(
        F.greatest(
            F.lit(1),
            F.floor(
                ROUND_MS / F.sum(weight * F.col("latency_ms"))
            ).cast("int"),
        ).alias("forecast_cap")
    )


def test_round_respects_ewma_budget(spark, tmp_path):
    d = tmp_path / "fix"
    write_fixtures(str(d), rows=ROWS, seed=SEED)
    fx = str(d)
    robots = spark.read.parquet(f"{fx}/robots.parquet")
    fc = _forecast(spark, robots)
    tightened = (
        robots.join(fc, "domain", "left")
        .withColumn(
            "max_per_round",
            F.least(
                F.col("max_per_round"),
                F.coalesce(F.col("forecast_cap"), F.col("max_per_round")),
            ),
        )
        .drop("forecast_cap")
    )
    budgets = {
        r["domain"]: r["max_per_round"] for r in tightened.collect()
    }
    seeds = seed_urls(
        generate_pages(FixtureSpec(rows=ROWS, seed=SEED)), k=6
    )
    cfg = CrawlConfig(
        seeds=seeds, max_depth=2, max_rounds=2, round_len_s=2.0
    )
    store = TableStore(spark, str(tmp_path / "store"))
    eng = CrawlEngine(
        spark, f"{fx}/pages.parquet", tightened, store, cfg
    )
    eng.run()
    log = store.read("round_log").where(
        F.col("fetch_decision") != "robots_denied"
    )
    per_domain = {
        (r["domain"], r["round"]): r["n"]
        for r in log.groupBy("domain", "round")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert per_domain, "round admitted nothing"
    for (dom, rnd), n in per_domain.items():
        cap = budgets[dom]
        # crawl-delay can tighten further; the EWMA budget is an
        # upper bound on admissions per round
        assert n <= cap, (dom, rnd, n, cap)
    # the forecast actually bit somewhere (some domain's budget is
    # below the robots default, and no domain exceeded it)
    defaults = {
        r["domain"]: r["max_per_round"] for r in robots.collect()
    }
    assert any(budgets[d] < defaults[d] for d in budgets)
