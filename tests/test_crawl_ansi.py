"""CrawlEngine smoke under an ANSI-ON session.

The engine API surface (plans/crawl.py round loop) is only ever
exercised through get_spark sessions, which pin ANSI off — the same
structural blind spot that let the r04 crawl_trap_detection ANSI crash
ship for registry queries. This runs a small end-to-end crawl on a
session with ``spark.sql.ansi.enabled=true`` (Spark 4's default, and
what a driver-built session uses) and asserts the seen set and fetch
decisions still match the pandas oracle — values, not just no-crash.
"""

from __future__ import annotations

import pytest

from pixcrawler_spark.fixtures import (
    FixtureSpec,
    generate_pages,
    seed_urls,
    write_fixtures,
)
from pixcrawler_spark.plans.crawl import CrawlConfig, CrawlEngine
from pixcrawler_spark.sources.tables import TableStore
from tests.oracle import CrawlOracle

ROWS = 400
SEED = 7


@pytest.fixture(scope="module")
def ansi_spark(spark):
    s = spark.newSession()
    s.conf.set("spark.sql.ansi.enabled", "true")
    return s


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("crawlfix_ansi")
    write_fixtures(str(d), rows=ROWS, seed=SEED)
    return str(d)


def test_run_round_matches_oracle_under_ansi(ansi_spark, fixture_dir, tmp_path):
    assert ansi_spark.conf.get("spark.sql.ansi.enabled") == "true"
    seeds = seed_urls(generate_pages(FixtureSpec(rows=ROWS, seed=SEED)), k=4)
    cfg = CrawlConfig(seeds=seeds, max_depth=2, max_rounds=2, round_len_s=2.0)
    store = TableStore(ansi_spark, str(tmp_path / "store_ansi"))
    eng = CrawlEngine(
        ansi_spark,
        f"{fixture_dir}/pages.parquet",
        f"{fixture_dir}/robots.parquet",
        store,
        cfg,
    )
    summaries = eng.run()
    assert summaries, "engine ran zero rounds"
    # engine must not have mutated the session mode behind our back
    assert ansi_spark.conf.get("spark.sql.ansi.enabled") == "true"

    oracle = CrawlOracle(
        pages_path=f"{fixture_dir}/pages.parquet",
        robots_path=f"{fixture_dir}/robots.parquet",
        seeds=seeds,
        max_depth=2,
        max_rounds=2,
        round_len_s=2.0,
    )
    oracle.run()

    seen = {
        (r["url"], r["completed_round"])
        for r in eng.store.read("seen").collect()
    }
    assert seen == {(u, r) for u, r in oracle.seen.items()}

    got = {
        r["url"]: (r["fetch_decision"], r["depth"], r["round"])
        for r in eng.store.read("results").toPandas().to_dict("records")
    }
    want = {
        res.url: (res.fetch_decision, res.depth, res.round)
        for res in oracle.results
    }
    assert got == want
