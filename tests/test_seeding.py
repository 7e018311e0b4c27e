"""Config → frontier seeding: deterministic SERP windows vs a
straight-line Python oracle, and the full config→seeds→crawl bridge."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from pixcrawler_spark.config import load_config
from pixcrawler_spark.fixtures import write_fixtures
from pixcrawler_spark.plans.seeding import (
    config_queries,
    seeds_from_config,
    serp_urls,
)

CONFIG = {
    "dataset_name": "seedtest",
    "categories": {"news": ["breaking news"], "docs": []},
    "options": {"max_images": 20, "keyword_generation": "auto"},
}


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("seedfix")
    write_fixtures(str(d), rows=3000, seed=7)
    return str(d)


def test_serp_matches_python_oracle(spark, fixture_dir):
    pages = spark.read.parquet(f"{fixture_dir}/pages.parquet").select("url")
    queries = spark.createDataFrame(
        [
            ("c1", "k1", "v one", "google", 3),
            ("c1", "k1", "v two", "bing", 0),
        ],
        "category string, keyword string, variation string, engine string, offset int",
    )
    got = {
        (r["variation"], r["engine"], r["serp_rank"], r["url"])
        for r in serp_urls(pages, queries, per_query=5).collect()
    }

    urls = [r["url"] for r in pages.collect()]
    want = set()
    for cat, kw, var, eng, off in [
        ("c1", "k1", "v one", "google", 3),
        ("c1", "k1", "v two", "bing", 0),
    ]:
        ranked = sorted(
            urls,
            key=lambda u: (
                hashlib.md5(f"{u}|{var}|{eng}".encode()).hexdigest(),
                u,
            ),
        )
        for i, u in enumerate(ranked[off : off + 5], start=1):
            want.add((var, eng, i, u))
    assert got == want


def test_config_queries_shape(spark):
    cfg = load_config(CONFIG)
    q = config_queries(spark, cfg).collect()
    assert len(q) > 0
    # chunks = keywords x variations x engines; offsets non-negative
    assert all(r["offset"] >= 0 for r in q)
    engines = {r["engine"] for r in q}
    assert engines == {"google", "bing", "baidu"}
    # 'docs' category had no keywords + auto mode → generated keywords
    assert any(r["category"] == "docs" for r in q)


def test_config_to_crawl_end_to_end(spark, fixture_dir, tmp_path):
    """config → deterministic seeds → crawl rounds; deterministic
    across repeated runs."""
    from pixcrawler_spark.plans.crawl import CrawlConfig, CrawlEngine
    from pixcrawler_spark.sources.tables import TableStore

    cfg = load_config(CONFIG)
    pages = spark.read.parquet(f"{fixture_dir}/pages.parquet")
    seeds_df = seeds_from_config(spark, cfg, pages, per_query=3)
    seeds = sorted(r["url"] for r in seeds_df.collect())
    assert len(seeds) > 0
    # determinism
    seeds2 = sorted(r["url"] for r in seeds_from_config(spark, cfg, pages, per_query=3).collect())
    assert seeds == seeds2

    store = TableStore(spark, str(tmp_path / "store"))
    eng = CrawlEngine(
        spark,
        f"{fixture_dir}/pages.parquet",
        f"{fixture_dir}/robots.parquet",
        store,
        CrawlConfig(seeds=seeds, max_depth=1, max_rounds=2),
    )
    summaries = eng.run()
    assert summaries and summaries[0]["n_decided"] > 0
    res = store.read("results")
    assert res.where(F.col("round") == 1).count() > 0


def test_sitemap_seeds_union_with_serp(spark):
    from pixcrawler_spark.plans.seeding import sitemap_seeds

    bodies = spark.createDataFrame(
        [
            # sitemap inside a specific-UA group still counts (§2.3)
            ("a.com", "User-agent: googlebot\nDisallow: /\n"
                      "Sitemap: https://a.com/s1.xml\n"
                      "User-agent: *\nSitemap: https://a.com/s2.xml\n"),
            # duplicate record across domains dedups
            ("b.com", "Sitemap: https://a.com/s1.xml\n"),
            ("c.com", "User-agent: *\nDisallow: /tmp/\n"),  # none
            ("d.com", None),  # null body -> none
        ],
        "domain string, robots_txt string",
    )
    got = {r["url"] for r in sitemap_seeds(bodies).collect()}
    assert got == {"https://a.com/s1.xml", "https://a.com/s2.xml"}
    # composes with the SERP seed frame: one distinct url column
    serp = spark.createDataFrame(
        [("https://a.com/s2.xml",), ("https://x.com/p",)], "url string"
    )
    both = serp.unionByName(sitemap_seeds(bodies)).distinct()
    assert both.count() == 3
