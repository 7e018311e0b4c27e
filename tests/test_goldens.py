"""Engine output vs committed golden files (FIXTURES.md §5): the
north-rule 'final URL-seen set' and crawl-ordering checks against
artifacts produced once by the independent pandas oracle."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from pixcrawler_spark.fixtures import FixtureSpec, generate_pages, seed_urls, write_fixtures
from pixcrawler_spark.plans.crawl import CrawlConfig, CrawlEngine
from pixcrawler_spark.sources.tables import TableStore
from tests.make_goldens import GOLDEN_DIR, K_SEEDS, MAX_DEPTH, MAX_ROUNDS, ROUND_LEN_S, ROWS, SEED


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("goldfix")
    write_fixtures(str(d), rows=ROWS, seed=SEED)
    seeds = seed_urls(generate_pages(FixtureSpec(rows=ROWS, seed=SEED)), k=K_SEEDS)
    store = TableStore(spark, str(d / "store"))
    eng = CrawlEngine(
        spark, f"{d}/pages.parquet", f"{d}/robots.parquet", store,
        CrawlConfig(
            seeds=seeds, max_depth=MAX_DEPTH, max_rounds=MAX_ROUNDS,
            round_len_s=ROUND_LEN_S,
        ),
    )
    eng.run()
    return eng


def test_seen_set_matches_golden(engine):
    golden = pq.read_table(
        os.path.join(GOLDEN_DIR, "expected_seen_sf_tiny.parquet")
    ).to_pylist()
    got = {
        (r["url"], r["completed_round"])
        for r in engine.store.read("seen").collect()
    }
    assert got == {(r["url"], r["completed_round"]) for r in golden}


def test_crawl_order_matches_golden(engine):
    golden = pq.read_table(
        os.path.join(GOLDEN_DIR, "expected_order_sf_tiny.parquet")
    ).to_pylist()
    got = {
        (r["round"], r["domain"], r["rank_in_round"], r["url"])
        for r in engine.crawl_order().collect()
    }
    assert got == {
        (r["round"], r["domain"], r["rank_in_round"], r["url"]) for r in golden
    }
