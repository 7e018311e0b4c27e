"""Relative-outlink resolution wired into the crawl round loop
(cfg.resolve_relative): a corpus whose same-domain hrefs are rewritten
to root-relative form must crawl EXACTLY the same url set as the
original absolute-href corpus once resolution is on — and the flag is
a proven pass-through on absolute links."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pixcrawler_spark.fixtures import (
    FixtureSpec,
    generate_pages,
    seed_urls,
    write_fixtures,
)
from pixcrawler_spark.plans.crawl import CrawlConfig, CrawlEngine
from pixcrawler_spark.sources.tables import TableStore

ROWS = 600
SEED = 11


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("relfix")
    write_fixtures(str(d), rows=ROWS, seed=SEED)
    return str(d)


@pytest.fixture(scope="module")
def rel_fixture_dir(fixture_dir, tmp_path_factory):
    """Same corpus with every SAME-DOMAIN href rewritten to
    root-relative form ('https://dNNNN.example/p/X' -> '/p/X') —
    resolution against the page url must reconstruct the original."""
    d = tmp_path_factory.mktemp("relfix_rewritten")
    t = pq.read_table(f"{fixture_dir}/pages.parquet")
    urls = t["url"].to_pylist()
    htmls = t["html"].to_pylist()
    out = []
    for u, h in zip(urls, htmls):
        if h is None:
            out.append(None)
            continue
        dom = u.split("/")[2]
        s = h.decode("utf-8", errors="replace")
        out.append(
            s.replace(f'href="https://{dom}/', 'href="/').encode("utf-8")
        )
    t2 = t.set_column(
        t.schema.get_field_index("html"), "html", pa.array(out, pa.binary())
    )
    pq.write_table(t2, f"{d}/pages.parquet")
    # robots unchanged
    pq.write_table(
        pq.read_table(f"{fixture_dir}/robots.parquet"),
        f"{d}/robots.parquet",
    )
    return str(d)


@pytest.fixture(scope="module")
def seeds():
    return seed_urls(generate_pages(FixtureSpec(rows=ROWS, seed=SEED)), k=6)


def _run(spark, pages_dir, tmp_path, seeds, **overrides):
    kwargs = dict(seeds=seeds, max_depth=2, max_rounds=3, round_len_s=2.0)
    kwargs.update(overrides)
    eng = CrawlEngine(
        spark,
        f"{pages_dir}/pages.parquet",
        f"{pages_dir}/robots.parquet",
        TableStore(spark, str(tmp_path / "store")),
        CrawlConfig(**kwargs),
    )
    eng.run()
    return eng


def _seen(eng):
    return {r["url"] for r in eng.store.read("seen").collect()}


@pytest.fixture(scope="module")
def baseline_seen(spark, fixture_dir, tmp_path_factory, seeds):
    return _seen(
        _run(spark, fixture_dir, tmp_path_factory.mktemp("base"), seeds)
    )


def test_flag_on_absolute_corpus_is_passthrough(
    spark, fixture_dir, tmp_path, seeds, baseline_seen
):
    eng = _run(spark, fixture_dir, tmp_path, seeds, resolve_relative=True)
    assert _seen(eng) == baseline_seen


def test_relative_corpus_resolves_to_baseline_set(
    spark, rel_fixture_dir, tmp_path, seeds, baseline_seen
):
    eng = _run(
        spark, rel_fixture_dir, tmp_path, seeds, resolve_relative=True
    )
    assert _seen(eng) == baseline_seen


def test_relative_corpus_without_resolution_breaks(
    spark, rel_fixture_dir, tmp_path, seeds, baseline_seen
):
    """Control: with the flag OFF, root-relative hrefs enqueue as
    opaque strings that can never match the pages table — the crawl
    drifts from the baseline, which is exactly the failure mode the
    stage exists to prevent."""
    eng = _run(spark, rel_fixture_dir, tmp_path, seeds)
    assert _seen(eng) != baseline_seen
