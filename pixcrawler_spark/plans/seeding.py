"""Config → frontier seeding: the bridge from the reference's JSON
crawl config (categories/keywords → engine queries) to seed urls over
a pages corpus.

Reference lifecycle (SURVEY §3.1 steps 2+5): keyword expansion →
variation templates → per-engine offset windows → search-engine result
fetch (builder/_search_engines.py:282-298 fetches `max_count*3`
candidate urls per query). The sandbox has no network, so the "search
engine" is a DETERMINISTIC SERP over the pages table: per query, pages
are ranked by a portable hash of (url, variation, engine) and the
window [offset, offset + per_query) of that ranking is the result
page. Identical (pages, config) ⇒ identical seeds — the same
determinism contract as the crawl rounds.

The ranking hash is md5 (portable: DuckDB computes the identical
value, so the driver oracle can verify the operator end-to-end).

SCALE NOTE: ranking the full corpus per query is the sandbox stand-in
for a search index lookup — the corpus is scanned ONCE with the query
list broadcast (|queries| is config-sized, tens-to-hundreds), and each
(page, query) pair costs one codegen'd hash + one window rank. At
10^10 pages you would consult a real index instead; everything
downstream (offset windows, dedup, frontier_from) is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from pixcrawler_spark.config import DatasetConfig
from pixcrawler_spark.operators.keywords import (
    categories_df,
    expand_variations,
    prepare_keywords,
    with_engine_offsets,
)


def config_queries(spark: SparkSession, config: DatasetConfig) -> DataFrame:
    """Config → one fetch-work row per (category, keyword, variation,
    engine, offset) — the reference's chunk plan
    (backend/services/crawl_job.py:482: chunks = keywords × engines)."""
    cats = categories_df(spark, config)
    kws = prepare_keywords(cats, config.keyword_generation)
    variations = expand_variations(kws, config.max_images, seed=config.seed)
    return with_engine_offsets(variations, config.engines)


def serp_urls(
    pages_urls: DataFrame, queries: DataFrame, per_query: int
) -> DataFrame:
    """Deterministic search-result pages: for each query row, the urls
    ranked [offset+1, offset+per_query] by md5(url|variation|engine).

    Returns (category, keyword, variation, engine, serp_rank, url).
    """
    # driver-side literal rank bound: offsets are config-bounded, so a
    # literal conjunct lets WindowGroupLimit cut the per-query ranking
    # map-side — each map task ships at most `bound` rows per query
    # instead of its whole corpus slice
    max_off = queries.agg(F.max("offset").alias("m")).collect()[0]["m"] or 0
    bound = int(max_off) + per_query
    paired = pages_urls.select("url").crossJoin(
        F.broadcast(
            queries.select("category", "keyword", "variation", "engine", "offset")
        )
    )
    w = Window.partitionBy("variation", "engine").orderBy(
        F.md5(F.concat_ws("|", "url", "variation", "engine")), F.asc("url")
    )
    ranked = paired.withColumn("_rk", F.row_number().over(w))
    return ranked.where(
        (F.col("_rk") <= F.lit(bound))  # literal → WindowGroupLimit
        & (F.col("_rk") > F.col("offset"))
        & (F.col("_rk") <= F.col("offset") + F.lit(per_query))
    ).select(
        "category",
        "keyword",
        "variation",
        "engine",
        (F.col("_rk") - F.col("offset")).alias("serp_rank"),
        "url",
    )


def seeds_from_config(
    spark: SparkSession,
    config: DatasetConfig,
    pages: DataFrame,
    per_query: int | None = None,
) -> DataFrame:
    """The full bridge: config → queries → deterministic SERPs →
    distinct seed urls (single column ``url``). ``per_query`` defaults
    to the reference's over-fetch budget max_images * 3
    (builder/_search_engines.py:289)."""
    pq = per_query if per_query is not None else config.max_images * 3
    q = config_queries(spark, config)
    return serp_urls(pages.select("url"), q, pq).select("url").distinct()


def sitemap_seeds(
    robots_bodies: DataFrame, body_col: str = "robots_txt"
) -> DataFrame:
    """Sitemap discovery → seed urls (single ``url`` column).

    The frontier's second seed source next to the SERP bridge: raw
    robots bodies (domain, robots_txt — the same frame parse_robots
    consumes) yield their ``Sitemap:`` records (RFC 9309 §2.3,
    operators/robots.py sitemap_urls — pure array exprs, any UA
    group). Union with ``seeds_from_config`` and dedup before
    ``frontier_from``; a narrow map + distinct over a ~1-row-per-
    domain frame, nothing corpus-sized.
    """
    from pixcrawler_spark.operators.robots import sitemap_urls

    return (
        robots_bodies.select(
            F.explode(sitemap_urls(F.col(body_col))).alias("url")
        )
        .where(F.col("url") != "")
        .distinct()
    )
