"""Crawl-engine operators demonstrated on testdata with DuckDB oracles.

The real frontier engine (plans/crawl.py) runs over the synthetic
``pages`` fixture in pytest; these queries re-express its individual
operators — fetch-decision CASE, robots filter, per-domain politeness
admission, priority-queue ranking — over a pages table derived
deterministically from ``documents`` so the driver's DuckDB oracle can
verify them on the shared tables.

Derivation: url = 'https://' || source || '.example/doc/' || doc_id,
domain = source, status = doc_id % 550, priority score = n_chars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from pixcrawler_spark.queries.registry import register
from pixcrawler_spark.sources.tables import load_table

# Domains whose robots rules disallow everything (fixture constant).
ROBOTS_DENIED_DOMAINS = ("src3", "src7", "src13")
MAX_PER_ROUND = 10  # token-bucket capacity (Celery rate_limit="10/m" analog)

_DENY_LIST = ", ".join(f"'{d}'" for d in ROBOTS_DENIED_DOMAINS)


def _pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example/doc/"), F.col("doc_id")
        ).alias("url"),
        F.col("source").alias("domain"),
        (F.col("doc_id") % 550).alias("status"),
        F.col("n_chars").alias("score"),
        F.col("doc_id"),
    )


@register(
    "crawl_fetch_decision",
    oracle=f"""
    WITH pages AS (
      SELECT 'https://' || source || '.example/doc/' || doc_id AS url,
             source AS domain, doc_id % 550 AS status
      FROM documents
    )
    SELECT CASE
             WHEN domain IN ({_DENY_LIST}) THEN 'robots_denied'
             WHEN status IN (429, 503, 504) THEN 'fetch_failed_transient'
             WHEN status IN (400, 401, 403, 404) THEN 'fetch_failed_permanent'
             WHEN status < 400 THEN 'fetched'
             ELSE 'fetch_failed_permanent'
           END AS fetch_decision,
           count(*) AS n
    FROM pages GROUP BY 1
    """,
    doc="Fetch-decision operator: robots precedence over HTTP "
    "classification (builder/_exceptions.py:216-240 + north-rule robots).",
)
def crawl_fetch_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _pages(spark, sf_dir)
    decision = (
        F.when(F.col("domain").isin(*ROBOTS_DENIED_DOMAINS), "robots_denied")
        .when(F.col("status").isin(429, 503, 504), "fetch_failed_transient")
        .when(F.col("status").isin(400, 401, 403, 404), "fetch_failed_permanent")
        .when(F.col("status") < 400, "fetched")
        .otherwise("fetch_failed_permanent")
    )
    return p.groupBy(decision.alias("fetch_decision")).agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "crawl_politeness_admission",
    oracle=f"""
    WITH ranked AS (
      SELECT source AS domain,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rk
      FROM documents
    )
    SELECT domain,
           CAST(count(*) FILTER (WHERE rk <= {MAX_PER_ROUND}) AS BIGINT) AS n_admitted,
           CAST(count(*) FILTER (WHERE rk > {MAX_PER_ROUND}) AS BIGINT)  AS n_stalled
    FROM ranked GROUP BY domain
    """,
    doc="Per-domain politeness admission: token-bucket capacity as a "
    "window rank cutoff; deferred rows are the politeness-stall metric "
    "(north rule; Celery rate_limit analog builder/tasks.py:178).",
)
def crawl_politeness_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _pages(spark, sf_dir)
    w = Window.partitionBy("domain").orderBy(F.desc("score"), F.asc("doc_id"))
    ranked = p.withColumn("rk", F.row_number().over(w))
    return ranked.groupBy("domain").agg(
        F.count(F.when(F.col("rk") <= MAX_PER_ROUND, 1)).alias("n_admitted"),
        F.count(F.when(F.col("rk") > MAX_PER_ROUND, 1)).alias("n_stalled"),
    )


@register(
    "crawl_priority_order",
    oracle=f"""
    WITH pages AS (
      SELECT 'https://' || source || '.example/doc/' || doc_id AS url,
             source AS domain, n_chars AS score, doc_id
      FROM documents
    )
    SELECT url, domain,
           row_number() OVER (PARTITION BY domain
                              ORDER BY score DESC, url) AS priority_rank
    FROM pages
    QUALIFY priority_rank <= {MAX_PER_ROUND}
    """,
    doc="Priority-queue batch selection: the admitted frontier batch of "
    "one micro-round, ordered by (score desc, url) per domain — the "
    "north-rule crawl-ordering contract (deterministic, no timestamps).",
)
def crawl_priority_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _pages(spark, sf_dir)
    w = Window.partitionBy("domain").orderBy(F.desc("score"), F.asc("url"))
    return (
        p.select("url", "domain", F.row_number().over(w).alias("priority_rank"))
        .where(F.col("priority_rank") <= MAX_PER_ROUND)
    )


@register(
    "crawl_serp_seeding",
    oracle="""
    WITH pages AS (
      SELECT 'https://' || source || '.example/doc/' || doc_id AS url
      FROM documents
    ),
    queries(variation, engine, off) AS (
      VALUES ('cats photos', 'google', 3), ('dogs photos', 'bing', 0)
    ),
    ranked AS (
      SELECT q.variation, q.engine, q.off, p.url,
             row_number() OVER (
               PARTITION BY q.variation, q.engine
               ORDER BY md5(p.url || '|' || q.variation || '|' || q.engine), p.url
             ) AS rk
      FROM pages p CROSS JOIN queries q
    )
    SELECT variation, engine, CAST(rk - off AS INT) AS serp_rank, url
    FROM ranked WHERE rk > off AND rk <= off + 10
    """,
    doc="Config→frontier seeding: deterministic SERP windows — per "
    "engine query, pages ranked by a portable hash, result page = "
    "[offset, offset+k) of the ranking (plans/seeding.py; reference "
    "search-result fetch, builder/_search_engines.py:282-298, offset "
    "arithmetic builder/_engine.py:455-457).",
)
def crawl_serp_seeding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixcrawler_spark.plans.seeding import serp_urls

    pages = _pages(spark, sf_dir).select("url")
    queries = spark.createDataFrame(
        [
            ("c", "cats", "cats photos", "google", 3),
            ("c", "dogs", "dogs photos", "bing", 0),
        ],
        "category string, keyword string, variation string, engine string, offset int",
    )
    return serp_urls(pages, queries, per_query=10).select(
        "variation", "engine", "serp_rank", "url"
    )


@register(
    "crawl_robots_parse",
    oracle="""
    WITH src AS (SELECT DISTINCT source FROM documents)
    SELECT source AS domain,
           CAST(2 AS BIGINT) AS n_prefixes,
           'private' || CAST(length(source) AS VARCHAR) || '/' AS first_prefix,
           CAST((length(source) % 4) AS DOUBLE) / 2 AS crawl_delay_s
    FROM src
    """,
    doc="robots.txt parsing operator (operators/robots.py, RFC 9309 "
    "subset, pure JVM columnar): bodies are synthesized per domain by a "
    "deterministic rule, the engine PARSES them, and the oracle states "
    "the expected parse from the same rule — absent in the reference, "
    "required by the north rule.",
)
def crawl_robots_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixcrawler_spark.operators.robots import parse_robots

    d = load_table(spark, sf_dir, "documents").select("source").distinct()
    # deterministic synthetic body per domain: 2 disallow rules + a
    # crawl-delay derived from the domain name length
    body = F.concat(
        F.lit("# synthetic\nUser-agent: googlebot\nDisallow: /\n"),
        F.lit("User-agent: *\nDisallow: /private"),
        F.length("source").cast("string"),
        F.lit("/\nDisallow: /tmp/\nCrawl-delay: "),
        (F.length("source") % 4).cast("double") / 2,
    )
    parsed = parse_robots(
        d.select(F.col("source").alias("domain"), body.alias("robots_txt"))
    )
    return parsed.select(
        "domain",
        F.size("disallow_prefixes").cast("long").alias("n_prefixes"),
        F.element_at("disallow_prefixes", 1).alias("first_prefix"),
        "crawl_delay_s",
    )


@register(
    "crawl_seen_anti_join",
    oracle="""
    WITH frontier AS (
      SELECT 'https://' || source || '.example/doc/' || doc_id AS url
      FROM documents
    ),
    seen AS (
      SELECT 'https://' || source || '.example/doc/' || doc_id AS url
      FROM documents WHERE doc_id % 3 = 0
    )
    SELECT f.url FROM frontier f
    WHERE NOT EXISTS (SELECT 1 FROM seen s WHERE s.url = f.url)
    """,
    doc="URL-seen-set anti-join: the core frontier op "
    "(builder/progress.py:84-96 → left_anti join).",
)
def crawl_seen_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _pages(spark, sf_dir)
    frontier = p.select("url", "doc_id")
    seen = p.where(F.col("doc_id") % 3 == 0).select("url")
    return frontier.join(seen, "url", "left_anti").select("url")
