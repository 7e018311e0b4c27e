"""Advanced operator coverage: sessionization, pivot, rollup/grouping
sets, as-of join, percentiles, histograms, order-preserving dedup.

These go beyond the reference's own operator set (SURVEY §2 notes
frame-spec windows / cube / approx aggregates are absent there) — they
round out what a large-scale analytics engine over crawl/event data
needs, each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from pixcrawler_spark.queries.registry import register
from pixcrawler_spark.sources.tables import load_table

SESSION_GAP_MIN = 30


@register(
    "q21_sessionization",
    oracle=f"""
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR date_diff('second', lag(ts) OVER w, ts) > {SESSION_GAP_MIN * 60}
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_id
      FROM g
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM s GROUP BY user_id, session_id
    """,
    doc="Sessionization: lag-gap flag + running sum → session ids "
    "(30 min inactivity gap). Frame-spec window + analytic function.",
)
def q21_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts is TIMESTAMP_NTZ in the parquet — cast via timestamp (session
    # TZ pinned UTC) to epoch seconds for the gap arithmetic
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    is_new = F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60), 1).otherwise(0)
    ws = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = e.select("user_id", "ts", "event_id").withColumn("is_new", is_new)
    sessions = flagged.withColumn(
        "session_id", F.sum("is_new").over(ws).cast("long")
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@register(
    "q22_pivot_events",
    oracle="""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click')    AS click,
           count(*) FILTER (WHERE event_type = 'view')     AS view,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS signup,
           count(*) FILTER (WHERE event_type = 'error')    AS error
    FROM events GROUP BY user_id
    """,
    doc="Pivot: event_type counts to columns (explicit value list so "
    "the plan is a single hash aggregate, no distinct-scan pass).",
)
def q22_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    return (
        e.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
        .na.fill(0, kinds)
    )


@register(
    "q23_rollup_revenue",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) AS INT)  AS g_status,
           CAST(grouping(o_orderpriority) AS INT) AS g_priority,
           round(sum(o_totalprice), 4) AS revenue,
           count(*) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    doc="Rollup with grouping indicators: subtotal levels in one pass "
    "(partial aggregation handles all levels map-side).",
)
def q23_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.round(F.sum("o_totalprice"), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        "o_orderstatus", "o_orderpriority", "g_status", "g_priority", "revenue", "n"
    )


@register(
    "q24_asof_join",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts, o.o_orderkey AS last_orderkey
    FROM (SELECT * FROM events WHERE event_type = 'purchase') e
    ASOF LEFT JOIN (
        SELECT o_custkey, o_orderkey, o_orderdate,
               row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                  ORDER BY o_orderkey DESC) AS rk
        FROM orders QUALIFY rk = 1
    ) o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    doc="As-of join (Spark lacks a native one): latest order at or "
    "before each purchase event per user. Implemented as a union-tag "
    "+ last_value window sweep — one shuffle, no range explosion; ties "
    "on (custkey, orderdate) break by max orderkey to stay exact.",
)
def q24_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
    )
    o = load_table(spark, sf_dir, "orders")
    # dedup: one order per (custkey, orderdate) — highest orderkey wins
    wded = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.desc("o_orderkey")
    )
    o1 = (
        o.withColumn("_rk", F.row_number().over(wded))
        .where(F.col("_rk") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )
    # union-tag sweep: order rows carry their key; event rows pick up
    # the last order key at or before their ts via last_value over time
    orders_tagged = o1.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("kind"),  # orders sort before events at equal t
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderkey").alias("orderkey"),
    )
    events_tagged = e.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("kind"),
        "event_id",
        F.lit(None).cast("long").alias("orderkey"),
    )
    both = orders_tagged.unionByName(events_tagged)
    wsweep = (
        Window.partitionBy("user_id")
        .orderBy("t", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = both.withColumn(
        "last_orderkey", F.last("orderkey", ignorenulls=True).over(wsweep)
    )
    return swept.where(F.col("kind") == 1).select(
        "event_id", "user_id", F.col("t").alias("ts"), "last_orderkey"
    )


@register(
    "q25_percentiles",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4)  AS p50,
           round(quantile_cont(o_totalprice, 0.95), 4) AS p95
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Exact interpolated percentiles per group (Spark `percentile` "
    "== DuckDB quantile_cont, both linear interpolation). "
    "approx_percentile is the at-scale variant (not oracle-comparable).",
)
def q25_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 4).alias("p95"),
    )


@register(
    "q26_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
           count(*) AS n,
           round(min(o_totalprice), 4) AS lo,
           round(max(o_totalprice), 4) AS hi
    FROM orders GROUP BY 1
    """,
    doc="Fixed-width histogram binning via floor arithmetic (pure "
    "codegen; the telemetry building block for round metrics).",
)
def q26_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        F.floor(F.col("o_totalprice") / 50000.0).cast("long").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 4).alias("lo"),
        F.round(F.max("o_totalprice"), 4).alias("hi"),
    )


@register(
    "q27_order_preserving_dedup",
    oracle="""
    SELECT event_type, first_seen FROM (
      SELECT event_type,
             row_number() OVER (PARTITION BY event_type ORDER BY event_id) AS rk,
             event_id AS first_seen
      FROM events
    ) WHERE rk = 1
    """,
    doc="Order-preserving dedup (dict.fromkeys analog, "
    "builder/_keywords.py:213-214): keep first occurrence by arrival "
    "order, remember where.",
)
def q27_order_preserving_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("event_id")
    return (
        e.select("event_type", "event_id")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("event_type", F.col("event_id").alias("first_seen"))
    )


@register(
    "q28_grouping_sets",
    oracle="""
    SELECT lang, source, count(*) AS n,
           CAST(sum(n_chars) AS BIGINT) AS chars
    FROM documents
    GROUP BY GROUPING SETS ((lang), (source), (lang, source))
    """,
    doc="Grouping sets: three aggregation granularities in one shuffle.",
)
def q28_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("_docs_gs")
    return spark.sql(
        """
        SELECT lang, source, count(*) AS n,
               CAST(sum(n_chars) AS BIGINT) AS chars
        FROM _docs_gs
        GROUP BY GROUPING SETS ((lang), (source), (lang, source))
        """
    )


@register(
    "q29_quality_score",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_crawled,
           CAST(count(DISTINCT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))) AS BIGINT)
             AS n_unique,
           round(count(DISTINCT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))))
                 * 100.0 / count(*), 4) AS quality_pct
    FROM documents GROUP BY source
    """,
    doc="Dataset quality score per source: unique documents (normalized "
    "fingerprint) / crawled * 100 (reference: "
    "backend/services/dataset_processing_pipeline.py:536-556).",
)
def q29_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixcrawler_spark.operators.textstats import fingerprint_expr

    d = load_table(spark, sf_dir, "documents")
    fp = fingerprint_expr("text")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_crawled"),
        F.countDistinct(fp).alias("n_unique"),
        F.round(
            F.countDistinct(fp) * 100.0 / F.count(F.lit(1)), 4
        ).alias("quality_pct"),
    )
