"""Job-orchestration queries: per-user tier admission and the smart
retry-term ladder — both mirrored into DuckDB oracle SQL generated
from the SAME constants and salts as the Spark expressions, so the
two sides cannot drift.

Reference parity:
- tier admission: backend/services/crawl_job.py:110-257;
- smart combinations 1-8 + progressive bands + 15-alternative cap:
  builder/_keywords.py:356-473,520-564.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pixcrawler_spark.operators import keywords as kw
from pixcrawler_spark.operators.admission import (
    TIER_LIMITS,
    tier_admission,
    tier_limits_df,
)
from pixcrawler_spark.queries.registry import register
from pixcrawler_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# Tier admission
# ---------------------------------------------------------------------------
_TIER_VALUES = ", ".join(f"('{t}', {n})" for t, n in sorted(TIER_LIMITS.items()))
_MAX_LIMIT = max(TIER_LIMITS.values())


@register(
    "crawl_tier_admission",
    oracle=f"""
    WITH jobs AS (
      SELECT o_orderkey AS job_id, o_custkey AS user_id,
             CASE CAST(o_custkey % 3 AS INT)
               WHEN 0 THEN 'free' WHEN 1 THEN 'hobby' ELSE 'pro'
             END AS tier
      FROM orders
    ),
    lim AS (SELECT * FROM (VALUES {_TIER_VALUES}) t(tier, tier_limit))
    SELECT j.job_id, j.user_id, j.tier,
           CAST(l.tier_limit AS INT) AS tier_limit,
           row_number() OVER (PARTITION BY j.user_id ORDER BY j.job_id)
             AS queue_rank,
           (row_number() OVER (PARTITION BY j.user_id ORDER BY j.job_id)
              <= {_MAX_LIMIT}
            AND row_number() OVER (PARTITION BY j.user_id ORDER BY j.job_id)
              <= l.tier_limit) AS admitted
    FROM jobs j JOIN lim l USING (tier)
    """,
    doc="Per-user tier concurrency admission (free=1/hobby=3/pro=10, "
    "backend/services/crawl_job.py:124-257): broadcast tier dim + "
    "per-user arrival-order window rank vs limit → admit/defer.",
)
def crawl_tier_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    jobs = o.select(
        F.col("o_orderkey").alias("job_id"),
        F.col("o_custkey").alias("user_id"),
        F.when((F.col("o_custkey") % 3).cast("int") == 0, "free")
        .when((F.col("o_custkey") % 3).cast("int") == 1, "hobby")
        .otherwise("pro")
        .alias("tier"),
    )
    # Spark relocates the USING-join key to column 0; re-select into the
    # oracle's exact column order (the registry contract is order-sensitive).
    return tier_admission(jobs, tier_limits_df(spark)).select(
        "job_id", "user_id", "tier", "tier_limit", "queue_rank", "admitted"
    )


# ---------------------------------------------------------------------------
# Smart retry terms: oracle SQL generated from the SAME term tables,
# salts, and band table as operators/keywords.py
# ---------------------------------------------------------------------------
def _sql_h32(key_sql: str) -> str:
    return f"(('0x' || substring(md5({key_sql}), 1, 8))::BIGINT)"


def _sql_key(kw_sql: str, rc_sql: str, salt: str) -> str:
    return f"({kw_sql} || '|' || CAST({rc_sql} AS VARCHAR) || '|{salt}')"


def _sql_list(terms) -> str:
    return "[" + ", ".join(f"'{t}'" for t in terms) + "]"


def _sql_pick(cat: str, kw_sql: str, rc_sql: str, salt: str) -> str:
    terms = kw.SMART_TERMS[cat]
    return (
        f"list_extract({_sql_list(terms)}, CAST(("
        f"{_sql_h32(_sql_key(kw_sql, rc_sql, salt))} % {len(terms)}) + 1 AS INT))"
    )


def _sql_join(*parts: str) -> str:
    return " || ' ' || ".join(parts)


def _sql_strategy(s: int, kw_sql: str, rc_sql: str) -> str:
    p = lambda cat, salt: _sql_pick(cat, kw_sql, rc_sql, salt)  # noqa: E731
    if s == 1:
        return (
            f"CASE WHEN {rc_sql} <= 3 THEN "
            f"{_sql_join(p('style', 's1:style'), p('quality', 's1:quality'), kw_sql)} "
            f"ELSE {_sql_join(p('style', 's1:style'), p('quality', 's1:quality'), kw_sql, p('basic', 's1:basic'))} END"
        )
    if s == 2:
        q = kw.SMART_TERMS["quality"]
        nq = len(q)
        j1 = f"({_sql_h32(_sql_key(kw_sql, rc_sql, 's2:quality:1'))} % {nq})"
        j2 = (
            f"(({j1} + 1 + ({_sql_h32(_sql_key(kw_sql, rc_sql, 's2:quality:2'))}"
            f" % {nq - 1})) % {nq})"
        )
        q1 = f"list_extract({_sql_list(q)}, CAST({j1} + 1 AS INT))"
        q2 = f"list_extract({_sql_list(q)}, CAST({j2} + 1 AS INT))"
        return (
            f"CASE WHEN {rc_sql} <= 5 THEN "
            f"{_sql_join(p('emotional', 's2:emotional'), q1, q2, kw_sql)} "
            f"ELSE {_sql_join(p('emotional', 's2:emotional'), p('professional', 's2:professional'), q1, q2, kw_sql)} END"
        )
    if s == 3:
        return _sql_join(
            p("camera", "s3:camera"), p("lighting", "s3:lighting"),
            p("style", "s3:style"), kw_sql,
        )
    if s == 4:
        return _sql_join(
            p("background", "s4:background"), p("color", "s4:color"),
            p("quality", "s4:quality"), kw_sql, p("basic", "s4:basic"),
        )
    if s == 5:
        return _sql_join(
            p("professional", "s5:professional"), p("lighting", "s5:lighting"),
            p("quality", "s5:quality"), p("emotional", "s5:emotional"),
            p("focus", "s5:focus"), kw_sql, p("basic", "s5:basic"),
        )
    if s == 6:
        return _sql_join(
            p("location", "s6:location"), p("time_period", "s6:time"),
            p("style", "s6:style"), kw_sql,
        )
    if s == 7:
        return _sql_join(
            p("size_format", "s7:size"), p("texture", "s7:texture"),
            p("color", "s7:color"), kw_sql,
        )
    return _sql_join(
        p("condition", "s8:condition"), p("arrangement", "s8:arrangement"),
        p("generic_quality", "s8:generic"), kw_sql,
    )


def _sql_band_pick(strategies, kw_sql: str, rc_sql: str) -> str:
    arr = "[" + ", ".join(str(s) for s in strategies) + "]"
    return (
        f"list_extract({arr}, CAST(("
        f"{_sql_h32(_sql_key(kw_sql, rc_sql, 'band'))} % {len(strategies)}) + 1 AS INT))"
    )


def _sql_strategy_id(kw_sql: str, rc_sql: str) -> str:
    whens = " ".join(
        f"WHEN {rc_sql} <= {bound} THEN {_sql_band_pick(strats, kw_sql, rc_sql)}"
        for bound, strats in kw.STRATEGY_BANDS
    )
    return f"CASE {whens} ELSE {_sql_band_pick(kw.FALLBACK_BAND, kw_sql, rc_sql)} END"


def _sql_term(kw_sql: str, rc_sql: str) -> str:
    whens = " ".join(
        f"WHEN {s} THEN {_sql_strategy(s, kw_sql, rc_sql)}" for s in range(1, 8)
    )
    return (
        f"CASE {_sql_strategy_id(kw_sql, rc_sql)} {whens} "
        f"ELSE {_sql_strategy(8, kw_sql, rc_sql)} END"
    )


_ALTS_SQL = (
    "list_prepend(keyword, list_transform("
    f"range(LEAST({kw.MAX_ALTERNATIVES}, 3 + rc)), "
    f"i -> {_sql_term('keyword', '(rc + i)')}))"
)

_SMART_ORACLE = f"""
WITH base AS (
  SELECT doc_id,
         'kw' || CAST(doc_id % 20 AS VARCHAR) AS keyword,
         CAST(doc_id % 14 AS INT) AS rc
  FROM documents
),
raw AS (
  SELECT doc_id, keyword, rc, {_ALTS_SQL} AS alts_raw
  FROM base
),
deduped AS (
  SELECT doc_id, keyword, rc,
         list_filter(alts_raw, (x, i) -> list_position(alts_raw, x) = i) AS alts
  FROM raw
)
SELECT doc_id, keyword, rc AS retry_count,
       {_sql_strategy_id('keyword', 'rc')} AS strategy_id,
       {_sql_term('keyword', 'rc')} AS retry_term,
       CAST(len(alts) AS BIGINT) AS n_alts,
       array_to_string(alts, '|') AS alts_str,
       list_extract(alts, CAST((rc % len(alts)) + 1 AS INT)) AS next_term
FROM deduped
"""


@register(
    "crawl_smart_retry_terms",
    oracle=_SMART_ORACLE,
    doc="Smart-combination retry ladder (strategies 1-8, progressive "
    "band escalation, 15-alternative cap with the original keyword "
    "first — builder/_keywords.py:356-473,520-564), with random.choice "
    "determinized to md5 picks shared verbatim with the oracle SQL.",
)
def crawl_smart_retry_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.concat(F.lit("kw"), (F.col("doc_id") % 20).cast("string")).alias(
            "keyword"
        ),
        (F.col("doc_id") % 14).cast("int").alias("rc"),
    )
    kw_col, rc_col = F.col("keyword"), F.col("rc")
    alts = kw.smart_alternatives_expr(kw_col, rc_col)
    return base.select(
        "doc_id",
        "keyword",
        rc_col.alias("retry_count"),
        kw.smart_strategy_id_expr(kw_col, rc_col).alias("strategy_id"),
        kw.smart_term_expr(kw_col, rc_col).alias("retry_term"),
        F.size(alts).cast("long").alias("n_alts"),
        F.concat_ws("|", alts).alias("alts_str"),
        kw.next_term_expr(alts, rc_col).alias("next_term"),
    )
