"""Round-5 batch: scheduler fairness, Zipf-law quality gate,
compaction planning, capture-recapture frontier sizing.

- ``crawl_fairness_jains``: Jain's fairness index J = (sum x)^2 /
  (n * sum x^2) over per-host served-fetch counts — THE standard
  scheduler-fairness scalar (Jain/Chiu/Hawe 1984). J = 1 means every
  host got an equal share of the crawl budget; J -> 1/n means one
  host starved everyone else. Complements stats_gini_concentration
  (corpus inequality) with the scheduler-side view.
- ``text_zipf_fit``: OLS fit of log(freq) ~ log(rank) over the
  term-frequency spectrum. Natural-language corpora follow Zipf's
  law with slope ~ -1; machine-generated/gibberish text is
  measurably flatter — so the fitted slope is a corpus-level quality
  gate (and the fixture's random-vocab text SHOULD fail it, which
  the invariant test pins).
- ``store_compaction_plan``: small-file compaction planning for the
  lakehouse layer — greedy running-sum bin packing of data files
  into ~TARGET_MB output groups per partition (the Iceberg
  binpack/rewrite_data_files strategy). The store API already
  REWRITES files (sources/tables.py maintenance); this is the
  planning query that decides WHAT to rewrite, as a first-class
  auditable result.
- ``stats_capture_recapture``: Lincoln-Petersen / Chapman estimate
  of the total URL-population size from the overlap of two
  independent crawl samples — the standard ecology estimator applied
  to "how big is the frontier we have NOT seen?" (web-size
  estimation literature: Lawrence & Giles 1998 used the same
  overlap idea across search engines).

Scale design (100 TB / 1000 executors):
- jains: one map-side-combining groupBy onto the bounded host key +
  one single-row reduction. Zero joins, zero windows.
- zipf: term-frequency groupBy (uniform hash keys), then ALL window/
  OLS work runs on the top-N term dim (N = 500 rows) after a
  WindowGroupLimit rank cut — corpus-sized shuffle only for the
  word count itself.
- compaction: per-partition ordered prefix sum over the FILE
  MANIFEST (files, not rows — a 100 TB table at 512 MB files is
  ~2*10^5 manifest rows); at larger manifests the two-phase
  prefix-scan (operators/prefixsum.py) replaces the single window.
- capture-recapture: two distinct-sets + one intersection count —
  all hash-uniform aggregates; the estimator itself is a 1-row
  computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pixcrawler_spark.queries.registry import register
from pixcrawler_spark.sources.tables import load_table

__all__: list[str] = []

FAIR_N_HOSTS = 50
ZIPF_TOP_N = 500
COMPACT_TARGET_MB = 128
CR_POP_MOD = 367  # prime, not divisible by 3: the %3 sample split
# wraps into overlapping URL sets at EVERY fixture scale (a modulus
# divisible by 3 would keep the two samples disjoint -> m = 0)

# ---------------------------------------------------------------------------
# crawl_fairness_jains — scheduler fairness over per-host budget
# ---------------------------------------------------------------------------


@register(
    "crawl_fairness_jains",
    oracle=f"""
    WITH served AS (
      SELECT 'h' || CAST(user_id % {FAIR_N_HOSTS} AS VARCHAR) AS host,
             CAST(count(*) AS BIGINT) AS x
      FROM events GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_hosts,
           CAST(sum(x) AS BIGINT) AS total_served,
           round((sum(x) * sum(x)) * 1.0
                 / (count(*) * sum(x * x)), 6) AS jains_index,
           round(max(x) * 1.0 / sum(x), 6) AS max_share,
           round(min(x) * 1.0 / sum(x), 6) AS min_share
    FROM served
    """,
    doc="Jain's fairness index (sum x)^2/(n*sum x^2) over per-host "
    "served-fetch counts: 1.0 = perfectly even crawl budget, 1/n = "
    "total starvation by one host. The politeness scheduler's "
    "health scalar, paired with max/min share for the extremes. One "
    "bounded-key groupBy + a single-row reduction; integer sums "
    "keep the ratios exact until the final (identical) divisions.",
)
def crawl_fairness_jains(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    served = e.groupBy(
        F.concat(
            F.lit("h"), (F.col("user_id") % FAIR_N_HOSTS).cast("string")
        ).alias("host")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    return served.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hosts"),
        F.sum("x").cast("bigint").alias("total_served"),
        F.round(
            (F.sum("x") * F.sum("x"))
            * 1.0
            / (F.count(F.lit(1)) * F.sum(F.col("x") * F.col("x"))),
            6,
        ).alias("jains_index"),
        F.round(F.max("x") * 1.0 / F.sum("x"), 6).alias("max_share"),
        F.round(F.min("x") * 1.0 / F.sum("x"), 6).alias("min_share"),
    )


# ---------------------------------------------------------------------------
# text_zipf_fit — log-log OLS over the term-frequency spectrum
# ---------------------------------------------------------------------------


@register(
    "text_zipf_fit",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
      FROM documents
    ),
    tf AS (
      SELECT term, CAST(count(*) AS BIGINT) AS freq
      FROM tok WHERE term != '' GROUP BY term
    ),
    ranked AS (
      SELECT freq,
             row_number() OVER (ORDER BY freq DESC, term ASC) AS rnk
      FROM tf
    ),
    pts AS (
      SELECT ln(rnk) AS lx, ln(freq) AS ly
      FROM ranked WHERE rnk <= {ZIPF_TOP_N}
    )
    SELECT CAST(count(*) AS BIGINT) AS n_terms,
           round(covar_pop(lx, ly) / var_pop(lx), 4) AS slope,
           round(avg(ly) - covar_pop(lx, ly) / var_pop(lx) * avg(lx),
                 4) AS intercept,
           round(covar_pop(lx, ly) * covar_pop(lx, ly)
                 / (var_pop(lx) * var_pop(ly)), 4) AS r2,
           (round(covar_pop(lx, ly) / var_pop(lx), 4)
              BETWEEN -1.5 AND -0.5) AS is_zipfian
    FROM pts
    """,
    doc="Zipf's-law fit: OLS slope of ln(freq) on ln(rank) over the "
    f"top-{ZIPF_TOP_N} terms. Natural text gives slope ~ -1 (Zipf "
    "1949); templated/machine/gibberish text is flatter — the slope "
    "is a corpus-level quality gate, and the synthetic random-vocab "
    "fixture correctly FAILS it (near-uniform frequencies). The "
    "corpus-sized work is one uniform-key term count; the top-N cut "
    "is a distributed sort-limit (TakeOrderedAndProject, O(N) heap "
    "per task) and the rank window + OLS run on the 500-row result. "
    "The gate flag compares the ROUNDED slope "
    "so a ulp of covariance drift cannot flip it cross-engine.",
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term")
    ).where(F.col("term") != "")
    tf = tok.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("freq")
    )
    # top-N via distributed sort-limit (TakeOrderedAndProject: O(N)
    # per-task heap state), NOT a global rank window — a windowed
    # rn <= N over the full vocabulary does not compile to
    # WindowGroupLimit when the partition spec is empty, so it would
    # funnel every term through one partition at corpus scale
    # (plan-audited in tests/test_plan_audits.py). The rank window
    # then runs over the <= N-row result only.
    top = tf.orderBy(F.col("freq").desc(), F.col("term").asc()).limit(
        ZIPF_TOP_N
    )
    w = Window.orderBy(F.col("freq").desc(), F.col("term").asc())
    pts = top.withColumn("rnk", F.row_number().over(w)).select(
        F.log(F.col("rnk")).alias("lx"),
        F.log(F.col("freq")).alias("ly"),
    )
    slope = F.covar_pop("lx", "ly") / F.var_pop("lx")
    return pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        F.round(slope, 4).alias("slope"),
        F.round(F.avg("ly") - slope * F.avg("lx"), 4).alias("intercept"),
        F.round(
            F.covar_pop("lx", "ly")
            * F.covar_pop("lx", "ly")
            / (F.var_pop("lx") * F.var_pop("ly")),
            4,
        ).alias("r2"),
        F.round(slope, 4).between(-1.5, -0.5).alias("is_zipfian"),
    )


# ---------------------------------------------------------------------------
# store_compaction_plan — greedy bin packing of small files
# ---------------------------------------------------------------------------


@register(
    "store_compaction_plan",
    oracle=f"""
    WITH manifest AS (
      SELECT CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS file_id,
             l_returnflag AS part,
             CAST(l_quantity AS BIGINT) AS size_mb
      FROM lineitem
    ),
    packed AS (
      SELECT part, size_mb,
             CAST(floor((sum(size_mb) OVER (
                    PARTITION BY part
                    ORDER BY size_mb DESC, file_id ASC) - 1)
                  / {COMPACT_TARGET_MB}) AS BIGINT) AS bin_id
      FROM manifest
    )
    SELECT part, bin_id,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(size_mb) AS BIGINT) AS bin_mb
    FROM packed GROUP BY part, bin_id
    """,
    doc="Small-file compaction planning (Iceberg binpack analog): "
    "greedy running-sum packing of manifest files into "
    f"~{COMPACT_TARGET_MB} MB output groups per table partition, "
    "largest-first for FFD-style balance. This PLANS what "
    "sources/tables.py's rewrite maintenance then executes. The "
    "window runs over the FILE MANIFEST (a 100 TB table at 512 MB "
    "files is ~2e5 manifest rows, dim-sized); larger manifests "
    "switch to the two-phase prefix scan (operators/prefixsum.py). "
    "Pure integer prefix math — no float boundary anywhere.",
)
def store_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    manifest = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber"))
        .cast("bigint")
        .alias("file_id"),
        F.col("l_returnflag").alias("part"),
        F.col("l_quantity").cast("bigint").alias("size_mb"),
    )
    w = Window.partitionBy("part").orderBy(
        F.col("size_mb").desc(), F.col("file_id").asc()
    )
    packed = manifest.select(
        "part",
        "size_mb",
        F.floor((F.sum("size_mb").over(w) - 1) / COMPACT_TARGET_MB)
        .cast("bigint")
        .alias("bin_id"),
    )
    return packed.groupBy("part", "bin_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum("size_mb").cast("bigint").alias("bin_mb"),
    )


# ---------------------------------------------------------------------------
# stats_capture_recapture — frontier-size estimation from two samples
# ---------------------------------------------------------------------------


@register(
    "stats_capture_recapture",
    oracle=f"""
    WITH s1 AS (
      SELECT DISTINCT CAST(event_id % {CR_POP_MOD} AS BIGINT) AS url_id
      FROM events WHERE event_id % 3 = 0
    ),
    s2 AS (
      SELECT DISTINCT CAST(event_id % {CR_POP_MOD} AS BIGINT) AS url_id
      FROM events WHERE event_id % 3 = 1
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS m
      FROM s1 JOIN s2 USING (url_id)
    ),
    truth AS (
      SELECT CAST(count(DISTINCT event_id % {CR_POP_MOD}) AS BIGINT)
               AS true_n
      FROM events
    )
    SELECT (SELECT count(*) FROM s1) AS n1,
           (SELECT count(*) FROM s2) AS n2,
           m.m AS n_overlap,
           CASE WHEN m.m > 0 THEN
             round((SELECT count(*) FROM s1)
                   * (SELECT count(*) FROM s2) * 1.0 / m.m, 4)
           END AS petersen_est,
           round(((SELECT count(*) FROM s1) + 1)
                 * ((SELECT count(*) FROM s2) + 1) * 1.0 / (m.m + 1)
                 - 1, 4) AS chapman_est,
           truth.true_n
    FROM m CROSS JOIN truth
    """,
    doc="Capture-recapture frontier sizing: Lincoln-Petersen N^ = "
    "n1*n2/m and the bias-corrected Chapman variant over the URL "
    "overlap of two independent crawl samples — 'how many URLs "
    "exist that we have not crawled yet' (the Lawrence-Giles web-"
    "size method). Two hash-uniform distinct sets, one semi-join "
    "overlap count, a 1-row estimator; every input to the final "
    "divisions is an exact integer, so the estimate is bit-equal "
    "cross-engine.",
)
def stats_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    url = (F.col("event_id") % CR_POP_MOD).cast("bigint").alias("url_id")
    s1 = e.where(F.col("event_id") % 3 == 0).select(url).distinct()
    s2 = e.where(F.col("event_id") % 3 == 1).select(url).distinct()
    n1 = s1.agg(F.count(F.lit(1)).cast("bigint").alias("n1"))
    n2 = s2.agg(F.count(F.lit(1)).cast("bigint").alias("n2"))
    m = (
        s1.join(s2, "url_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_overlap"))
    )
    truth = e.agg(
        F.countDistinct(
            (F.col("event_id") % CR_POP_MOD).cast("bigint")
        )
        .cast("bigint")
        .alias("true_n")
    )
    return (
        n1.crossJoin(F.broadcast(n2))
        .crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(truth))
        .select(
            "n1",
            "n2",
            "n_overlap",
            F.when(
                F.col("n_overlap") > 0,
                F.round(
                    F.col("n1") * F.col("n2") * 1.0 / F.col("n_overlap"),
                    4,
                ),
            ).alias("petersen_est"),
            F.round(
                (F.col("n1") + 1)
                * (F.col("n2") + 1)
                * 1.0
                / (F.col("n_overlap") + 1)
                - 1,
                4,
            ).alias("chapman_est"),
            "true_n",
        )
    )
