"""Round-5 batch: asymmetric containment dedup, co-citation graph
similarity, EWMA host-load forecasting, CUSUM changepoint detection.

- ``dedup_containment_bottomk``: asymmetric containment C(A->B) =
  |shingles(A) inter shingles(B)| / |shingles(A)| estimated from a
  bottom-k sketch of A probed against B's full (df-capped) shingle
  set. Jaccard-based MinHash misses subset duplicates — a short doc
  fully quoted inside a long one scores low Jaccard but containment
  ~1.0 (Broder's distinction); this is the estimator CC-style corpus
  dedup uses to kill quote/subsumption dups that survive the
  symmetric passes.
- ``graph_cocitation_similarity``: co-citation similarity between
  target pages — two URLs are related if many SOURCE pages link to
  both (Small 1973); Jaccard over inlink sets. The crawl-side use is
  seed expansion: pages co-cited with known-good seeds are
  high-priority frontier candidates.
- ``crawl_hostload_ewma``: exponentially-weighted moving average of
  per-host fetch latency (alpha = 0.5, the closed-form weights
  alpha*(1-alpha)^(n-i)), forecasting next-round per-host capacity
  (fetches/min at the forecast latency). Complements
  crawl_adaptive_delay's static quantiles with a recency-weighted
  signal: a host that just slowed down cuts its budget NOW, not
  after the p95 catches up.
- ``stats_cusum_changepoint``: CUSUM (Page 1954) sequential
  changepoint detection over the hourly mean-latency series, via the
  reflected-random-walk identity S_t = cum_t - min(0, min_{j<=t}
  cum_j) for y = x - mu - slack — an O(1)-state monitor for "the
  fetch path just degraded" that a threshold-on-mean check misses.

Scale design (100 TB / 1000 executors):
- containment: probes are <= K rows/doc (bottom-k by uniform md5
  order via WindowGroupLimit, map-side partial top-K); hot shingles
  are removed by the same broadcast-anti df-cap as the Jaccard path
  BEFORE the inverted-index join, so no join key exceeds df=64 and
  candidate mass is bounded by K * df per doc — never all-pairs.
- cocitation: the src-keyed self-join is the standard inverted-index
  pair generation; hub sources (outdeg beyond a cap) would go
  through the same df-cap guard at corpus scale. One pair-keyed
  aggregate, indegree dim joined back broadcast.
- ewma: ONE host-keyed window (ordered by time within host; hosts
  are the politeness partitioning key so the shuffle is already
  paid by the scheduler); weights are positionally computed powers
  of 1/2 (exact in binary). Incremental round-over-round: new EWMA
  folds the stored previous value with O(delta) work.
- cusum: events collapse to an HOURLY series first (bounded dim), so
  the ordered scan windows run over ~10^3 rows regardless of corpus
  size; the two corpus-wide aggregates (mu, sd) are
  map-side-combining single-row reductions broadcast back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pixcrawler_spark.operators import dedup as dd
from pixcrawler_spark.queries.registry import register
from pixcrawler_spark.sources.tables import load_table

__all__: list[str] = []

CONT_K = 16  # bottom-k probe size per document
CONT_MAX_DF = 64  # shingles in > this many docs never become join keys
CONT_THRESHOLD = 0.5  # report pairs with estimated containment >= this

COCIT_SRC_MOD = 200
COCIT_DST_MOD = 97
COCIT_MIN_JACCARD = 0.4

EWMA_ALPHA = 0.5  # powers of 1/2 are exact in binary floating point

CUSUM_SLACK_SD = 0.5  # slack k = 0.5 sigma (standard CUSUM tuning)
CUSUM_H_SD = 5.0  # alarm threshold h = 5 sigma

# ---------------------------------------------------------------------------
# dedup_containment_bottomk — asymmetric subset-duplicate detection
# ---------------------------------------------------------------------------


@register(
    "dedup_containment_bottomk",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id,
             unnest(list_transform(range(len(toks) - 2),
                    i -> toks[i + 1] || ' ' || toks[i + 2]
                         || ' ' || toks[i + 3])) AS shingle
      FROM (SELECT doc_id,
                   regexp_split_to_array(trim(text), '\\s+') AS toks
            FROM documents)
      WHERE len(toks) >= 3
    ),
    dsh AS (SELECT DISTINCT doc_id, md5(shingle) AS h FROM sh),
    hot AS (
      SELECT h FROM (SELECT h, count(*) AS df FROM dsh GROUP BY h)
      WHERE df > {CONT_MAX_DF}
    ),
    capped AS (
      SELECT doc_id, h FROM dsh WHERE h NOT IN (SELECT h FROM hot)
    ),
    probes AS (
      SELECT doc_id, h FROM (
        SELECT doc_id, h,
               row_number() OVER (PARTITION BY doc_id ORDER BY h) AS rn
        FROM capped
      ) WHERE rn <= {CONT_K}
    ),
    np AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_probe
      FROM probes GROUP BY doc_id
    ),
    hits AS (
      SELECT p.doc_id AS a_id, t.doc_id AS b_id,
             CAST(count(*) AS BIGINT) AS n_hit
      FROM probes p JOIN capped t
        ON p.h = t.h AND p.doc_id != t.doc_id
      GROUP BY 1, 2
    )
    SELECT a_id, b_id, n_probe, n_hit,
           round(n_hit * 1.0 / n_probe, 6) AS containment
    FROM hits JOIN np ON np.doc_id = hits.a_id
    WHERE n_hit * 1.0 / n_probe >= {CONT_THRESHOLD}
    """,
    doc="Asymmetric containment C(A->B) estimated by probing A's "
    f"bottom-{CONT_K} shingle-hash sketch against B's df-capped "
    "shingle set: catches subset/quote duplicates that symmetric "
    "Jaccard misses (a doc wholly contained in a 10x-longer one "
    "has Jaccard ~0.1 but containment ~1.0). Probes are <= K rows "
    "per doc (WindowGroupLimit bottom-k by uniform md5 order); hot "
    f"shingles (df > {CONT_MAX_DF}) are broadcast-anti-joined away "
    "before the inverted-index join, bounding candidate mass at "
    "K x df per document — never all-pairs.",
)
def dedup_containment_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dd.containment_bottomk_pairs(
        d,
        "doc_id",
        "text",
        n=3,
        k=CONT_K,
        max_df=CONT_MAX_DF,
        threshold=CONT_THRESHOLD,
    )


# ---------------------------------------------------------------------------
# graph_cocitation_similarity — inlink-set Jaccard via shared sources
# ---------------------------------------------------------------------------


@register(
    "graph_cocitation_similarity",
    oracle=f"""
    WITH edges AS (
      SELECT DISTINCT CAST(user_id % {COCIT_SRC_MOD} AS BIGINT) AS src,
                      CAST(event_id % {COCIT_DST_MOD} AS BIGINT) AS dst
      FROM events
      WHERE user_id % {COCIT_SRC_MOD} != event_id % {COCIT_DST_MOD}
    ),
    indeg AS (
      SELECT dst, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY dst
    ),
    co AS (
      SELECT e1.dst AS a, e2.dst AS b, CAST(count(*) AS BIGINT) AS co
      FROM edges e1 JOIN edges e2
        ON e1.src = e2.src AND e1.dst < e2.dst
      GROUP BY 1, 2
    )
    SELECT a, b, co,
           ia.d AS indeg_a, ib.d AS indeg_b,
           round(co * 1.0 / (ia.d + ib.d - co), 6) AS jaccard
    FROM co JOIN indeg ia ON ia.dst = co.a
            JOIN indeg ib ON ib.dst = co.b
    WHERE co * 1.0 / (ia.d + ib.d - co) >= {COCIT_MIN_JACCARD}
    """,
    doc="Co-citation similarity (Small 1973): two target pages are "
    "related when many source pages link to BOTH; Jaccard over "
    "inlink sets. Crawl use: frontier candidates co-cited with "
    "known-good seeds inherit priority. The src-keyed self-join is "
    "inverted-index pair generation (bounded per-src outdeg; hub "
    "sources go through the df-cap guard at corpus scale), one "
    "pair-keyed aggregate, then the indegree dim broadcast back. "
    "The threshold compares the EXACT rational co/(da+db-co) (IEEE "
    "division is identical cross-engine), so no rounding boundary.",
)
def graph_cocitation_similarity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    src = (F.col("user_id") % COCIT_SRC_MOD).cast("bigint")
    dst = (F.col("event_id") % COCIT_DST_MOD).cast("bigint")
    edges = (
        e.select(src.alias("src"), dst.alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    indeg = edges.groupBy("dst").agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    co = (
        edges.alias("e1")
        .join(
            edges.alias("e2"),
            (F.col("e1.src") == F.col("e2.src"))
            & (F.col("e1.dst") < F.col("e2.dst")),
        )
        .groupBy(
            F.col("e1.dst").alias("a"), F.col("e2.dst").alias("b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("co"))
    )
    ia = F.broadcast(
        indeg.select(F.col("dst").alias("a"), F.col("d").alias("indeg_a"))
    )
    ib = F.broadcast(
        indeg.select(F.col("dst").alias("b"), F.col("d").alias("indeg_b"))
    )
    jac = F.col("co") * 1.0 / (
        F.col("indeg_a") + F.col("indeg_b") - F.col("co")
    )
    return (
        co.join(ia, "a")
        .join(ib, "b")
        .where(jac >= COCIT_MIN_JACCARD)
        .select(
            "a",
            "b",
            "co",
            "indeg_a",
            "indeg_b",
            F.round(jac, 6).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# crawl_hostload_ewma — recency-weighted per-host latency forecast
# ---------------------------------------------------------------------------


@register(
    "crawl_hostload_ewma",
    oracle=f"""
    WITH obs AS (
      SELECT 'h' || CAST(user_id % 50 AS VARCHAR) AS domain,
             value AS latency_ms, ts, event_id
      FROM events
    ),
    pos AS (
      SELECT domain, latency_ms,
             row_number() OVER (
               PARTITION BY domain ORDER BY ts, event_id) AS rn,
             count(*) OVER (PARTITION BY domain) AS n
      FROM obs
    ),
    weighted AS (
      SELECT domain, n,
             CASE WHEN rn = 1 THEN pow({1 - EWMA_ALPHA}, n - 1)
                  ELSE {EWMA_ALPHA} * pow({1 - EWMA_ALPHA}, n - rn)
             END * latency_ms AS w_x
      FROM pos
    )
    SELECT domain,
           CAST(max(n) AS BIGINT) AS n_obs,
           round(sum(w_x), 4) AS ewma_ms,
           CAST(floor(60000.0 / greatest(round(sum(w_x), 4), 1.0))
                AS BIGINT) AS fetches_per_min
    FROM weighted GROUP BY domain
    """,
    doc="Per-host EWMA latency forecast (alpha = 1/2): the recursive "
    "ewma_t = a*x_t + (1-a)*ewma_(t-1) expanded to its closed-form "
    "positional weights a*(1-a)^(n-i) — powers of 1/2 are EXACT in "
    "binary, so the weights carry no libm variance across engines. "
    "Forecast capacity = floor(60000 / ewma) fetches/min feeds the "
    "next round's politeness budget, reacting to a host slowdown "
    "immediately where the static p95 (crawl_adaptive_delay) lags. "
    "One host-keyed window (the politeness key — shuffle already "
    "paid by the scheduler); round-over-round the EWMA folds the "
    "stored previous value incrementally, O(delta).",
)
def crawl_hostload_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    obs = e.select(
        F.concat(F.lit("h"), (F.col("user_id") % 50).cast("string")).alias(
            "domain"
        ),
        F.col("value").alias("latency_ms"),
        "ts",
        "event_id",
    )
    part = Window.partitionBy("domain")
    w = part.orderBy("ts", "event_id")
    pos = obs.select(
        "domain",
        "latency_ms",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(part).alias("n"),
    )
    beta = F.lit(1 - EWMA_ALPHA)
    weight = F.when(
        F.col("rn") == 1, F.pow(beta, F.col("n") - 1)
    ).otherwise(EWMA_ALPHA * F.pow(beta, F.col("n") - F.col("rn")))
    ewma = F.round(F.sum(weight * F.col("latency_ms")), 4)
    return pos.groupBy("domain").agg(
        F.max("n").cast("bigint").alias("n_obs"),
        ewma.alias("ewma_ms"),
        F.floor(60000.0 / F.greatest(ewma, F.lit(1.0)))
        .cast("bigint")
        .alias("fetches_per_min"),
    )


# ---------------------------------------------------------------------------
# stats_cusum_changepoint — sequential fetch-path degradation monitor
# ---------------------------------------------------------------------------


@register(
    "stats_cusum_changepoint",
    oracle=f"""
    WITH series AS (
      SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS t,
             avg(value) AS x
      FROM events GROUP BY 1
    ),
    stats AS (
      SELECT avg(x) AS mu, stddev_samp(x) AS sd,
             CAST(count(*) AS BIGINT) AS n
      FROM series
    ),
    walk AS (
      SELECT t, x,
             sum(x - mu - {CUSUM_SLACK_SD} * sd)
               OVER (ORDER BY t) AS cum,
             {CUSUM_H_SD} * sd AS h
      FROM series CROSS JOIN stats
    ),
    s AS (
      SELECT t, h,
             cum - least(0, min(cum) OVER (ORDER BY t)) AS s_t
      FROM walk
    )
    SELECT (SELECT n FROM stats) AS n_points,
           round((SELECT mu FROM stats), 4) AS target_ms,
           round((SELECT sd FROM stats), 4) AS sigma_ms,
           round(max(s_t), 4) AS max_s,
           CAST(sum(CASE WHEN s_t > h THEN 1 ELSE 0 END) AS BIGINT)
             AS n_alarms,
           min(CASE WHEN s_t > h THEN t END) AS first_alarm_t
    FROM s
    """,
    doc="CUSUM changepoint monitor (Page 1954) over the HOURLY mean "
    "latency series: S_t = max(0, S_(t-1) + x_t - mu - 0.5*sigma) "
    "computed windowed via the reflected-walk identity S_t = cum_t "
    "- min(0, min_j<=t cum_j); alarm when S_t > 5*sigma. Detects "
    "sustained small shifts a per-point threshold misses. Events "
    "collapse to the hour dim FIRST (map-side combine), so the "
    "ordered windows scan ~10^3 rows at any corpus scale; mu/sigma "
    "are single-row reductions broadcast back via crossJoin.",
)
def stats_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    series = e.groupBy(
        F.floor(F.unix_timestamp("ts") / 3600).cast("bigint").alias("t")
    ).agg(F.avg("value").alias("x"))
    stats = series.agg(
        F.avg("x").alias("mu"),
        F.stddev_samp("x").alias("sd"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    wcum = Window.orderBy("t")
    walk = series.crossJoin(F.broadcast(stats)).select(
        "t",
        "n",
        "mu",
        "sd",
        F.sum(
            F.col("x") - F.col("mu") - CUSUM_SLACK_SD * F.col("sd")
        )
        .over(wcum)
        .alias("cum"),
        (CUSUM_H_SD * F.col("sd")).alias("h"),
    )
    s = walk.select(
        "t",
        "n",
        "mu",
        "sd",
        "h",
        (
            F.col("cum")
            - F.least(F.lit(0.0), F.min("cum").over(wcum))
        ).alias("s_t"),
    )
    return s.agg(
        F.max("n").alias("n_points"),
        F.round(F.max("mu"), 4).alias("target_ms"),
        F.round(F.max("sd"), 4).alias("sigma_ms"),
        F.round(F.max("s_t"), 4).alias("max_s"),
        F.sum(F.when(F.col("s_t") > F.col("h"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_alarms"),
        F.min(F.when(F.col("s_t") > F.col("h"), F.col("t"))).alias(
            "first_alarm_t"
        ),
    )
