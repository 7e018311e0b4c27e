"""Round-5 third batch: Poisson-bootstrap confidence intervals,
bucketed IP-range joins, readability scoring, and mojibake detection.

Four more operators a web-scale crawl/corpus pipeline runs:

- ``stats_poisson_bootstrap``: distributed confidence intervals for
  crawl metrics via the Poisson bootstrap (Chamandy et al. 2012, the
  streaming/sharded bootstrap Google built for exactly this setting)
  — classic resampling needs N draws WITH replacement per replica
  (impossible one-pass over shards); Poisson(1) per-row weights are
  an asymptotically equivalent one-pass substitute. Weights here are
  DETERMINISTIC (inverse-CDF on a 60-bit hash uniform) so replicas
  are reproducible across engines and cluster sizes.
- ``crawl_ip_range_join``: IP -> ASN/geo attribution, the canonical
  NON-equi join Spark has no native operator for. Naive plans are
  broadcast-nested-loop O(rows x ranges); interval bucketing turns
  it into an equi-join on the bucket id (each range explodes to the
  buckets it overlaps, each address probes exactly one bucket).
- ``text_readability_score``: Flesch-Kincaid grade level per doc
  (sentence/word/syllable counts as JVM expressions) — the classic
  fluency gate used alongside model-based quality scores.
- ``text_mojibake_detect``: double-encoded UTF-8 / replacement-char
  detection (the 'â€™'-class corruption every web corpus carries) —
  count the classic mojibake byte-sequence markers per doc and gate.

Reference analogs: none — the reference (builder/core, validator/
integrity.py) has no statistics, no non-equi joins, and no text
analysis; these are the operations its per-file architecture could
not express.

Scale design (100 TB / 1000 executors):
- bootstrap: per-row replica weights are a pure hash expression; the
  explode to (replica, row) is map-side and collapses IMMEDIATELY
  into per-partition partial aggregates on the replica key — the
  shuffle carries B x partitions tiny rows, never the data. Second
  stage aggregates B=32 replica means into one CI row.
- range join: ranges explode to O(width/bucket) bucket rows
  (broadcast — range tables are dims); the fact side computes ONE
  bucket id per address and equi-joins, so the non-equi predicate
  only runs within a bucket. Bucket width trades dim blowup vs
  in-bucket filter selectivity.
- readability/mojibake: pure map-only expression chains (regexp +
  higher-order folds), zero shuffle at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pixcrawler_spark.operators import sketches as sk
from pixcrawler_spark.queries.registry import register
from pixcrawler_spark.sources.tables import load_table

__all__: list[str] = []


# ---------------------------------------------------------------------------
# stats_poisson_bootstrap — deterministic Poisson-bootstrap CI
# ---------------------------------------------------------------------------
PB_REPLICAS = 32

# Poisson(1) inverse CDF thresholds (cumulative probabilities for
# k = 0..5, capped at 6). Shared literals => identical weights in both
# engines for the same hash uniform.
_PB_CDF = (
    0.3678794412,
    0.7357588823,
    0.9196986029,
    0.9810118431,
    0.9963401532,
    0.9994058152,
)


def _pb_u_sql(replica: str) -> str:
    h = sk.sql_h60(
        f"'pb:' || CAST({replica} AS VARCHAR) || ':' "
        "|| CAST(event_id AS VARCHAR)"
    )
    return f"(({h} % 1000000) / 1000000.0)"


def _pb_w_sql(u: str) -> str:
    cases = " ".join(
        f"WHEN {u} < {c} THEN {k}" for k, c in enumerate(_PB_CDF)
    )
    return f"(CASE {cases} ELSE 6 END)"


@register(
    "stats_poisson_bootstrap",
    oracle=f"""
    WITH reps AS (
      SELECT unnest(range({PB_REPLICAS})) AS replica
    ),
    weighted AS (
      SELECT r.replica,
             {_pb_w_sql(_pb_u_sql("r.replica"))} AS w,
             e.value AS x
      FROM events e CROSS JOIN reps r
    ),
    means AS (
      SELECT replica,
             round(sum(w * x) / sum(w), 6) AS rep_mean
      FROM weighted GROUP BY replica
    ),
    base AS (
      SELECT avg(value) AS point FROM events
    )
    SELECT round(base.point, 6) AS point_estimate,
           round(avg(rep_mean), 6) AS boot_mean,
           round(stddev_samp(rep_mean), 6) AS boot_se,
           round(base.point - 1.96 * stddev_samp(rep_mean), 6) AS ci_lo,
           round(base.point + 1.96 * stddev_samp(rep_mean), 6) AS ci_hi
    FROM means, base
    GROUP BY base.point
    """,
    doc=f"Poisson-bootstrap CI ({PB_REPLICAS} replicas) for the mean "
    "crawl metric (Chamandy et al. 2012): per-row Poisson(1) weights "
    "substitute for with-replacement resampling so ONE pass over "
    "sharded data yields all replicas; weights are deterministic "
    "(inverse-CDF on a 60-bit hash uniform), so every engine and "
    "cluster size reproduces the same CI. The (replica, row) explode "
    "collapses into per-partition partial aggregates on the replica "
    "key — the shuffle carries B x partitions rows, never the data.",
)
def stats_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    reps = ev.select(
        F.col("event_id"),
        F.col("value").alias("x"),
        F.explode(F.sequence(F.lit(0), F.lit(PB_REPLICAS - 1))).alias(
            "replica"
        ),
    )
    u = (
        sk.h60(
            F.concat(
                F.lit("pb:"),
                F.col("replica").cast("string"),
                F.lit(":"),
                F.col("event_id").cast("string"),
            )
        )
        % 1000000
    ) / F.lit(1000000.0)
    w = F.lit(6)
    for k in range(len(_PB_CDF) - 1, -1, -1):
        w = F.when(u < _PB_CDF[k], F.lit(k)).otherwise(w)
    means = (
        reps.withColumn("w", w)
        .groupBy("replica")
        .agg(
            F.round(
                F.sum(F.col("w") * F.col("x")) / F.sum("w"), 6
            ).alias("rep_mean")
        )
    )
    base = ev.agg(F.avg("value").alias("point"))
    return (
        means.crossJoin(F.broadcast(base))
        .groupBy("point")
        .agg(
            F.round(F.avg("rep_mean"), 6).alias("boot_mean"),
            F.round(F.stddev_samp("rep_mean"), 6).alias("boot_se"),
            F.round(
                F.first("point") - 1.96 * F.stddev_samp("rep_mean"), 6
            ).alias("ci_lo"),
            F.round(
                F.first("point") + 1.96 * F.stddev_samp("rep_mean"), 6
            ).alias("ci_hi"),
        )
        .select(
            F.round(F.col("point"), 6).alias("point_estimate"),
            "boot_mean",
            "boot_se",
            "ci_lo",
            "ci_hi",
        )
    )


# ---------------------------------------------------------------------------
# crawl_ip_range_join — non-equi join via interval bucketing
# ---------------------------------------------------------------------------
IP_BUCKET = 1 << 20  # bucket width: ranges explode to width/bucket rows
_IP_SPACE = 1 << 28  # synthetic address space (2^28)
_N_RANGES = 25  # one range per nation row

# deterministic irregular widths: nation n gets weight 1 + h % 7, the
# space is split proportionally by the cumulative weight prefix.
_W_H = sk.sql_h60("'ipw:' || CAST(n_nationkey AS VARCHAR)")
_W_SQL = f"(1 + {_W_H} % 7)"


@register(
    "crawl_ip_range_join",
    oracle=f"""
    WITH w AS (
      SELECT n_nationkey, n_name, {_W_SQL} AS wt FROM nation
    ),
    pref AS (
      SELECT n_nationkey, n_name,
             CAST(sum(wt) OVER (ORDER BY n_nationkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  - wt AS BIGINT) AS cum0,
             CAST(sum(wt) OVER () AS BIGINT) AS tot
      , wt FROM w
    ),
    ranges AS (
      -- integer division (//) on BOTH engines: double division +
      -- cast would round differently (DuckDB rounds, Spark
      -- truncates) and drift on near-integer quotients
      SELECT n_name AS asn,
             (cum0 * {_IP_SPACE}) // tot AS ip_lo,
             ((cum0 + wt) * {_IP_SPACE}) // tot - 1 AS ip_hi
      FROM pref
    ),
    ips AS (
      SELECT event_id,
             CAST((event_id * 2654435761 + user_id * 40503)
                  % {_IP_SPACE} AS BIGINT) AS ip
      FROM events
    )
    SELECT r.asn,
           CAST(count(*) AS BIGINT) AS n_ips,
           CAST(min(i.ip) AS BIGINT) AS min_ip,
           CAST(max(i.ip) AS BIGINT) AS max_ip
    FROM ips i JOIN ranges r
      ON i.ip BETWEEN r.ip_lo AND r.ip_hi
    GROUP BY r.asn
    """,
    doc="IP->ASN attribution: the canonical non-equi (range) join, "
    "executed as an EQUI-join via interval bucketing — every range "
    f"explodes to the {IP_BUCKET}-wide buckets it overlaps (dim-side "
    "blowup, broadcast), every address computes ONE bucket id and "
    "probes it, and the BETWEEN predicate runs only within a bucket. "
    "The naive plan Spark picks for a raw range predicate is "
    "broadcast-nested-loop O(rows x ranges); bucketing makes it "
    "O(rows + ranges x width/bucket) with hash locality. The oracle "
    "runs the raw BETWEEN join — a different plan over the same "
    "semantics.",
)
def crawl_ip_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    nation = load_table(spark, sf_dir, "nation")
    wt = 1 + sk.h60(
        F.concat(F.lit("ipw:"), F.col("n_nationkey").cast("string"))
    ) % 7
    win = Window.orderBy("n_nationkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pref = nation.select(
        F.col("n_name").alias("asn"),
        wt.alias("wt"),
        F.col("n_nationkey"),
    ).select(
        "asn",
        "wt",
        (F.sum("wt").over(win) - F.col("wt")).cast("bigint").alias("cum0"),
        F.sum("wt").over(Window.partitionBy()).cast("bigint").alias("tot"),
    )
    # `div` = exact integer division, matching DuckDB's `//` (double
    # division + cast would round vs truncate differently per engine)
    ranges = pref.select(
        "asn",
        F.expr(f"(cum0 * {_IP_SPACE}) div tot").alias("ip_lo"),
        F.expr(f"((cum0 + wt) * {_IP_SPACE}) div tot - 1").alias("ip_hi"),
    )
    # dim-side bucket explosion: each range covers its overlapping
    # bucket ids; broadcast (ranges are a dim table)
    rb = ranges.select(
        "asn",
        "ip_lo",
        "ip_hi",
        F.explode(
            F.sequence(
                (F.col("ip_lo") / IP_BUCKET).cast("bigint"),
                (F.col("ip_hi") / IP_BUCKET).cast("bigint"),
            )
        ).alias("bucket"),
    )
    ev = load_table(spark, sf_dir, "events")
    ips = ev.select(
        "event_id",
        (
            (F.col("event_id") * 2654435761 + F.col("user_id") * 40503)
            % _IP_SPACE
        )
        .cast("bigint")
        .alias("ip"),
    ).withColumn("bucket", (F.col("ip") / IP_BUCKET).cast("bigint"))
    return (
        ips.join(F.broadcast(rb), "bucket")
        .where(F.col("ip").between(F.col("ip_lo"), F.col("ip_hi")))
        .groupBy("asn")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_ips"),
            F.min("ip").cast("bigint").alias("min_ip"),
            F.max("ip").cast("bigint").alias("max_ip"),
        )
    )


# ---------------------------------------------------------------------------
# text_readability_score — Flesch-Kincaid grade level
# ---------------------------------------------------------------------------
# syllable heuristic: count vowel GROUPS per word (runs of [aeiouy]),
# min 1 per word — the standard cheap approximation.


@register(
    "text_readability_score",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             lower(trim(text)) AS s
      FROM documents
    ),
    c AS (
      SELECT doc_id,
             GREATEST(len(regexp_split_to_array(s, '[.!?]+\\s*'))
                      - CASE WHEN s LIKE '%.' OR s LIKE '%!'
                             OR s LIKE '%?' THEN 1 ELSE 0 END,
                      1) AS n_sent,
             len(regexp_split_to_array(s, '\\s+')) AS n_words,
             GREATEST(len(regexp_extract_all(s, '([aeiouy]+)')),
                      1) AS n_syll
      FROM t
    )
    SELECT doc_id,
           CAST(n_sent AS BIGINT) AS n_sentences,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_syll AS BIGINT) AS n_syllables,
           round(0.39 * n_words / n_sent
                 + 11.8 * n_syll / n_words - 15.59, 6) AS fk_grade
    FROM c
    """,
    doc="Flesch-Kincaid grade level per document: sentences "
    "([.!?]+ splits, min 1), words (whitespace splits), syllables "
    "(vowel-group runs, min 1) — the classic cheap fluency gate run "
    "alongside model-based quality scores (a grade far outside "
    "[1, 16] is template spam or token soup). Three regexp "
    "expressions + arithmetic, all whole-stage codegen, zero shuffle "
    "at any scale.",
)
def text_readability_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    s = F.lower(F.trim(F.col("text")))
    ends_terminal = (
        s.endswith(".") | s.endswith("!") | s.endswith("?")
    )
    n_sent = F.greatest(
        F.size(F.split(s, r"[.!?]+\s*"))
        - F.when(ends_terminal, 1).otherwise(0),
        F.lit(1),
    )
    n_words = F.size(F.split(s, r"\s+"))
    n_syll = F.greatest(
        F.size(F.regexp_extract_all(s, F.lit(r"([aeiouy]+)"))), F.lit(1)
    )
    return d.select(
        "doc_id",
        n_sent.cast("bigint").alias("n_sentences"),
        n_words.cast("bigint").alias("n_words"),
        n_syll.cast("bigint").alias("n_syllables"),
        F.round(
            0.39 * n_words.cast("double") / n_sent
            + 11.8 * n_syll.cast("double") / n_words
            - 15.59,
            6,
        ).alias("fk_grade"),
    )


# ---------------------------------------------------------------------------
# text_mojibake_detect — double-encoded UTF-8 / replacement-char gate
# ---------------------------------------------------------------------------
# The classic corruption signatures: UTF-8 bytes decoded as
# Latin-1/cp1252 ('Ã' + continuation, 'â€' sequences from curly
# quotes/dashes) and the replacement character U+FFFD. The fixture
# corpus is clean ASCII, so corruption is PLANTED deterministically
# (doc_id-keyed, in-query on both sides — the URL-synthesis pattern)
# and the regex machinery does the real work.
_MOJI_MARKS = "Ã© â€™ ï¿½"
_MOJI_RE = "(Ã[-¿]|â€|�)"


@register(
    "text_mojibake_detect",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN doc_id % 13 = 0
                  THEN text || ' {_MOJI_MARKS}'
                  WHEN doc_id % 13 = 1
                  THEN text || ' â€œqâ€'
                  ELSE text END AS s
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(s, '{_MOJI_RE}')) AS BIGINT)
             AS n_markers,
           (len(regexp_extract_all(s, '{_MOJI_RE}')) >= 2)
             AS is_mojibake
    FROM t
    """,
    doc="Mojibake (double-encoded UTF-8) detection: count the classic "
    "corruption signatures — 'A-tilde + continuation byte' pairs, "
    "'a-circumflex + euro' sequences (cp1252-decoded curly "
    "punctuation), and U+FFFD replacement chars — and gate docs with "
    ">= 2 markers. Corruption is planted deterministically on the "
    "clean fixture corpus (both engines, doc_id-keyed) so the regex "
    "detection machinery is what's being verified. One regexp_extract_"
    "all per row, map-only, zero shuffle at any scale.",
)
def text_mojibake_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    s = (
        F.when(
            F.col("doc_id") % 13 == 0,
            F.concat(F.col("text"), F.lit(" " + _MOJI_MARKS)),
        )
        .when(
            F.col("doc_id") % 13 == 1,
            F.concat(
                F.col("text"),
                F.lit(" â€œqâ€"),
            ),
        )
        .otherwise(F.col("text"))
    )
    n = F.size(F.regexp_extract_all(s, F.lit(_MOJI_RE)))
    return d.select(
        "doc_id",
        n.cast("bigint").alias("n_markers"),
        (n >= 2).alias("is_mojibake"),
    )
