"""Round-5 second batch: URL template mining, k-core decomposition,
exact heavy hitters with Misra-Gries candidate pruning, robust
latency anomaly detection, and positional-index phrase search.

Five more operators a web-scale crawl/corpus pipeline runs that the
engine did not yet cover:

- ``crawl_url_template_mining``: cluster URLs by path TEMPLATE
  (digit runs -> ``{n}``, long hex runs -> ``{h}``) and flag
  templates that expand into large parameterized URL spaces — the
  structural complement to per-URL trap signals
  (crawl_trap_detection): a template with thousands of instantiations
  is a crawl space to budget, not a set of independent pages.
- ``graph_kcore``: bounded k-core peeling over the domain link graph
  — iteratively remove nodes of degree < k; what survives is the
  densely connected core (spam-cluster / canonical-hub signal that
  degree alone misses, since degree counts leaf fans too).
- ``sketch_spacesaving_topk``: EXACT heavy hitters (count >
  N/(k+1)) via two phases — per-partition Misra-Gries summaries
  produce a small candidate superset (pigeonhole: any global heavy
  hitter is a local one somewhere), then one exact count pass over
  ONLY the candidates. The full key space is never shuffled.
- ``crawl_latency_anomaly``: per-host robust outlier stats —
  median + MAD (median absolute deviation), flagging fetches beyond
  ~3 sigma-equivalents (3 x 1.4826 x MAD). Mean/stddev break on the
  heavy-tailed latency distributions crawlers actually see; the
  median/MAD pair does not.
- ``text_phrase_postings``: exact phrase search through a positional
  inverted index — posting lists (doc, position) per term, phrase
  match as an equi-join on (doc, pos+1). The primitive behind
  quoted-query search and n-gram decontamination at index scale.

Reference analogs: builder/core's URL handling treats every URL as
opaque (no template/space awareness, validator/integrity.py hashes
whole files only); the reference has no graph, no heavy-hitter, no
robust-stats, and no index primitives at all — these are the
operations its architecture could not express at scale.

Scale design (100 TB / 1000 executors):
- template mining: normalization is a map-only regexp chain
  (whole-stage codegen); the only shuffle is a groupBy on (domain,
  template) — low cardinality BY CONSTRUCTION, since templating is
  exactly the operation that collapses the URL space.
- k-core: each peel round is one O(E) degree aggregation + one
  semi-join against the shrinking survivor set; rounds are BOUNDED
  (same contract as dedup_connected_components / LPA), and each
  round's edge set is localCheckpoint'ed — every iteration branches
  the previous plan ~5 ways, so persist alone still nests the
  LOGICAL plan ~5^rounds deep; checkpointing keeps it O(1)/round.
- space-saving: phase 1 is Arrow mapInPandas with O(k) state per
  partition (value_counts per batch, mergeable-summary decrement on
  overflow — Agarwal et al., mergeable summaries); candidates <=
  partitions x k rows, broadcast back; phase 2 counts ONLY rows
  matching candidates (left-semi before the groupBy), so a
  power-law key space costs a broadcast probe, not a full-key
  shuffle.
- latency anomaly: two groupBys on the SAME host key (one exchange
  reused by AQE); the per-host stat dims are broadcast back, never
  shuffling the event side twice.
- phrase postings: the index build is a map-side explode; the term
  filters (w1/w2) push below the exchange, so the phrase join
  shuffles only the two posting lists involved — the standard
  distributed phrase-AND, rare-term-first.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pixcrawler_spark.queries.registry import register
from pixcrawler_spark.sources.tables import load_table

__all__: list[str] = []


# ---------------------------------------------------------------------------
# crawl_url_template_mining — parameterized URL-space discovery
# ---------------------------------------------------------------------------
TEMPLATE_SPACE_MIN = 25  # instantiations before a template is a "space"

# normalization order matters and is shared verbatim by both engines:
# long hex runs first (session tokens; a >=8-digit pure-numeric run is
# also hex and becomes {h} — same on both sides), then digit runs.
_HEX_RUN = "[0-9a-f]{8,}"
_DIGIT_RUN = "[0-9]+"


@register(
    "crawl_url_template_mining",
    oracle=f"""
    WITH u AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 4 = 0
                  THEN 'https://shop' || CAST(o_orderkey % 20 AS VARCHAR)
                       || '.example.com/product/'
                       || CAST(o_orderkey AS VARCHAR) || '/view'
                  WHEN o_orderkey % 4 = 1
                  THEN 'https://shop' || CAST(o_orderkey % 20 AS VARCHAR)
                       || '.example.com/session/'
                       || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 12)
                       || '/cart'
                  WHEN o_orderkey % 4 = 2
                  THEN 'https://blog' || CAST(o_orderkey % 5 AS VARCHAR)
                       || '.example.org/2024/'
                       || CAST(1 + o_orderkey % 12 AS VARCHAR)
                       || '/post-' || CAST(o_orderkey AS VARCHAR)
                  ELSE 'https://shop' || CAST(o_orderkey % 20 AS VARCHAR)
                       || '.example.com/about'
             END AS url
      FROM orders
    ),
    parts AS (
      SELECT url,
             regexp_extract(url, '^[a-z]+://([^/?]+)', 1) AS domain,
             regexp_extract(url, '^[a-z]+://[^/?]*([^?]*)', 1) AS path
      FROM u
    ),
    tpl AS (
      SELECT domain,
             regexp_replace(
               regexp_replace(path, '{_HEX_RUN}', '(h)', 'g'),
               '{_DIGIT_RUN}', '(n)', 'g') AS template,
             url
      FROM parts
    )
    SELECT domain, template,
           CAST(count(DISTINCT url) AS BIGINT) AS n_urls,
           (count(DISTINCT url) >= {TEMPLATE_SPACE_MIN}
            AND template LIKE '%(%') AS is_crawl_space
    FROM tpl
    GROUP BY domain, template
    """,
    doc="URL template mining: normalize paths (hex runs -> (h), digit "
    f"runs -> (n)), group by (domain, template), and flag templates "
    f"with >= {TEMPLATE_SPACE_MIN} distinct instantiations as "
    "parameterized crawl spaces — the budget unit for infinite-space "
    "avoidance. Map-only codegen regexp chain; the one groupBy keys "
    "on a LOW-cardinality pair by construction (templating collapses "
    "the URL space), so partial aggregation absorbs nearly all rows "
    "map-side at any scale.",
)
def crawl_url_template_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    ks = k.cast("string")
    url = (
        F.when(
            k % 4 == 0,
            F.concat(
                F.lit("https://shop"), (k % 20).cast("string"),
                F.lit(".example.com/product/"), ks, F.lit("/view"),
            ),
        )
        .when(
            k % 4 == 1,
            F.concat(
                F.lit("https://shop"), (k % 20).cast("string"),
                F.lit(".example.com/session/"),
                F.substring(F.md5(ks), 1, 12), F.lit("/cart"),
            ),
        )
        .when(
            k % 4 == 2,
            F.concat(
                F.lit("https://blog"), (k % 5).cast("string"),
                F.lit(".example.org/2024/"),
                (1 + k % 12).cast("string"),
                F.lit("/post-"), ks,
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://shop"), (k % 20).cast("string"),
                F.lit(".example.com/about"),
            )
        )
    )
    u = o.select(url.alias("url"))
    domain = F.regexp_extract(F.col("url"), r"^[a-z]+://([^/?]+)", 1)
    path = F.regexp_extract(F.col("url"), r"^[a-z]+://[^/?]*([^?]*)", 1)
    template = F.regexp_replace(
        F.regexp_replace(path, _HEX_RUN, "(h)"), _DIGIT_RUN, "(n)"
    )
    return (
        u.select(
            domain.alias("domain"),
            template.alias("template"),
            F.col("url"),
        )
        .groupBy("domain", "template")
        .agg(F.countDistinct("url").cast("bigint").alias("n_urls"))
        .select(
            "domain",
            "template",
            "n_urls",
            (
                (F.col("n_urls") >= TEMPLATE_SPACE_MIN)
                & F.col("template").contains("(")
            ).alias("is_crawl_space"),
        )
    )


# ---------------------------------------------------------------------------
# graph_kcore — bounded k-core peeling (dense-core extraction)
# ---------------------------------------------------------------------------
KCORE_K = 3
KCORE_ROUNDS = 6  # bounded peel rounds (same contract as CC / LPA)
_KC_SRC = 101  # denser moduli than the triangle graph: peeling needs
_KC_DST = 97  # average degree near k to be non-trivial at every sf


def _kcore_oracle() -> str:
    """Unrolled bounded-peel CTE chain (DuckDB side of the contract).

    Round i: degrees over edge set e{i}, survivors s{i+1} = nodes with
    degree >= k, e{i+1} = edges with BOTH endpoints surviving. After
    KCORE_ROUNDS rounds, in_core = membership in the last survivor
    set, core_degree = degree within the last edge set.

    Every CTE is MATERIALIZED: DuckDB inlines plain CTEs, and each
    round references the previous edge set ~5 ways, so inlining
    expands the unrolled chain to 5^rounds scans of the base table —
    the exact lineage explosion the Spark side localCheckpoints away.
    """
    parts = [
        f"""
    e0 AS MATERIALIZED (
      SELECT DISTINCT
        CAST(least(user_id % {_KC_SRC}, event_id % {_KC_DST}) AS BIGINT) AS lo,
        CAST(greatest(user_id % {_KC_SRC}, event_id % {_KC_DST}) AS BIGINT) AS hi
      FROM events
      WHERE user_id % {_KC_SRC} <> event_id % {_KC_DST}
    ),
    d0 AS MATERIALIZED (
      SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
        SELECT lo AS node FROM e0 UNION ALL SELECT hi AS node FROM e0
      ) GROUP BY node
    )"""
    ]
    for i in range(KCORE_ROUNDS):
        parts.append(
            f"""
    s{i + 1} AS MATERIALIZED (SELECT node FROM d{i} WHERE deg >= {KCORE_K}),
    e{i + 1} AS MATERIALIZED (
      SELECT e.lo, e.hi FROM e{i} e
      JOIN s{i + 1} a ON e.lo = a.node
      JOIN s{i + 1} b ON e.hi = b.node
    ),
    d{i + 1} AS MATERIALIZED (
      SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
        SELECT lo AS node FROM e{i + 1}
        UNION ALL SELECT hi AS node FROM e{i + 1}
      ) GROUP BY node
    )"""
        )
    r = KCORE_ROUNDS
    return (
        "WITH "
        + ",".join(parts)
        + f"""
    SELECT d0.node AS domain, d0.deg AS degree,
           (d0.node IN (SELECT node FROM s{r})) AS in_core,
           CAST(COALESCE(dr.deg, 0) AS BIGINT) AS core_degree
    FROM d0 LEFT JOIN d{r} dr ON dr.node = d0.node
    """
    )


@register(
    "graph_kcore",
    oracle=_kcore_oracle(),
    doc=f"Bounded {KCORE_K}-core peeling ({KCORE_ROUNDS} rounds) over "
    "the domain link graph: iteratively drop nodes of degree < k; the "
    "surviving core is the dense-cluster signal (link farms, canonical "
    "hub nets) that raw degree misses because leaf fans inflate it. "
    "Each round is one O(E) degree agg + one semi-join against the "
    "shrinking survivor set, edge set localCheckpoint'ed per round "
    "(each iteration branches the prior plan ~5 ways, so persist "
    "alone still nests the logical plan exponentially — the CC "
    "lineage lesson, one step further); rounds are bounded by "
    "contract, like dedup_connected_components, so the plan size is "
    "fixed regardless of data scale.",
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = (F.col("user_id") % _KC_SRC).cast("long")
    v = (F.col("event_id") % _KC_DST).cast("long")
    # localCheckpoint per round: each iteration references the previous
    # edge set through MULTIPLE branches (two degree legs + two
    # semi-join probes), so a persist alone still nests the logical
    # plan ~5x per round — 5^6 plan copies by round 6 blew the driver
    # heap just BUILDING the tree string. Checkpointing truncates the
    # lineage to the materialized partitions, keeping the plan O(1)
    # per round (the CC exponential-lineage lesson, one step further).
    edges = (
        ev.select(F.least(u, v).alias("lo"), F.greatest(u, v).alias("hi"))
        .where(F.col("lo") != F.col("hi"))
        .distinct()
        .localCheckpoint()
    )

    def degrees(e: DataFrame) -> DataFrame:
        return (
            e.select(F.col("lo").alias("node"))
            .unionAll(e.select(F.col("hi").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
        )

    d0 = degrees(edges).persist()
    cur_edges = edges
    cur_deg = d0
    survivors = None
    for _ in range(KCORE_ROUNDS):
        survivors = (
            cur_deg.where(F.col("deg") >= KCORE_K)
            .select("node")
            .localCheckpoint()
        )
        cur_edges = (
            cur_edges.join(
                survivors.withColumnRenamed("node", "lo"), "lo", "left_semi"
            )
            .join(
                survivors.withColumnRenamed("node", "hi"), "hi", "left_semi"
            )
            .select("lo", "hi")
            .localCheckpoint()
        )
        cur_deg = degrees(cur_edges)
    final_deg = cur_deg.withColumnRenamed("deg", "core_deg")
    final_survivors = survivors.withColumn("in_s", F.lit(True))
    return (
        d0.join(final_survivors, "node", "left")
        .join(final_deg, "node", "left")
        .select(
            F.col("node").alias("domain"),
            F.col("deg").alias("degree"),
            F.coalesce(F.col("in_s"), F.lit(False)).alias("in_core"),
            F.coalesce(F.col("core_deg"), F.lit(0))
            .cast("bigint")
            .alias("core_degree"),
        )
    )


# ---------------------------------------------------------------------------
# sketch_spacesaving_topk — exact heavy hitters via MG candidate pruning
# ---------------------------------------------------------------------------
MG_COUNTERS = 24  # per-partition summary size; output = items with
#                   count > N / (MG_COUNTERS + 1), exactly

# deterministic skew: half the fetches land on 3 hot hosts, the other
# half spread over 997 cold ones — the power-law shape heavy-hitter
# detection exists for.
_HH_HOST_SQL = (
    "'h' || CAST(CASE WHEN event_id % 2 = 0 THEN user_id % 3 "
    "ELSE 3 + (user_id % 997) END AS VARCHAR)"
)


def _mg_candidates(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-partition Misra-Gries summary over the ``host`` column.

    Batch-vectorized: exact value_counts per Arrow batch, then a
    mergeable-summary decrement when the counter table overflows
    (subtract the (k+1)-th largest count from all, drop <= 0) —
    Agarwal et al.'s merge rule, which preserves the guarantee that
    any item with partition count > n_p/(k+1) survives. Emits the
    candidate keys (cnt 0) plus ONE sentinel row (host NULL, cnt =
    partition row count) so the global N comes from summing this tiny
    output instead of a third scan of the base table; exact candidate
    counting happens JVM-side afterwards.
    """
    summary: dict[str, int] = {}
    n_rows = 0
    for batch in it:
        if batch.empty:
            continue
        n_rows += len(batch)
        for key, cnt in batch["host"].value_counts().items():
            summary[key] = summary.get(key, 0) + int(cnt)
        if len(summary) > MG_COUNTERS:
            cut = sorted(summary.values(), reverse=True)[MG_COUNTERS]
            summary = {
                k: v - cut for k, v in summary.items() if v - cut > 0
            }
    yield pd.DataFrame(
        {
            "host": list(summary.keys()) + [None],
            "cnt": [0] * len(summary) + [n_rows],
        }
    )


@register(
    "sketch_spacesaving_topk",
    oracle=f"""
    WITH h AS (
      SELECT {_HH_HOST_SQL} AS host FROM events
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM h)
    SELECT host, CAST(count(*) AS BIGINT) AS n_fetches,
           round(count(*) * 1.0 / n_total, 6) AS frac
    FROM h, tot
    GROUP BY host, n_total
    HAVING count(*) * {MG_COUNTERS + 1} > n_total
    """,
    doc="EXACT heavy hitters (hosts with > N/"
    f"{MG_COUNTERS + 1} of all fetches) without shuffling the full "
    "key space: phase 1 builds per-partition Misra-Gries summaries "
    f"({MG_COUNTERS} counters, Arrow mapInPandas, batch-vectorized "
    "value_counts + mergeable-summary decrement) whose union is a "
    "guaranteed candidate SUPERSET (pigeonhole: a global heavy hitter "
    "is a local one in some partition); phase 2 left-semi-joins the "
    "broadcast candidates and exact-counts only those keys. Output is "
    "deterministic — independent of partitioning — because the final "
    "filter uses exact counts; the summary only prunes. The global N "
    "rides along as per-partition sentinel rows in the summary "
    "output (persisted, ~partitions x k rows), so the base table is "
    "scanned exactly TWICE (summary pass + probe pass) — at a "
    "power-law 100 TB key space this replaces a full-key shuffle "
    "with a broadcast probe + a tiny-key aggregation.",
)
def sketch_spacesaving_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    host = F.concat(
        F.lit("h"),
        F.when(F.col("event_id") % 2 == 0, F.col("user_id") % 3)
        .otherwise(3 + (F.col("user_id") % 997))
        .cast("string"),
    )
    hosts = ev.select(host.alias("host"))
    summary = hosts.mapInPandas(
        _mg_candidates, "host string, cnt long"
    ).persist()
    candidates = (
        summary.where(F.col("host").isNotNull()).select("host").distinct()
    )
    total = summary.agg(F.sum("cnt").cast("bigint").alias("n_total"))
    return (
        hosts.join(F.broadcast(candidates), "host", "left_semi")
        .groupBy("host")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_fetches"))
        .crossJoin(F.broadcast(total))
        .where(F.col("n_fetches") * (MG_COUNTERS + 1) > F.col("n_total"))
        .select(
            "host",
            "n_fetches",
            F.round(F.col("n_fetches") / F.col("n_total"), 6).alias("frac"),
        )
    )


# ---------------------------------------------------------------------------
# crawl_latency_anomaly — per-host median/MAD robust outlier stats
# ---------------------------------------------------------------------------
_LAT_HOSTS = 50
# 3 sigma-equivalents under normality: 3 * 1.4826; ONE literal so both
# engines multiply identically (no associativity drift).
_MAD_CUT = 4.4478


@register(
    "crawl_latency_anomaly",
    oracle=f"""
    WITH f AS (
      SELECT 'host' || CAST(user_id % {_LAT_HOSTS} AS VARCHAR) AS host,
             value AS latency
      FROM events
    ),
    med AS (
      SELECT host, median(latency) AS med FROM f GROUP BY host
    ),
    dev AS (
      SELECT f.host, f.latency, med.med,
             abs(f.latency - med.med) AS adev
      FROM f JOIN med ON med.host = f.host
    ),
    mad AS (
      SELECT host, median(adev) AS mad FROM dev GROUP BY host
    )
    SELECT dev.host,
           CAST(count(*) AS BIGINT) AS n_fetches,
           round(any_value(dev.med), 6) AS med_latency,
           round(any_value(mad.mad), 6) AS mad_latency,
           CAST(sum(CASE WHEN dev.adev > {_MAD_CUT} * mad.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
    FROM dev JOIN mad ON mad.host = dev.host
    GROUP BY dev.host
    """,
    doc="Per-host robust fetch-latency outlier stats: median + MAD "
    f"(median absolute deviation), anomaly = deviation > {_MAD_CUT} x "
    "MAD (~3 sigma-equivalents). Mean/stddev are useless on the "
    "heavy-tailed latencies crawlers see (one 30 s timeout drags the "
    "mean past most real outliers); median/MAD have a 50% breakdown "
    "point. ONE scan, ONE exchange: both medians are computed as "
    "unbounded-frame window aggregates over the same host "
    "partitioning, and the final per-host rollup reuses that "
    "partitioning too — the naive agg-then-join formulation re-scans "
    "the event side 4x (22-Exchange plan, measured); this one never "
    "re-reads it.",
)
def crawl_latency_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    f = ev.select(
        F.concat(
            F.lit("host"), (F.col("user_id") % _LAT_HOSTS).cast("string")
        ).alias("host"),
        F.col("value").alias("latency"),
    )
    w = Window.partitionBy("host")
    dev = f.withColumn("med", F.median("latency").over(w)).withColumn(
        "adev", F.abs(F.col("latency") - F.col("med"))
    )
    return (
        dev.withColumn("mad", F.median("adev").over(w))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_fetches"),
            F.round(F.any_value("med"), 6).alias("med_latency"),
            F.round(F.any_value("mad"), 6).alias("mad_latency"),
            F.sum(
                F.when(
                    F.col("adev") > _MAD_CUT * F.col("mad"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_anomalies"),
        )
    )


# ---------------------------------------------------------------------------
# text_phrase_postings — positional inverted index + exact phrase match
# ---------------------------------------------------------------------------
PHRASE_W1 = "batch"
PHRASE_W2 = "stream"


@register(
    "text_phrase_postings",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
      FROM documents
    )
    SELECT doc_id,
           CAST(len(list_filter(range(1, len(toks)),
                i -> toks[i] = '{PHRASE_W1}'
                     AND toks[i + 1] = '{PHRASE_W2}')) AS BIGINT)
             AS n_occurrences
    FROM t
    WHERE len(list_filter(range(1, len(toks)),
          i -> toks[i] = '{PHRASE_W1}'
               AND toks[i + 1] = '{PHRASE_W2}')) > 0
    """,
    doc=f'Exact phrase search ("{PHRASE_W1} {PHRASE_W2}") through a '
    "positional inverted index: posting lists (doc_id, position) per "
    "term via a map-side posexplode, phrase match as an equi-join of "
    "the two terms' postings on (doc_id, pos+1) — the primitive "
    "behind quoted-query search and index-scale n-gram "
    "decontamination. The term filters push BELOW the exchange, so "
    "only the two posting lists involved ever shuffle (rare-term "
    "cost, not corpus cost); the oracle recomputes adjacency with a "
    "per-row list fold — a structurally different algorithm, so "
    "agreement certifies the semantics.",
)
def text_phrase_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    postings = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "pos", "term"
        ),
    )
    p1 = postings.where(F.col("term") == PHRASE_W1).select("doc_id", "pos")
    p2 = postings.where(F.col("term") == PHRASE_W2).select(
        "doc_id", (F.col("pos") - 1).alias("pos")
    )
    return (
        p1.join(p2, ["doc_id", "pos"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_occurrences"))
    )
