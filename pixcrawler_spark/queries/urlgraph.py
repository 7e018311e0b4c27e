"""URL canonicalization and link-graph rank — the frontier-key and
page-quality primitives a web-scale crawl feeds a training-data
pipeline.

- ``crawl_url_canonicalize``: canonical frontier keys. The reference
  keys its seen set on raw URL strings (and its image dedup on
  content); at 10^10 urls the frontier needs a canonical key or the
  same resource enqueues many times. Declared canonical form
  (RFC 3986 normalization subset + tracker stripping): scheme and
  host lowercased, default port dropped (http:80 / https:443),
  fragment dropped, ``utm_*`` params dropped, remaining query params
  sorted, trailing ``?`` removed. Implemented as a GENERAL JVM-side
  parser (regexp piece-wise split + array_sort rebuild) and verified
  oracle-by-construction: messy URLs are synthesized in four variants
  from ``o_orderkey`` and the DuckDB oracle derives the expected
  canonical string arithmetically — Spark must earn it through the
  real parser.
- ``graph_domain_rank``: simplified PageRank over a domain link graph
  (the CommonCrawl-rank-style quality signal used to filter webtext
  corpora). Declared semantics (identical in both engines): nodes =
  src ∪ dst of the distinct edge set; r0 = 1/|N|;
  r_{k+1}(v) = (1-d)/|N| + d * Σ_{(u,v)∈E} r_k(u)/outdeg(u); d = 0.85;
  3 iterations; dangling nodes keep the base term only (no dangling-
  mass redistribution — declared simplification, same both sides).
  Spark builds the iteration by unrolling joins (each iteration is
  one edges⋈ranks join + one dst-keyed aggregate — at 10^11 edges
  each is a bounded-key shuffle; the node list co-partitions across
  iterations). The oracle unrolls the same three iterations as CTEs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pixcrawler_spark.queries.registry import register
from pixcrawler_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# crawl_url_canonicalize
# ---------------------------------------------------------------------------


def _synth_url(k: Column) -> Column:
    ks = k.cast("string")
    h = (k % 50).cast("string")
    v = k % 4
    return (
        F.when(v == 0, F.concat(
            F.lit("HTTP://WWW.Shop"), h, F.lit(".COM:80/items/"), ks,
            F.lit("?b="), (k % 7).cast("string"),
            F.lit("&a=1&utm_source=x#sec"), ks,
        ))
        .when(v == 1, F.concat(
            F.lit("https://shop"), h, F.lit(".com:443/p/"), ks,
            F.lit("?z=9&y=8"),
        ))
        .when(v == 2, F.concat(
            F.lit("http://Shop"), h, F.lit(".com/plain/"), ks,
            F.lit("?utm_campaign=c"),
        ))
        .otherwise(F.concat(F.lit("http://shop"), h, F.lit(".com/ok/"), ks))
    )


def canonicalize_url_expr(url: Column) -> Column:
    """General URL canonicalizer (JVM regexp ops only): lowercase
    scheme+host, drop default port / fragment / utm_* params, sort the
    remaining query params, drop a then-empty ``?``. Path case is
    preserved (paths are case-sensitive; hosts are not)."""
    scheme = F.lower(
        F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1)
    )
    rest = F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    nofrag = F.regexp_replace(rest, r"#.*$", "")
    hostport = F.lower(F.regexp_extract(nofrag, r"^([^/?]+)", 1))
    host = F.regexp_replace(hostport, r":[0-9]+$", "")
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    default = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == "")
    )
    authority = F.when(default, host).otherwise(
        F.concat(host, F.lit(":"), port)
    )
    pathquery = F.regexp_replace(nofrag, r"^[^/?]+", "")
    path = F.regexp_extract(pathquery, r"^([^?]*)", 1)
    query = F.regexp_extract(pathquery, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.startswith("utm_"),
        )
    )
    qtail = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(params, "&")),
    ).otherwise(F.lit(""))
    # totality on untrusted input: canonicalization is defined for
    # absolute URLs only — anything without a scheme passes through
    # unchanged (building '://'+host for schemeless text would emit
    # malformed keys and break idempotence; fuzz-tested)
    return F.when(
        scheme == "", url
    ).otherwise(F.concat(scheme, F.lit("://"), authority, path, qtail))


@register(
    "crawl_url_canonicalize",
    oracle="""
    SELECT o_orderkey AS okey,
      CASE o_orderkey % 4
        WHEN 0 THEN 'HTTP://WWW.Shop' || CAST(o_orderkey % 50 AS VARCHAR)
          || '.COM:80/items/' || CAST(o_orderkey AS VARCHAR)
          || '?b=' || CAST(o_orderkey % 7 AS VARCHAR)
          || '&a=1&utm_source=x#sec' || CAST(o_orderkey AS VARCHAR)
        WHEN 1 THEN 'https://shop' || CAST(o_orderkey % 50 AS VARCHAR)
          || '.com:443/p/' || CAST(o_orderkey AS VARCHAR) || '?z=9&y=8'
        WHEN 2 THEN 'http://Shop' || CAST(o_orderkey % 50 AS VARCHAR)
          || '.com/plain/' || CAST(o_orderkey AS VARCHAR) || '?utm_campaign=c'
        ELSE 'http://shop' || CAST(o_orderkey % 50 AS VARCHAR)
          || '.com/ok/' || CAST(o_orderkey AS VARCHAR)
      END AS url,
      CASE o_orderkey % 4
        WHEN 0 THEN 'http://www.shop' || CAST(o_orderkey % 50 AS VARCHAR)
          || '.com/items/' || CAST(o_orderkey AS VARCHAR)
          || '?a=1&b=' || CAST(o_orderkey % 7 AS VARCHAR)
        WHEN 1 THEN 'https://shop' || CAST(o_orderkey % 50 AS VARCHAR)
          || '.com/p/' || CAST(o_orderkey AS VARCHAR) || '?y=8&z=9'
        WHEN 2 THEN 'http://shop' || CAST(o_orderkey % 50 AS VARCHAR)
          || '.com/plain/' || CAST(o_orderkey AS VARCHAR)
        ELSE 'http://shop' || CAST(o_orderkey % 50 AS VARCHAR)
          || '.com/ok/' || CAST(o_orderkey AS VARCHAR)
      END AS canonical_url
    FROM orders
    """,
    doc="Canonical frontier keys: RFC 3986 normalization subset "
    "(lowercase scheme/host, default-port/fragment/utm strip, sorted "
    "query) via a general JVM regexp parser; oracle-by-construction "
    "over 4 synthesized messy-URL variants.",
)
def crawl_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    url = _synth_url(F.col("o_orderkey"))
    return o.select(
        F.col("o_orderkey").alias("okey"),
        url.alias("url"),
        canonicalize_url_expr(url).alias("canonical_url"),
    )


# ---------------------------------------------------------------------------
# graph_domain_rank
# ---------------------------------------------------------------------------
DAMPING = 0.85
N_ITER = 3

_SQL_RANK = f"""
    WITH edges AS (
      SELECT DISTINCT CAST(user_id % 30 AS BIGINT) AS src,
                      CAST(event_id % 29 AS BIGINT) AS dst
      FROM events WHERE user_id % 30 <> event_id % 29
    ),
    nodes AS (
      SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    deg AS (
      SELECT src, CAST(count(*) AS DOUBLE) AS outdeg FROM edges GROUP BY src
    ),
    r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes, nn),
    {{iters}}
    SELECT node AS domain, round(rank, 6) AS rank
    FROM r{N_ITER}
"""

_SQL_ITER = """
    r{k} AS (
      SELECT nodes.node,
             (1 - {d}) / nn.n
             + {d} * COALESCE(s{k}.contrib, 0) AS rank
      FROM nodes CROSS JOIN nn
      LEFT JOIN (
        SELECT e.dst AS node, sum(r.rank / deg.outdeg) AS contrib
        FROM edges e
        JOIN r{prev} r ON r.node = e.src
        JOIN deg ON deg.src = e.src
        GROUP BY e.dst
      ) s{k} ON s{k}.node = nodes.node
    )"""


def _rank_oracle() -> str:
    iters = ",".join(
        _SQL_ITER.format(k=k, prev=k - 1, d=DAMPING)
        for k in range(1, N_ITER + 1)
    )
    return _SQL_RANK.format(iters=iters)


@register(
    "graph_domain_rank",
    oracle=_rank_oracle(),
    doc="Simplified PageRank (3 unrolled iterations, d=0.85, no "
    "dangling-mass redistribution — declared identically in both "
    "engines) over a deterministic domain link graph from events. "
    "Each iteration is one src-keyed join + one dst-keyed aggregate; "
    "at web scale both shuffles key on bounded-degree ids and the "
    "static edge/deg tables can be bucketed once and reused.",
)
def graph_domain_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    edges = (
        ev.select(
            (F.col("user_id") % 30).cast("long").alias("src"),
            (F.col("event_id") % 29).cast("long").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    # the graph is iterated three times: evaluate it once
    edges = edges.persist()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # scalar (|domains|, never data-sized)
    deg = edges.groupBy("src").agg(
        F.count("*").cast("double").alias("outdeg")
    )
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(N_ITER):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("contrib"))
        )
        ranks = nodes.join(
            contrib, nodes.node == contrib.dst, "left"
        ).select(
            "node",
            (
                F.lit((1 - DAMPING) / n)
                + F.lit(DAMPING) * F.coalesce(F.col("contrib"), F.lit(0.0))
            ).alias("rank"),
        )
    return ranks.select(
        F.col("node").alias("domain"), F.round("rank", 6).alias("rank")
    )


# ---------------------------------------------------------------------------
# graph_hits_scores — hubs & authorities (Kleinberg HITS), 2 iterations
# ---------------------------------------------------------------------------
# The complementary quality signal to graph_domain_rank's PageRank:
# authorities (linked-to by good hubs) identify content pages worth
# keeping in a webtext corpus, hubs (linking to good authorities)
# identify directory/aggregator pages worth crawling but often NOT
# worth keeping. Same declared edge set as graph_domain_rank. Declared
# semantics, identical both sides: h0 = 1 for every node;
# a_{k+1}(v) = sum over in-neighbors u of h_k(u);
# h_{k+1}(v) = sum over out-neighbors w of a_{k+1}(w); 2 iterations,
# UNNORMALIZED — every score stays an exact integer, so the
# cross-engine comparison is hash-exact with no float declaration.
# (Production normalizes per iteration; the RANKING is what the
# pipeline consumes and it is scale-invariant.) Each iteration is one
# edges-to-scores join + one bounded-key aggregate — the identical
# shuffle shape to the PageRank unroll, O(|E|) per step.
_SQL_HITS = """
    WITH edges AS (
      SELECT DISTINCT CAST(user_id % 30 AS BIGINT) AS src,
                      CAST(event_id % 29 AS BIGINT) AS dst
      FROM events WHERE user_id % 30 <> event_id % 29
    ),
    nodes AS (
      SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ),
    a1 AS (  -- auth_1 = indegree (h0 = 1)
      SELECT dst AS node, COUNT(*)::BIGINT AS a FROM edges GROUP BY dst
    ),
    h1 AS (  -- hub_1(v) = sum of a1 over out-neighbors
      SELECT e.src AS node, SUM(a1.a)::BIGINT AS h
      FROM edges e JOIN a1 ON e.dst = a1.node GROUP BY e.src
    ),
    a2 AS (  -- auth_2(v) = sum of h1 over in-neighbors
      SELECT e.dst AS node, SUM(h1.h)::BIGINT AS a
      FROM edges e JOIN h1 ON e.src = h1.node GROUP BY e.dst
    ),
    h2 AS (  -- hub_2(v) = sum of a2 over out-neighbors
      SELECT e.src AS node, SUM(a2.a)::BIGINT AS h
      FROM edges e JOIN a2 ON e.dst = a2.node GROUP BY e.src
    )
    SELECT n.node,
           COALESCE(a2.a, 0)::BIGINT AS authority,
           COALESCE(h2.h, 0)::BIGINT AS hub
    FROM nodes n
    LEFT JOIN a2 ON n.node = a2.node
    LEFT JOIN h2 ON n.node = h2.node
"""


@register(
    "graph_hits_scores",
    oracle=_SQL_HITS,
    doc="Kleinberg HITS hubs/authorities over the link graph, 2 "
    "unrolled iterations in exact integer arithmetic (unnormalized — "
    "the consumed ranking is scale-invariant, and integers make the "
    "oracle hash-exact). Authorities flag keepable content pages, "
    "hubs flag crawl-worthy directory pages. One edges-to-scores "
    "join + one bounded-key aggregate per iteration, the same "
    "O(|E|)-shuffle shape as the PageRank unroll.",
)
def graph_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    edges = (
        ev.select(
            (F.col("user_id") % 30).cast("bigint").alias("src"),
            (F.col("event_id") % 29).cast("bigint").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .persist()  # four joins below; registry wrapper clears cache
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    a1 = edges.groupBy("dst").agg(F.count(F.lit(1)).cast("bigint").alias("a"))
    h1 = (
        edges.join(a1, "dst")
        .groupBy("src")
        .agg(F.sum("a").cast("bigint").alias("h"))
    )
    a2 = (
        edges.join(h1, "src")
        .groupBy("dst")
        .agg(F.sum("h").cast("bigint").alias("a"))
    )
    h2 = (
        edges.join(a2, "dst")
        .groupBy("src")
        .agg(F.sum("a").cast("bigint").alias("h"))
    )
    return (
        nodes.join(a2.withColumnRenamed("dst", "node"), "node", "left")
        .join(h2.withColumnRenamed("src", "node"), "node", "left")
        .select(
            "node",
            F.coalesce("a", F.lit(0)).cast("bigint").alias("authority"),
            F.coalesce("h", F.lit(0)).cast("bigint").alias("hub"),
        )
    )


# ---------------------------------------------------------------------------
# graph_opic_cash — OPIC (On-line Page Importance Computation), 2 rounds
# ---------------------------------------------------------------------------
# Abiteboul/Preda/Cobena 2003: the crawl-ORDERING importance measure.
# Each page holds cash; visiting distributes cash/outdeg to its
# out-neighbors and banks the spent cash as history; dangling pages
# return their cash to every page via the virtual root. Unlike
# PageRank (graph_domain_rank) it is designed to run ONLINE while the
# crawl proceeds — "crawl the page holding the most cash next" — and
# needs no damping or convergence; unlike HITS it conserves total cash
# exactly (asserted: sum(cash) = N, sum(history) = 2N after 2 rounds,
# importance sums to 1). Synchronous-round formulation, 2 unrolled
# iterations, declared edge fixture with planted DANGLING nodes
# (src % 11 == 0 emits nothing) so the virtual-root path is exercised.
# Per round: one edges⋈cash join + one bounded-key agg (O(|E|)
# shuffle) + a 1-row dangling scalar joined as a broadcast literal —
# the same plan shape at 10^9 edges. Floats rounded to 6 both sides.
_SQL_OPIC = """
    WITH edges AS (
      SELECT DISTINCT CAST(user_id % 37 AS BIGINT) AS src,
                      CAST((event_id * 7) % 31 AS BIGINT) AS dst
      FROM events
      WHERE user_id % 37 <> (event_id * 7) % 31
        AND user_id % 37 % 11 <> 0
        AND (user_id + event_id) % 5 < 3
    ),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    outdeg AS (
      SELECT src AS node, CAST(COUNT(*) AS DOUBLE) AS deg
      FROM edges GROUP BY src
    ),
    d0 AS (
      SELECT CAST(COALESCE(COUNT(*), 0) AS DOUBLE) AS d
      FROM nodes LEFT JOIN outdeg USING (node) WHERE deg IS NULL
    ),
    inflow1 AS (
      SELECT e.dst AS node, SUM(1.0 / o.deg) AS infl
      FROM edges e JOIN outdeg o ON e.src = o.node GROUP BY e.dst
    ),
    c1 AS (
      SELECT n.node,
             COALESCE(i.infl, 0)
               + (SELECT d FROM d0) / (SELECT n FROM nn) AS c
      FROM nodes n LEFT JOIN inflow1 i USING (node)
    ),
    d1 AS (
      SELECT CAST(COALESCE(SUM(c1.c), 0) AS DOUBLE) AS d
      FROM c1 LEFT JOIN outdeg USING (node) WHERE outdeg.deg IS NULL
    ),
    inflow2 AS (
      SELECT e.dst AS node, SUM(c1.c / o.deg) AS infl
      FROM edges e JOIN outdeg o ON e.src = o.node
      JOIN c1 ON e.src = c1.node GROUP BY e.dst
    ),
    c2 AS (
      SELECT n.node,
             COALESCE(i.infl, 0)
               + (SELECT d FROM d1) / (SELECT n FROM nn) AS c
      FROM nodes n LEFT JOIN inflow2 i USING (node)
    )
    SELECT c2.node AS node,
           round(c2.c, 6) AS cash,
           round(1.0 + c1.c, 6) AS history,
           round((1.0 + c1.c + c2.c) / (3.0 * (SELECT n FROM nn)), 6)
             AS importance
    FROM c2 JOIN c1 USING (node)
"""


@register(
    "graph_opic_cash",
    oracle=_SQL_OPIC,
    doc="OPIC cash/history importance (Abiteboul et al. 2003) over a "
    "declared link graph with planted dangling nodes — the online "
    "crawl-ordering companion to graph_domain_rank (PageRank) and "
    "graph_hits_scores (HITS). Two synchronous rounds, virtual-root "
    "redistribution of dangling cash; cash conservation asserted in "
    "tests/test_urlgraph.py.",
)
def graph_opic_cash(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    src = (F.col("user_id") % 37).cast("bigint")
    dst = ((F.col("event_id") * 7) % 31).cast("bigint")
    edges = (
        ev.select(src.alias("src"), dst.alias("dst"))
        .where(
            (F.col("src") != F.col("dst"))
            & (F.col("src") % 11 != 0)
            & ((F.col("user_id") + F.col("event_id")) % 5 < 3)
        )
        .dropDuplicates(["src", "dst"])
        .persist()  # reused by outdeg + both rounds; registry clears
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("double").alias("deg")
    )
    # 1-row dims: node count and per-round dangling cash. At any graph
    # size these stay single rows — Spark broadcasts them; no
    # data-sized build side.
    nn = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    with_deg = nodes.join(outdeg, "node", "left")
    d0 = with_deg.where(F.col("deg").isNull()).agg(
        F.coalesce(F.count(F.lit(1)).cast("double"), F.lit(0.0)).alias("d")
    )
    inflow1 = (
        edges.join(outdeg.withColumnRenamed("node", "src"), "src")
        .groupBy(F.col("dst").alias("node"))
        .agg(F.sum(F.lit(1.0) / F.col("deg")).alias("infl"))
    )
    c1 = (
        nodes.join(inflow1, "node", "left")
        .crossJoin(F.broadcast(d0))
        .crossJoin(F.broadcast(nn))
        .select(
            "node",
            (F.coalesce("infl", F.lit(0.0)) + F.col("d") / F.col("n"))
            .alias("c"),
        )
    )
    d1 = (
        c1.join(outdeg, "node", "left")
        .where(F.col("deg").isNull())
        .agg(F.coalesce(F.sum("c"), F.lit(0.0)).cast("double").alias("d"))
    )
    inflow2 = (
        edges.join(outdeg.withColumnRenamed("node", "src"), "src")
        .join(c1.withColumnRenamed("node", "src"), "src")
        .groupBy(F.col("dst").alias("node"))
        .agg(F.sum(F.col("c") / F.col("deg")).alias("infl"))
    )
    c2 = (
        nodes.join(inflow2, "node", "left")
        .crossJoin(F.broadcast(d1))
        .crossJoin(F.broadcast(nn))
        .select(
            "node",
            (F.coalesce("infl", F.lit(0.0)) + F.col("d") / F.col("n"))
            .alias("c2"),
            F.col("n"),
        )
    )
    return (
        c2.join(c1, "node")
        .select(
            "node",
            F.round("c2", 6).alias("cash"),
            F.round(F.lit(1.0) + F.col("c"), 6).alias("history"),
            F.round(
                (F.lit(1.0) + F.col("c") + F.col("c2"))
                / (F.lit(3.0) * F.col("n")),
                6,
            ).alias("importance"),
        )
    )
