"""Round-5 queries: weighted reservoir sampling, triangle counting,
embedding-space benchmark decontamination, and UCB1 bandit
crawl scheduling.

Four operators a web-scale training-data pipeline runs that the
engine did not yet cover:

- ``sample_reservoir_weighted``: one-pass distributed weighted
  sampling WITHOUT replacement (Efraimidis & Spirakis 2006, "A-ES"):
  each doc gets priority u^(1/w) for a deterministic uniform u and
  weight w = token count; the per-language top-K by priority is an
  exact weighted sample. Unlike rate-based Bernoulli sampling
  (sample_corpus_mixture) the output size is EXACTLY K per group.
- ``graph_triangle_count``: per-domain triangle participation +
  clustering coefficient over the link graph — the classic link-farm
  / spam-cluster signal (densely interlinked domain clusters have
  clustering ~1; organic hubs ~0). Degree-ordered edge orientation
  (Suri & Vassilvitskii 2011's MapReduce scheme) bounds wedge fanout
  by O(sqrt(E)) per node, killing the "curse of the last reducer".
- ``text_decontaminate_embedding``: semantic benchmark
  decontamination — flag corpus vectors whose max cosine against a
  broadcast benchmark embedding set crosses a threshold. Complements
  the exact n-gram path (text_decontaminate) the way SemDeDup
  complements MinHash: catches paraphrased/near-verbatim eval
  leakage that token overlap misses.
- ``crawl_bandit_ucb``: UCB1 explore/exploit crawl-budget
  scheduling (Auer et al. 2002) — the principled replacement for the
  reference's static engine rotation: domains are arms, fetches are
  pulls, and under-sampled hosts earn optimism bonuses so the
  scheduler provably bounds regret against the best fixed host mix.

Reference analogs: the duplicate/variation handling of
validator/integrity.py (exact hashing only — no weighted selection,
no graph signal, no semantic similarity) and builder/core's fixed
per-keyword quotas (count-based, not weight-exact).

Scale design (100 TB / 1000 executors):
- reservoir: priorities are a map-only expression (hash + pow); the
  per-group top-K goes through row_number + filter, which Spark
  rewrites to WindowGroupLimit — map-side partial top-K holds O(K)
  state per group per task, so one giant language cannot skew a
  reducer. The sample is a pure function of (doc_id, n_tok), hence
  reproducible across cluster sizes and engines.
- triangles: orientation by the (degree, id) total order makes every
  wedge enumerate at its lowest-order corner; max oriented out-degree
  is O(sqrt(E)) so the wedge join's per-key fanout is bounded even on
  power-law graphs. Edges/degrees are computed once and reused.
- decontamination: the benchmark set (thousands of vectors) collapses
  to ONE collected array, broadcast to every task; the max-cosine is
  a per-row JVM fold — ZERO shuffle over the corpus, no groupBy on
  the big side at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pixcrawler_spark.operators import sketches as sk
from pixcrawler_spark.operators.similarity import _dot, _norm
from pixcrawler_spark.queries.registry import register
from pixcrawler_spark.sources.tables import load_table

__all__: list[str] = []


# ---------------------------------------------------------------------------
# sample_reservoir_weighted — A-ES weighted sampling without replacement
# ---------------------------------------------------------------------------
RSV_K = 20  # exact sample size per language

# deterministic uniform in (0, 1): never 0 (pow(0, x) = 0 would tie
# every zero draw) and never 1 (pow(1, x) = 1 likewise)
_RSV_U_SQL = (
    "((" + sk.sql_h60("'rsv:' || CAST(doc_id AS VARCHAR)")
    + " % 1000000 + 1) / 1000001.0)"
)
_RSV_NTOK_SQL = "len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT"


@register(
    "sample_reservoir_weighted",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lang,
             {_RSV_NTOK_SQL} AS n_tok,
             {_RSV_U_SQL} AS u
      FROM documents
    ),
    keyed AS (
      SELECT doc_id, lang, n_tok,
             pow(u, 1.0 / GREATEST(n_tok, 1)) AS k,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY pow(u, 1.0 / GREATEST(n_tok, 1)) DESC, doc_id
             ) AS rn
      FROM d
    )
    SELECT lang, doc_id, n_tok, round(k, 6) AS rsv_key
    FROM keyed WHERE rn <= {RSV_K}
    """,
    doc=f"Exact-size weighted sample: {RSV_K} docs per language, "
    "inclusion probability proportional to token count, via "
    "Efraimidis-Spirakis exponential-sort priorities u^(1/w) on a "
    "deterministic 60-bit hash uniform. One-pass, map-only priority "
    "compute + WindowGroupLimit top-K (O(K) state per group per "
    "task); the selection is a pure function of the row, so it is "
    "identical at any cluster size.",
)
def sample_reservoir_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    u = (
        (
            sk.h60(F.concat(F.lit("rsv:"), F.col("doc_id").cast("string")))
            % 1000000
            + 1
        )
        / F.lit(1000001.0)
    )
    docs = d.select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
        .cast("bigint")
        .alias("n_tok"),
        u.alias("u"),
    )
    key = F.pow(
        F.col("u"), F.lit(1.0) / F.greatest(F.col("n_tok"), F.lit(1))
    )
    w = Window.partitionBy("lang").orderBy(
        F.desc("k"), F.asc("doc_id")
    )
    return (
        docs.withColumn("k", key)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= RSV_K)
        .select(
            "lang",
            "doc_id",
            "n_tok",
            F.round("k", 6).alias("rsv_key"),
        )
    )


# ---------------------------------------------------------------------------
# graph_triangle_count — link-farm density signal
# ---------------------------------------------------------------------------
_TRI_SRC = 1021  # node-id moduli: big enough that even the sf0.1
_TRI_DST = 1009  # events sample leaves a SPARSE graph (web domain
#                  graphs are power-law sparse; a near-complete graph
#                  would make every wedge close -- the degenerate
#                  worst case, not the workload)

_TRI_EDGES_SQL = f"""
    raw AS (
      SELECT DISTINCT
        CAST(least(user_id % {_TRI_SRC}, event_id % {_TRI_DST}) AS BIGINT) AS lo,
        CAST(greatest(user_id % {_TRI_SRC}, event_id % {_TRI_DST}) AS BIGINT) AS hi
      FROM events
      WHERE user_id % {_TRI_SRC} <> event_id % {_TRI_DST}
    ),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
        SELECT lo AS node FROM raw UNION ALL SELECT hi AS node FROM raw
      ) GROUP BY node
    )
"""


@register(
    "graph_triangle_count",
    oracle=f"""
    WITH {_TRI_EDGES_SQL},
    tri AS (
      SELECT e1.lo AS a, e1.hi AS b, e2.hi AS c
      FROM raw e1
      JOIN raw e2 ON e2.lo = e1.hi
      JOIN raw e3 ON e3.lo = e1.lo AND e3.hi = e2.hi
    ),
    corners AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b AS node FROM tri
      UNION ALL SELECT c AS node FROM tri
    ),
    tc AS (
      SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
      FROM corners GROUP BY node
    )
    SELECT d.node AS domain, d.degree,
           CAST(COALESCE(tc.n_triangles, 0) AS BIGINT) AS n_triangles,
           round(CASE WHEN d.degree >= 2
                 THEN 2.0 * COALESCE(tc.n_triangles, 0)
                      / (d.degree * (d.degree - 1))
                 ELSE 0.0 END, 6) AS clustering
    FROM deg d LEFT JOIN tc ON tc.node = d.node
    """,
    doc="Per-domain triangle count + local clustering coefficient over "
    "the undirected domain link graph — densely interlinked clusters "
    "(link farms) score clustering near 1. Spark enumerates each "
    "triangle exactly once at its lowest corner under a (degree, id) "
    "total-order edge orientation, which caps oriented out-degree at "
    "O(sqrt(E)) so the wedge join's per-key fanout stays bounded on "
    "power-law graphs (Suri & Vassilvitskii 2011); the oracle uses "
    "plain id-orientation — a different enumeration ORDER of the SAME "
    "triangle set, so counts agree.",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = (F.col("user_id") % _TRI_SRC).cast("long")
    v = (F.col("event_id") % _TRI_DST).cast("long")
    und = (
        ev.select(
            F.least(u, v).alias("lo"), F.greatest(u, v).alias("hi")
        )
        .where(F.col("lo") != F.col("hi"))
        .distinct()
        .persist()
    )
    deg = (
        und.select(F.col("lo").alias("node"))
        .unionAll(und.select(F.col("hi").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
        .persist()
    )
    # orient each edge from the (degree, id)-smaller endpoint to the
    # larger; every triangle then has exactly one corner with two
    # outgoing oriented edges (its minimum under the total order)
    dl = deg.select(
        F.col("node").alias("lo"), F.col("degree").alias("dlo")
    )
    dh = deg.select(
        F.col("node").alias("hi"), F.col("degree").alias("dhi")
    )
    lo_first = (F.col("dlo") < F.col("dhi")) | (
        (F.col("dlo") == F.col("dhi")) & (F.col("lo") < F.col("hi"))
    )
    oriented = (
        und.join(F.broadcast(dl), "lo")
        .join(F.broadcast(dh), "hi")
        .select(
            F.when(lo_first, F.col("lo")).otherwise(F.col("hi")).alias("src"),
            F.when(lo_first, F.col("hi")).otherwise(F.col("lo")).alias("dst"),
        )
        .persist()
    )
    # wedges at the lowest-order corner: (src -> b, src -> c); close
    # with the undirected edge {b, c}
    w1 = oriented.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    w2 = oriented.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    wedges = w1.join(w2, "a").where(F.col("b") < F.col("c"))
    closing = und.select(
        F.least("lo", "hi").alias("b"), F.greatest("lo", "hi").alias("c")
    )
    tri = wedges.join(closing, ["b", "c"], "left_semi")
    corners = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    return (
        deg.join(corners, "node", "left")
        .select(
            F.col("node").alias("domain"),
            "degree",
            F.coalesce(F.col("n_triangles"), F.lit(0))
            .cast("bigint")
            .alias("n_triangles"),
            F.round(
                F.when(
                    F.col("degree") >= 2,
                    2.0
                    * F.coalesce(F.col("n_triangles"), F.lit(0))
                    / (F.col("degree") * (F.col("degree") - 1)),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("clustering"),
        )
    )


# ---------------------------------------------------------------------------
# text_decontaminate_embedding — semantic benchmark decontamination
# ---------------------------------------------------------------------------
EMB_DECON_MOD = 67  # vec_id % 67 == 0 -> the "benchmark" eval set
EMB_DECON_TAU = 0.35  # near-random synthetic embeddings: max observed
#                       cross-cosine ~0.45, median ~0.17 (sf0.01 probe)

_EMB_DOT = (
    "list_sum(list_transform(range(len({a})), "
    "i -> CAST({a}[i + 1] AS DOUBLE) * CAST({b}[i + 1] AS DOUBLE)))"
)


def _emb_sql_cos(a: str, b: str) -> str:
    dot = _EMB_DOT.format(a=a, b=b)
    na = f"sqrt({_EMB_DOT.format(a=a, b=a)})"
    nb = f"sqrt({_EMB_DOT.format(a=b, b=b)})"
    return f"({dot} / ({na} * {nb}))"


@register(
    "text_decontaminate_embedding",
    oracle=f"""
    WITH bench AS (
      SELECT embedding AS bvec FROM embeddings
      WHERE vec_id % {EMB_DECON_MOD} = 0
    ),
    scored AS (
      SELECT a.vec_id,
             max({_emb_sql_cos('a.embedding', 'bvec')}) AS m
      FROM embeddings a, bench
      WHERE a.vec_id % {EMB_DECON_MOD} <> 0
      GROUP BY a.vec_id
    )
    SELECT vec_id, round(m, 6) AS max_benchmark_cosine,
           CAST(CASE WHEN m >= {EMB_DECON_TAU} THEN 1 ELSE 0 END AS BIGINT)
             AS contaminated
    FROM scored
    """,
    doc=f"Embedding-space benchmark decontamination (SemDeDup-style "
    "semantic leakage check): flag corpus vectors whose max cosine "
    f"against the benchmark set reaches {EMB_DECON_TAU}. The "
    "benchmark embeddings collapse to ONE collected array broadcast "
    "to every task; per-row max-cosine is a JVM higher-order fold "
    "with the corpus norm staged once per row — zero shuffle over "
    "the corpus, so it scales as a pure map over 100 TB.",
)
def text_decontaminate_embedding(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    is_bench = F.col("vec_id") % EMB_DECON_MOD == 0
    # benchmark set -> ONE row holding array<struct<bvec, bnorm>>;
    # eval benchmarks are thousands of rows, so the collected array is
    # bounded and broadcast-safe
    bench = (
        e.where(is_bench)
        .select(
            F.struct(
                F.col("embedding").alias("bvec"),
                _norm(F.col("embedding")).alias("bnorm"),
            ).alias("b")
        )
        .agg(F.collect_list("b").alias("benchset"))
    )
    corpus = e.where(~is_bench).select(
        "vec_id",
        "embedding",
        _norm(F.col("embedding")).alias("cnorm"),  # staged ONCE per row
    )
    max_cos = F.aggregate(
        F.col("benchset"),
        F.lit(-1.0),
        lambda acc, b: F.greatest(
            acc,
            _dot(F.col("embedding"), b["bvec"])
            / (F.col("cnorm") * b["bnorm"]),
        ),
    )
    return (
        corpus.crossJoin(F.broadcast(bench))
        .select(
            "vec_id",
            F.round(max_cos, 6).alias("max_benchmark_cosine"),
            F.when(max_cos >= EMB_DECON_TAU, F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# crawl_bandit_ucb — explore/exploit crawl-budget scheduling
# ---------------------------------------------------------------------------
UCB_REWARD_THRESHOLD = 100.0  # a fetch "pays off" iff value > this
UCB_TOP_K = 25  # domains granted explore budget next round


@register(
    "crawl_bandit_ucb",
    oracle=f"""
    WITH pulls AS (
      SELECT CAST(user_id % 50 AS BIGINT) AS domain,
             COUNT(*)::BIGINT AS n_pulls,
             SUM(CASE WHEN value > {UCB_REWARD_THRESHOLD!r} THEN 1
                 ELSE 0 END)::BIGINT AS n_rewards
      FROM events GROUP BY 1
    ),
    tot AS (SELECT SUM(n_pulls)::BIGINT AS n_total FROM pulls),
    scored AS (
      SELECT domain, n_pulls, n_rewards,
             n_rewards::DOUBLE / n_pulls
             + sqrt(2.0 * ln(n_total::DOUBLE) / n_pulls) AS ucb_raw
      FROM pulls, tot
    )
    SELECT domain, n_pulls, n_rewards,
           ROUND(n_rewards::DOUBLE / n_pulls, 6) AS mean_reward,
           ROUND(ucb_raw, 6) AS ucb_score
    FROM scored
    ORDER BY ucb_raw DESC, domain
    LIMIT {UCB_TOP_K}
    """,
    doc=f"UCB1 bandit crawl scheduling: each domain is an arm, a fetch "
    f"is a pull, reward = novel content found (value > "
    f"{UCB_REWARD_THRESHOLD:g}); the next round's explore budget goes "
    f"to the top-{UCB_TOP_K} domains by mean + sqrt(2 ln N / n) — "
    "under-sampled domains get optimism bonuses, so the scheduler "
    "provably balances exploiting productive hosts against probing "
    "rarely-fetched ones (Auer et al. 2002 regret bound). One "
    "domain-keyed aggregate with map-side partials + a 1-row total "
    "broadcast; the top-K is TakeOrderedAndProject (per-partition "
    "partial top-K, never a global sort) — at 10^8 domains the plan "
    "moves only the aggregate rows and K survivors.",
)
def crawl_bandit_ucb(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    pulls = ev.groupBy(
        (F.col("user_id") % 50).cast("bigint").alias("domain")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pulls"),
        F.sum(
            F.when(F.col("value") > UCB_REWARD_THRESHOLD, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_rewards"),
    )
    tot = pulls.agg(F.sum("n_pulls").cast("bigint").alias("n_total"))
    ucb_raw = F.col("n_rewards").cast("double") / F.col("n_pulls") + F.sqrt(
        2.0 * F.log(F.col("n_total").cast("double")) / F.col("n_pulls")
    )
    return (
        pulls.crossJoin(F.broadcast(tot))
        .withColumn("ucb_raw", ucb_raw)
        .orderBy(F.desc("ucb_raw"), F.asc("domain"))
        .limit(UCB_TOP_K)
        .select(
            "domain",
            "n_pulls",
            "n_rewards",
            F.round(
                F.col("n_rewards").cast("double") / F.col("n_pulls"), 6
            ).alias("mean_reward"),
            F.round("ucb_raw", 6).alias("ucb_score"),
        )
    )


# ---------------------------------------------------------------------------
# graph_label_propagation — community detection over the link graph
# ---------------------------------------------------------------------------
_LPA_SRC = 911  # node-id moduli; distinct from the triangle probe so
_LPA_DST = 907  # the two graph fixtures are independent
LPA_ROUNDS = 3  # synchronous unrolled rounds (fixed, like the
#                 PageRank/HITS/OPIC unrolls: no convergence loop)

_LPA_EDGES_SQL = f"""
    raw AS (
      SELECT DISTINCT
        CAST(least(user_id % {_LPA_SRC}, event_id % {_LPA_DST}) AS BIGINT) AS lo,
        CAST(greatest(user_id % {_LPA_SRC}, event_id % {_LPA_DST}) AS BIGINT) AS hi
      FROM events
      WHERE user_id % {_LPA_SRC} <> event_id % {_LPA_DST}
    ),
    und AS (
      SELECT lo AS src, hi AS dst FROM raw
      UNION ALL SELECT hi AS src, lo AS dst FROM raw
    )
"""


def _lpa_round_sql(prev: str, cur: str) -> str:
    """One synchronous LPA round as two CTEs (counts + argmax)."""
    return f"""
    {cur}_c AS (
      SELECT und.dst AS node, p.label, CAST(count(*) AS BIGINT) AS c
      FROM und JOIN {prev} p ON p.node = und.src
      GROUP BY 1, 2
    ),
    {cur} AS (
      SELECT node, label FROM (
        SELECT node, label,
               row_number() OVER (
                 PARTITION BY node ORDER BY c DESC, label ASC
               ) AS rn
        FROM {cur}_c
      ) WHERE rn = 1
    )"""


@register(
    "graph_label_propagation",
    oracle=f"""
    WITH {_LPA_EDGES_SQL},
    l0 AS (
      SELECT node, node AS label FROM (
        SELECT DISTINCT lo AS node FROM raw
        UNION SELECT DISTINCT hi AS node FROM raw
      )
    ),
    {",".join(_lpa_round_sql(f"l{r}", f"l{r + 1}") for r in range(LPA_ROUNDS))}
    SELECT label AS community,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(min(node) AS BIGINT) AS min_member,
           CAST(max(node) AS BIGINT) AS max_member
    FROM l{LPA_ROUNDS} GROUP BY label
    """,
    doc=f"Community detection by {LPA_ROUNDS} synchronous label-"
    "propagation rounds (Raghavan et al. 2007) over the undirected "
    "domain link graph — the mirror-farm / content-ring grouping "
    "signal exact dedup misses. Every node starts labelled by itself; "
    "each round it adopts the most frequent neighbor label (ties to "
    "the smallest label, making the sweep deterministic — vanilla LPA "
    "breaks ties randomly and is irreproducible across runs). Each "
    "round is one O(E) edges-to-labels join + a (node, label) count + "
    "a per-node argmax, the same bounded-shuffle shape as the "
    "PageRank/HITS unrolls; labels persist per round so lineage stays "
    "linear (the CC operator's exponential-lineage lesson).",
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    u = (F.col("user_id") % _LPA_SRC).cast("long")
    v = (F.col("event_id") % _LPA_DST).cast("long")
    raw = (
        ev.select(
            F.least(u, v).alias("lo"), F.greatest(u, v).alias("hi")
        )
        .where(F.col("lo") != F.col("hi"))
        .distinct()
    )
    und = (
        raw.select(F.col("lo").alias("src"), F.col("hi").alias("dst"))
        .unionAll(raw.select(F.col("hi").alias("src"), F.col("lo").alias("dst")))
        .persist()
    )
    labels = (
        und.select(F.col("src").alias("node")).distinct()
        .select("node", F.col("node").alias("label"))
        .persist()
    )
    for _ in range(LPA_ROUNDS):
        msgs = und.join(
            labels.withColumnRenamed("node", "src"), "src"
        ).select(F.col("dst").alias("node"), "label")
        counts = msgs.groupBy("node", "label").agg(
            F.count(F.lit(1)).cast("bigint").alias("c")
        )
        # deterministic argmax: max count, then smallest label
        nxt = (
            counts.groupBy("node")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("c")).alias("nc"),
                        F.col("label").alias("l"),
                    )
                ).alias("best")
            )
            .select("node", F.col("best.l").alias("label"))
            .persist()
        )
        nxt.count()  # materialize before unpersisting the parent
        labels.unpersist()
        labels = nxt
    return labels.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.min("node").cast("bigint").alias("min_member"),
        F.max("node").cast("bigint").alias("max_member"),
    ).select(
        F.col("label").alias("community"),
        "n_members",
        "min_member",
        "max_member",
    )


# ---------------------------------------------------------------------------
# crawl_shard_rendezvous — HRW fetcher-shard assignment
# ---------------------------------------------------------------------------
HRW_HOST_MOD = 1499  # distinct synthetic hosts in the fixture
HRW_SHARDS = 16  # current fetcher fleet size
HRW_SHARDS_GROWN = 17  # fleet after adding ONE fetcher


@register(
    "crawl_shard_rendezvous",
    oracle=f"""
    WITH hosts AS (
      SELECT DISTINCT 'h' || CAST(user_id % {HRW_HOST_MOD} AS VARCHAR)
        AS host
      FROM events
    ),
    s16 AS (
      SELECT host, shard FROM (
        SELECT h.host, g.range AS shard,
               {sk.sql_h60("'hrw:' || h.host || ':' || CAST(g.range AS VARCHAR)")}
                 AS score,
               row_number() OVER (
                 PARTITION BY h.host
                 ORDER BY {sk.sql_h60("'hrw:' || h.host || ':' || CAST(g.range AS VARCHAR)")}
                   DESC, g.range
               ) AS rn
        FROM hosts h CROSS JOIN range({HRW_SHARDS}) g
      ) WHERE rn = 1
    ),
    s17 AS (
      SELECT host, shard FROM (
        SELECT h.host, g.range AS shard,
               {sk.sql_h60("'hrw:' || h.host || ':' || CAST(g.range AS VARCHAR)")}
                 AS score,
               row_number() OVER (
                 PARTITION BY h.host
                 ORDER BY {sk.sql_h60("'hrw:' || h.host || ':' || CAST(g.range AS VARCHAR)")}
                   DESC, g.range
               ) AS rn
        FROM hosts h CROSS JOIN range({HRW_SHARDS_GROWN}) g
      ) WHERE rn = 1
    )
    SELECT CAST(s16.shard AS BIGINT) AS shard,
           CAST(count(*) AS BIGINT) AS n_hosts,
           CAST(SUM(CASE WHEN s17.shard <> s16.shard THEN 1 ELSE 0 END)
                AS BIGINT) AS n_remapped
    FROM s16 JOIN s17 USING (host)
    GROUP BY 1
    """,
    doc=f"Rendezvous (highest-random-weight) hashing of hosts onto "
    f"{HRW_SHARDS} fetcher shards (Thaler & Ravishankar 1998) — the "
    "politeness-preserving shard map: every url of a host lands on "
    "ONE fetcher (per-host rate limits need no coordination), and "
    f"growing the fleet to {HRW_SHARDS_GROWN} remaps only ~1/"
    f"{HRW_SHARDS_GROWN} of hosts, every one of them TO the new "
    "shard — modulo hashing would reshuffle ~15/16 of all hosts and "
    "reset every politeness clock. Assignment is a per-row argmax "
    "over a literal score array — a pure map with zero shuffle after "
    "the host distinct; the output agg has at most "
    f"{HRW_SHARDS} rows.",
)
def crawl_shard_rendezvous(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hosts = ev.select(
        F.concat(
            F.lit("h"), (F.col("user_id") % HRW_HOST_MOD).cast("string")
        ).alias("host")
    ).distinct()

    def assign(n_shards: int) -> F.Column:
        # literal array of (score, shard) structs; array_max picks the
        # lexicographic max = highest score (ties -> highest shard,
        # matching the oracle's DESC, shard rn=1 ... scores are 60-bit
        # md5 halves, collisions are ~2^-60 so tie order is moot, but
        # keep both sides identical anyway: oracle orders shard ASC on
        # ties, so mirror with -shard in the struct)
        return F.array_max(
            F.array(
                *[
                    F.struct(
                        sk.h60(
                            F.concat(F.lit("hrw:"), F.col("host"), F.lit(f":{s}"))
                        ).alias("score"),
                        F.lit(-s).cast("bigint").alias("nshard"),
                    )
                    for s in range(n_shards)
                ]
            )
        )

    assigned = hosts.select(
        "host",
        (-assign(HRW_SHARDS).getField("nshard")).cast("bigint").alias("shard"),
        (-assign(HRW_SHARDS_GROWN).getField("nshard"))
        .cast("bigint")
        .alias("shard_grown"),
    )
    return (
        assigned.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hosts"),
            F.sum(
                F.when(F.col("shard_grown") != F.col("shard"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_remapped"),
        )
    )


# ---------------------------------------------------------------------------
# sample_holdout_split — deterministic stratified train/val/test split
# ---------------------------------------------------------------------------
SPLIT_TRAIN = 800_000  # of 1_000_000 hash buckets -> 80%
SPLIT_VAL = 900_000  # next 10%; rest is test

_SPLIT_BUCKET_SQL = sk.sql_h60("'split:' || CAST(doc_id AS VARCHAR)") + " % 1000000"


@register(
    "sample_holdout_split",
    oracle=f"""
    WITH d AS (
      SELECT lang,
             CASE WHEN {_SPLIT_BUCKET_SQL} < {SPLIT_TRAIN} THEN 'train'
                  WHEN {_SPLIT_BUCKET_SQL} < {SPLIT_VAL} THEN 'val'
                  ELSE 'test' END AS split,
             {_RSV_NTOK_SQL} AS n_tok
      FROM documents
    ),
    g AS (
      SELECT lang, split,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens
      FROM d GROUP BY 1, 2
    )
    SELECT lang, split, n_docs, n_tokens,
           round(n_docs::DOUBLE / sum(n_docs) OVER (PARTITION BY lang), 4)
             AS frac
    FROM g
    """,
    doc="Deterministic stratified 80/10/10 train/val/test holdout: each "
    "doc's split is a pure function of its id (60-bit hash bucket), so "
    "membership is reproducible across runs, engines, and cluster "
    "sizes, docs never migrate between splits as the corpus grows "
    "(the eval-set stability property a time- or position-based split "
    "lacks), and no split table needs to be stored or joined. "
    "Map-only split assignment + one bounded (lang, split) aggregate; "
    "the per-lang fraction window runs over at most 3 rows per lang.",
)
def sample_holdout_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        sk.h60(F.concat(F.lit("split:"), F.col("doc_id").cast("string")))
        % 1_000_000
    )
    split = (
        F.when(bucket < SPLIT_TRAIN, "train")
        .when(bucket < SPLIT_VAL, "val")
        .otherwise("test")
    )
    g = (
        d.select(
            "lang",
            split.alias("split"),
            F.size(F.split(F.trim(F.col("text")), r"\s+"))
            .cast("bigint")
            .alias("n_tok"),
        )
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
    )
    w = Window.partitionBy("lang")
    return g.select(
        "lang",
        "split",
        "n_docs",
        "n_tokens",
        F.round(
            F.col("n_docs").cast("double") / F.sum("n_docs").over(w), 4
        ).alias("frac"),
    )


# ---------------------------------------------------------------------------
# text_char_entropy — Shannon-entropy gibberish gate
# ---------------------------------------------------------------------------
ENT_CAP = 2000  # chars sampled per doc (prefix) — bounds the per-row
#                 fold at O(distinct_chars x CAP) regardless of doc size
ENT_LOW = 2.5  # bits/char below -> repetitive spam (aaaa..., kw stuffing)
ENT_HIGH = 5.2  # bits/char above -> encoded junk (base64 blobs, minified
#                 binary-in-text); clean English prose sits ~3.9-4.4


@register(
    "text_char_entropy",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, substr(text, 1, {ENT_CAP}) AS t FROM documents
    ),
    c AS (
      SELECT doc_id, greatest(length(t), 1) AS n,
             list_transform(range(1, greatest(length(t), 1) + 1),
                            i -> substr(t, CAST(i AS INTEGER), 1)) AS chars
      FROM d
    ),
    h AS (
      SELECT doc_id, n,
             list_transform(list_distinct(chars),
               c2 -> len(list_filter(chars, x -> x = c2))::BIGINT) AS hist
      FROM c
    ),
    e AS (
      SELECT doc_id, n,
             -list_sum(list_transform(hist,
                cnt -> (cnt::DOUBLE / n) * log2(cnt::DOUBLE / n))) AS ent
      FROM h
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_sampled,
           round(ent, 4) AS char_entropy,
           CASE WHEN ent < {ENT_LOW} THEN 'low'
                WHEN ent > {ENT_HIGH} THEN 'high'
                ELSE 'ok' END AS entropy_flag
    FROM e
    """,
    doc=f"Shannon character entropy (bits/char over the first {ENT_CAP} "
    "chars) as a gibberish gate: repetitive spam (keyword stuffing, "
    f"aaaa-padding) scores < {ENT_LOW}, encoded junk (base64 blobs, "
    f"binary-in-text) scores > {ENT_HIGH}, prose sits ~4. The whole "
    "computation is per-row JVM array expressions — char array, "
    "distinct, histogram, entropy fold — each STAGED as its own "
    "column so no higher-order lambda re-inlines its input (the "
    "winnow CSE trap): zero shuffle, a pure map at 100 TB.",
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    df = d.select(
        "doc_id", F.substring(F.col("text"), 1, ENT_CAP).alias("t")
    )
    df = df.withColumn("n", F.greatest(F.length("t"), F.lit(1)))
    # stage each array as a real column: attribute refs, never
    # composite expressions, inside the downstream lambdas
    df = df.withColumn(
        "chars",
        F.transform(
            F.sequence(F.lit(1), F.col("n")),
            lambda i: F.col("t").substr(i, F.lit(1)),
        ),
    )
    df = df.withColumn("dchars", F.array_distinct("chars"))
    df = df.withColumn(
        "hist",
        F.transform(
            F.col("dchars"),
            lambda c: F.size(
                F.filter(F.col("chars"), lambda x: x == c)
            ).cast("bigint"),
        ),
    )
    ent = -F.aggregate(
        F.col("hist"),
        F.lit(0.0),
        lambda acc, cnt: acc
        + (cnt.cast("double") / F.col("n"))
        * F.log2(cnt.cast("double") / F.col("n")),
    )
    return df.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_sampled"),
        F.round(ent, 4).alias("char_entropy"),
        F.when(ent < ENT_LOW, "low")
        .when(ent > ENT_HIGH, "high")
        .otherwise("ok")
        .alias("entropy_flag"),
    )
