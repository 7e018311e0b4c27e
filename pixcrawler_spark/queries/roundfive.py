"""Round-4 (late) queries: sketches, recrawl scheduling, trap detection,
span-level dedup, corpus-mixture sampling, budget water-filling,
sitemap extraction, anchor-text aggregation.

The telemetry + curation + scheduling layer of a 10^10-url crawl:
cardinality and frequency WITHOUT exact-distinct shuffles (HLL / CMS /
KMV, all mergeable partial aggregates with *bit-exact* cross-engine
oracles — see operators/sketches.py), the recrawl economics the
reference's fixed retry ladder lacks (Cho & Garcia-Molina change-rate
estimation), crawler-trap heuristics over raw urls, Lee-et-al-style
duplicated token-span measurement, deterministic hash sampling to
per-lang token budgets (dataset mixture curation), max-min fair
per-domain budget allocation, robots Sitemap: discovery, and
per-target anchor-text aggregation over parsed html.

Registered FIRST (queries/__init__.py) so the first nine land inside
the driver's 50-entry correctness window; the nine analytics/advanced
queries they displace (q01-q04, q21-q25) all carry green
CORRECTNESS_r03 rows, so union(r03, r04) still covers everything but
the overflow newcomers graph_anchor_text, sketch_histogram_quantiles,
and sample_quality_budget (added after the window filled with
no-prior-row queries; each is pytest-oracle-verified at three scale
factors and is a priority candidate for the r05 window rotation).

Reference analogs: the retry ladder + per-keyword progress tracking in
builder/core (fixed backoff, exact Python set sizes) and the
duplicate-heavy directory assumption of validator/integrity.py:389-426;
everything here replaces exact, driver-memory bookkeeping with
fixed-size mergeable state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pixcrawler_spark.operators import sketches as sk
from pixcrawler_spark.queries.registry import register
from pixcrawler_spark.sources.tables import load_table

__all__: list[str] = []


# ---------------------------------------------------------------------------
# sketch_hll_distinct_urls — HLL vs exact per group
# ---------------------------------------------------------------------------
@register(
    "sketch_hll_distinct_urls",
    oracle=f"""
    WITH est AS (
      {sk.sql_hll("lineitem", ["l_returnflag"], "CAST(l_orderkey AS VARCHAR)")}
    ),
    ex AS (
      SELECT l_returnflag,
             COUNT(DISTINCT l_orderkey)::BIGINT AS exact_distinct
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT ex.l_returnflag, exact_distinct, hll_distinct,
           ROUND(100.0 * abs(hll_distinct - exact_distinct)
                 / exact_distinct, 2) AS err_pct
    FROM est JOIN ex USING (l_returnflag)
    """,
    doc="HyperLogLog (m=512) distinct-url telemetry per group vs the "
    "exact count: the per-partition seen-set growth / dedup hit-rate "
    "metric of the round loop, as a map-side partial aggregate whose "
    "shuffle is <= groups x 512 register rows regardless of input "
    "size. Estimate reproduced bit-for-bit by the oracle (integer-"
    "space Z sum).",
)
def sketch_hll_distinct_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    reg = sk.hll_registers(
        li, ["l_returnflag"], F.col("l_orderkey").cast("string")
    )
    est = sk.hll_estimate(reg, ["l_returnflag"])
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("exact_distinct")
    )
    return est.join(exact, "l_returnflag").select(
        "l_returnflag",
        "exact_distinct",
        "hll_distinct",
        F.round(
            F.lit(100.0)
            * F.abs(F.col("hll_distinct") - F.col("exact_distinct"))
            / F.col("exact_distinct"),
            2,
        ).alias("err_pct"),
    )


# ---------------------------------------------------------------------------
# sketch_cms_hot_domains — count-min heavy hitters
# ---------------------------------------------------------------------------
_CMS_J = "unnest(range(4))"


@register(
    "sketch_cms_hot_domains",
    oracle=f"""
    WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
    jj AS (SELECT {_CMS_J} AS j),
    counters AS (
      SELECT j, {sk.sql_cms_bucket("k", "j")} AS bucket,
             COUNT(*)::BIGINT AS cnt
      FROM ev, jj GROUP BY j, bucket
    ),
    exact AS (SELECT k, COUNT(*)::BIGINT AS exact_cnt FROM ev GROUP BY k),
    probes AS (
      SELECT k, j, {sk.sql_cms_bucket("k", "j")} AS bucket FROM exact, jj
    ),
    est AS (
      SELECT k, MIN(COALESCE(cnt, 0))::BIGINT AS cms_est
      FROM probes LEFT JOIN counters USING (j, bucket) GROUP BY k
    )
    SELECT CAST(k AS BIGINT) AS domain_id, exact_cnt, cms_est,
           (cms_est - exact_cnt)::BIGINT AS overcount
    FROM exact JOIN est USING (k)
    ORDER BY cms_est DESC, domain_id LIMIT 20
    """,
    doc="Count-min sketch (d=4, w=64) heavy-hitter estimates for the "
    "politeness/salting key, vs exact counts (overcount >= 0 always — "
    "the one-sided CMS guarantee). The cheap feed for 'which domains "
    "need salting' in the skew path; counters are SUM-mergeable so "
    "the build is one map-side partial agg.",
)
def sketch_cms_hot_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("k")
    )
    counters = sk.cms_counters(ev, F.col("k"))
    exact = ev.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_cnt")
    )
    est = sk.cms_estimate(counters, exact.select("k"), "k")
    return (
        exact.join(est, "k")
        .select(
            F.col("k").cast("bigint").alias("domain_id"),
            "exact_cnt",
            F.col("cms_est").cast("bigint").alias("cms_est"),
            (F.col("cms_est") - F.col("exact_cnt"))
            .cast("bigint")
            .alias("overcount"),
        )
        .orderBy(F.desc("cms_est"), "domain_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# sketch_kmv_round_overlap — bottom-k union/intersection across rounds
# ---------------------------------------------------------------------------
_KMV_EST = (
    f"ROUND({float(sk.KMV_K - 1)!r} * {float(1 << sk.HASH_BITS)!r}"
    " / {kth}::DOUBLE, 2)"
)
_H_CUST = sk.sql_h60("CAST(o_custkey AS VARCHAR)")


def _kmv_est_sql(kth: str) -> str:
    return _KMV_EST.format(kth=kth)


@register(
    "sketch_kmv_round_overlap",
    oracle=f"""
    WITH ha AS (
      SELECT DISTINCT {_H_CUST} AS hv FROM orders WHERE o_orderkey % 3 < 2
    ),
    hb AS (
      SELECT DISTINCT {_H_CUST} AS hv FROM orders WHERE o_orderkey % 2 = 0
    ),
    ka AS (SELECT hv FROM ha ORDER BY hv LIMIT {sk.KMV_K}),
    kb AS (SELECT hv FROM hb ORDER BY hv LIMIT {sk.KMV_K}),
    ku AS (
      SELECT hv FROM (SELECT hv FROM ha UNION SELECT hv FROM hb)
      ORDER BY hv LIMIT {sk.KMV_K}
    ),
    shared AS (
      SELECT COUNT(*)::BIGINT AS m FROM ku
      WHERE hv IN (SELECT hv FROM ha) AND hv IN (SELECT hv FROM hb)
    )
    SELECT
      (SELECT COUNT(*) FROM ha)::BIGINT AS exact_a,
      (SELECT COUNT(*) FROM hb)::BIGINT AS exact_b,
      (SELECT COUNT(*) FROM (SELECT hv FROM ha UNION SELECT hv FROM hb))::BIGINT
        AS exact_union,
      (SELECT COUNT(*) FROM ha WHERE hv IN (SELECT hv FROM hb))::BIGINT
        AS exact_inter,
      {_kmv_est_sql("(SELECT MAX(hv) FROM ka)")} AS est_a,
      {_kmv_est_sql("(SELECT MAX(hv) FROM kb)")} AS est_b,
      {_kmv_est_sql("(SELECT MAX(hv) FROM ku)")} AS est_union,
      ROUND((SELECT m FROM shared)::DOUBLE / {sk.KMV_K}
            * ({float(sk.KMV_K - 1)!r} * {float(1 << sk.HASH_BITS)!r}
               / (SELECT MAX(hv) FROM ku)::DOUBLE), 2) AS est_inter
    """,
    doc="K-minimum-values (k=256) union / intersection cardinality "
    "between two crawl rounds' url sets — 'how many NEW urls did this "
    "round contribute' without materializing either set. Bottom-k is "
    "ORDER BY hash LIMIT k = TakeOrdered (per-partition k, k-row "
    "driver merge, no full sort); md5 collisions are absent so the "
    "distinct hash set is the distinct key set.",
)
def sketch_kmv_round_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    key = F.col("o_custkey").cast("string")
    a = o.filter(F.col("o_orderkey") % 3 < 2).select(sk.h60(key).alias("hv")).distinct()
    b = o.filter(F.col("o_orderkey") % 2 == 0).select(sk.h60(key).alias("hv")).distinct()
    u = a.union(b).distinct()
    ka = a.orderBy("hv").limit(sk.KMV_K)
    kb = b.orderBy("hv").limit(sk.KMV_K)
    ku = u.orderBy("hv").limit(sk.KMV_K)
    # shared = bottom-k(union) members present in BOTH sides
    shared = (
        ku.join(
            a.withColumnRenamed("hv", "hva"),
            F.col("hv") == F.col("hva"),
            "left_semi",
        )
        .join(
            b.withColumnRenamed("hv", "hvb"),
            F.col("hv") == F.col("hvb"),
            "left_semi",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    )
    exact_a = a.agg(F.count(F.lit(1)).cast("bigint").alias("exact_a"))
    exact_b = b.agg(F.count(F.lit(1)).cast("bigint").alias("exact_b"))
    exact_u = u.agg(F.count(F.lit(1)).cast("bigint").alias("exact_union"))
    exact_i = a.join(b, "hv", "left_semi").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_inter")
    )
    kth_a = ka.agg(F.max("hv").alias("kth_a"))
    kth_b = kb.agg(F.max("hv").alias("kth_b"))
    kth_u = ku.agg(F.max("hv").alias("kth_u"))

    def est(kth: Column) -> Column:
        return F.round(sk.kmv_estimate_col(kth), 2)

    return (
        exact_a.crossJoin(exact_b)
        .crossJoin(exact_u)
        .crossJoin(exact_i)
        .crossJoin(kth_a)
        .crossJoin(kth_b)
        .crossJoin(kth_u)
        .crossJoin(shared)
        .select(
            "exact_a",
            "exact_b",
            "exact_union",
            "exact_inter",
            est(F.col("kth_a")).alias("est_a"),
            est(F.col("kth_b")).alias("est_b"),
            est(F.col("kth_u")).alias("est_union"),
            F.round(
                F.col("m").cast("double")
                / F.lit(sk.KMV_K)
                * sk.kmv_estimate_col(F.col("kth_u")),
                2,
            ).alias("est_inter"),
        )
    )


# ---------------------------------------------------------------------------
# crawl_recrawl_schedule — Cho & Garcia-Molina change-rate estimation
# ---------------------------------------------------------------------------
CHANGE_THRESHOLD = 100.0  # fetch 'changed' iff observed value > this
RECRAWL_BASE_S = 86400  # target: one interval per expected change/day
RECRAWL_NOW = "2024-02-01 00:00:00"  # just past the fixture's ts range


@register(
    "crawl_recrawl_schedule",
    oracle=f"""
    WITH hist AS (
      SELECT user_id AS url_id,
             COUNT(*)::BIGINT AS n_obs,
             SUM(CASE WHEN value > {CHANGE_THRESHOLD!r} THEN 1 ELSE 0
                 END)::BIGINT AS n_changes,
             MAX(ts) AS last_fetch_ts
      FROM events GROUP BY user_id
    ),
    rates AS (
      SELECT *,
             ROUND(-ln((n_obs - n_changes + 0.5) / (n_obs + 0.5)), 6) AS rr
      FROM hist
    ),
    sched AS (
      -- change_rate is the 6-decimal rr itself: a SECOND rounding to
      -- fewer digits would manufacture exact half-way ties (x.xxx50)
      -- that HALF_UP (Spark) and round-half-even-on-doubles (DuckDB)
      -- break differently
      SELECT url_id, n_obs, n_changes,
             rr AS change_rate,
             CAST(ROUND({RECRAWL_BASE_S} / greatest(rr, 0.001), 0) AS BIGINT)
               AS interval_s,
             last_fetch_ts
      FROM rates
    )
    SELECT url_id, n_obs, n_changes, change_rate, interval_s,
           last_fetch_ts + to_seconds(interval_s) AS next_fetch_ts,
           (last_fetch_ts + to_seconds(interval_s))
             < TIMESTAMP '{RECRAWL_NOW}' AS due_now
    FROM sched
    """,
    doc="Recrawl scheduling from per-url fetch history: the Cho & "
    "Garcia-Molina (2003) Poisson change-rate estimator "
    "r = -ln((n-X+0.5)/(n+0.5)) over n observations with X observed "
    "changes, mapped to a next-fetch time. Replaces the reference's "
    "fixed retry ladder with change-rate-proportional revisit "
    "economics; one groupBy over the fetch log, no shuffle beyond it.",
)
def crawl_recrawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hist = ev.groupBy(F.col("user_id").alias("url_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        F.sum(
            F.when(F.col("value") > CHANGE_THRESHOLD, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_changes"),
        F.max("ts").alias("last_fetch_ts"),
    )
    rr = F.round(
        -F.log(
            (F.col("n_obs") - F.col("n_changes") + 0.5)
            / (F.col("n_obs") + 0.5)
        ),
        6,
    )
    # single rounding only (to 6 decimals, in rr): re-rounding the
    # already-rounded value to 4 digits creates exact .xxx50 ties that
    # the two engines' rounding modes break differently
    sched = hist.select(
        "url_id",
        "n_obs",
        "n_changes",
        rr.alias("change_rate"),
        F.round(
            F.lit(float(RECRAWL_BASE_S)) / F.greatest(rr, F.lit(0.001)), 0
        )
        .cast("bigint")
        .alias("interval_s"),
        "last_fetch_ts",
    )
    next_ts = F.expr("timestampadd(SECOND, interval_s, last_fetch_ts)")
    return sched.select(
        "url_id",
        "n_obs",
        "n_changes",
        "change_rate",
        "interval_s",
        next_ts.alias("next_fetch_ts"),
        (next_ts < F.lit(RECRAWL_NOW).cast("timestamp")).alias("due_now"),
    )


# ---------------------------------------------------------------------------
# crawl_trap_detection — crawler-trap heuristics over raw urls
# ---------------------------------------------------------------------------
# Deterministic messy-URL synthesis from orderkeys (same pattern as
# crawl_url_canonicalize): both engines build the identical url, so the
# oracle checks the PARSING + signal logic, not the fixture. Variants:
# benign; adjacent-repeat segments (the classic symlink/self-link
# trap); calendar archive; deep path + session id + param spray.
_TRAP_VARIANTS_SQL = [
    "'https://site' || (o_orderkey % 97) || '.example.com/products/item'"
    " || o_orderkey",
    "'https://site' || (o_orderkey % 97) || '.example.com/cat/cat/cat/page'"
    " || o_orderkey",
    "'https://site' || (o_orderkey % 97) || '.example.com/2023/'"
    " || lpad(CAST(o_orderkey % 12 + 1 AS VARCHAR), 2, '0') || '/'"
    " || lpad(CAST(o_orderkey % 28 + 1 AS VARCHAR), 2, '0') || '/post'"
    " || o_orderkey",
    "'https://site' || (o_orderkey % 97)"
    " || '.example.com/a/b/c/d/e/f/g/h/item' || o_orderkey"
    " || '?phpsessid=s' || o_orderkey || '&x=1&y=2&z=3&w=4'",
]


def _trap_variants_spark(k: Column) -> list[Column]:
    site = F.concat(F.lit("https://site"), (k % 97).cast("string"), F.lit(".example.com"))
    ks = k.cast("string")
    return [
        F.concat(site, F.lit("/products/item"), ks),
        F.concat(site, F.lit("/cat/cat/cat/page"), ks),
        F.concat(
            site,
            F.lit("/2023/"),
            F.lpad((k % 12 + 1).cast("string"), 2, "0"),
            F.lit("/"),
            F.lpad((k % 28 + 1).cast("string"), 2, "0"),
            F.lit("/post"),
            ks,
        ),
        F.concat(
            site,
            F.lit("/a/b/c/d/e/f/g/h/item"),
            ks,
            F.lit("?phpsessid=s"),
            ks,
            F.lit("&x=1&y=2&z=3&w=4"),
        ),
    ]


@register(
    "crawl_trap_detection",
    oracle=f"""
    WITH urls AS (
      SELECT unnest([{", ".join(_TRAP_VARIANTS_SQL)}]) AS url FROM orders
    ),
    parsed AS (
      SELECT url,
             string_split(regexp_replace(url, '^https?://[^/]+', ''), '?')[1]
               AS path,
             COALESCE(string_split(
               regexp_replace(url, '^https?://[^/]+', ''), '?')[2], '')
               AS query
      FROM urls
    ),
    segd AS (
      SELECT url, query,
             list_filter(string_split(path, '/'), s -> s <> '') AS segs
      FROM parsed
    ),
    sig AS (
      SELECT url,
             len(segs)::BIGINT AS depth,
             CASE WHEN query = '' THEN 0
                  ELSE len(string_split(query, '&')) END::BIGINT AS n_params,
             COALESCE(list_contains(
               list_transform(range(1, len(segs)),
                              i -> segs[i] = segs[i+1]), true), false)
               AS has_repeat,
             regexp_matches(url, '/20[0-9][0-9]/[0-9][0-9]/') AS has_calendar,
             (contains(lower(url), 'phpsessid=')
              OR contains(lower(url), 'sessionid=')) AS has_session
      FROM segd
    )
    SELECT url, depth, n_params, has_repeat, has_calendar, has_session,
           (CASE WHEN has_session THEN 3 ELSE 0 END
            + CASE WHEN has_repeat THEN 2 ELSE 0 END
            + CASE WHEN has_calendar THEN 2 ELSE 0 END
            + CASE WHEN depth >= 8 THEN 1 ELSE 0 END
            + CASE WHEN n_params >= 4 THEN 1 ELSE 0 END)::BIGINT AS trap_score,
           (CASE WHEN has_session THEN 3 ELSE 0 END
            + CASE WHEN has_repeat THEN 2 ELSE 0 END
            + CASE WHEN has_calendar THEN 2 ELSE 0 END
            + CASE WHEN depth >= 8 THEN 1 ELSE 0 END
            + CASE WHEN n_params >= 4 THEN 1 ELSE 0 END) >= 2 AS is_trap
    FROM sig
    """,
    doc="Crawler-trap detection over raw urls: adjacent-repeat path "
    "segments (symlink/self-link traps), calendar archives, session "
    "ids, parameter spray, depth explosion — scored per url, pure "
    "string/array Catalyst expressions (no UDF, no regex "
    "backreferences, so the same signals run JVM-side here and in "
    "RE2-based engines). Feeds the frontier's enqueue filter; at "
    "10^10 urls it is a narrow map, no shuffle at all.",
)
def crawl_trap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixcrawler_spark.operators.traps import trap_signals

    o = load_table(spark, sf_dir, "orders")
    urls = o.select(
        F.explode(F.array(*_trap_variants_spark(F.col("o_orderkey")))).alias(
            "url"
        )
    )
    # signal expressions live in operators/traps.py, which also carries
    # trap_py — the scalar reference the hypothesis differential fuzz
    # checks these expressions against on arbitrary url-shaped strings
    return trap_signals(urls)


# ---------------------------------------------------------------------------
# text_span_dedup — duplicated token-window measurement (Lee et al. 2022)
# ---------------------------------------------------------------------------
SPAN_W = 12  # tokens per window (Lee et al. used 50 BPE tokens; the
             # fixture docs average ~54 whitespace tokens)


@register(
    "text_span_dedup",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM documents
    ),
    sp AS (
      SELECT doc_id,
             unnest(list_transform(
               range(1, greatest(len(toks) - {SPAN_W - 1}, 0) + 1),
               i -> md5(array_to_string(toks[i:i+{SPAN_W - 1}], ' '))))
               AS span_h
      FROM t
    ),
    freq AS (SELECT span_h, COUNT(*) AS c FROM sp GROUP BY span_h),
    pd AS (
      SELECT doc_id, COUNT(*)::BIGINT AS n_spans,
             SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END)::BIGINT AS dup_spans
      FROM sp JOIN freq USING (span_h) GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(n_spans, 0)::BIGINT AS n_spans,
           COALESCE(dup_spans, 0)::BIGINT AS dup_spans,
           ROUND(CASE WHEN COALESCE(n_spans, 0) = 0 THEN 0.0
                      ELSE dup_spans::DOUBLE / n_spans END, 4) AS dup_frac
    FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
    """,
    doc=f"Span-level (substring) duplication: every {SPAN_W}-token "
    "window rolling-hashed, corpus-wide window frequencies, per-doc "
    "duplicated-span fraction — the measurement behind Lee et al. "
    "2022's 'Deduplicating Training Data Makes Language Models "
    "Better' ExactSubstr dedup, approximated at token-window "
    "granularity. Plan: one explode (~n_tokens rows per doc), one "
    "count per hash (map-side partial), one doc-keyed agg; span "
    "hashes are uniform so the shuffle has no hot keys.",
)
def text_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    spans = F.when(
        F.size(toks) >= SPAN_W,
        F.expr(
            f"transform(sequence(1, size(split(trim(text), '\\\\s+'))"
            f" - {SPAN_W - 1}),"
            f" i -> md5(concat_ws(' ',"
            f" slice(split(trim(text), '\\\\s+'), i, {SPAN_W}))))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    sp = d.select("doc_id", F.explode(spans).alias("span_h"))
    # both the corpus-wide frequency table and the per-doc probe read
    # the exploded spans; persist so tokenize+explode runs once, not
    # twice (released by the registry wrapper's clearCache)
    sp.persist()
    freq = sp.groupBy("span_h").agg(F.count(F.lit(1)).alias("c"))
    pd_ = (
        sp.join(freq, "span_h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_spans"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("dup_spans"),
        )
    )
    return d.select("doc_id").join(pd_, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
        F.coalesce("dup_spans", F.lit(0)).cast("bigint").alias("dup_spans"),
        F.round(
            F.when(F.coalesce("n_spans", F.lit(0)) == 0, 0.0).otherwise(
                F.col("dup_spans").cast("double") / F.col("n_spans")
            ),
            4,
        ).alias("dup_frac"),
    )


# ---------------------------------------------------------------------------
# sample_corpus_mixture — deterministic hash sampling to token budgets
# ---------------------------------------------------------------------------
MIX_BUDGET_TOKENS = 3000  # per-lang token budget
_MIX_KEY = "'mix:' || CAST(doc_id AS VARCHAR)"
_MIX_U = f"{sk.sql_h60(_MIX_KEY)} % 1000000"


@register(
    "sample_corpus_mixture",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, lang,
             len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS n_tok,
             {_MIX_U} AS u
      FROM documents
    ),
    tot AS (
      SELECT lang, COUNT(*)::BIGINT AS n_docs,
             SUM(n_tok)::BIGINT AS total_tokens
      FROM docs GROUP BY lang
    ),
    rated AS (
      SELECT lang, n_docs, total_tokens,
             least(1.0, {float(MIX_BUDGET_TOKENS)!r} / total_tokens::DOUBLE)
               AS rate
      FROM tot
    )
    SELECT r.lang, n_docs, total_tokens,
           ROUND(rate, 6) AS sample_rate,
           SUM(CASE WHEN u < CAST(floor(rate * 1000000) AS BIGINT)
               THEN 1 ELSE 0 END)::BIGINT AS kept_docs,
           SUM(CASE WHEN u < CAST(floor(rate * 1000000) AS BIGINT)
               THEN n_tok ELSE 0 END)::BIGINT AS kept_tokens
    FROM rated r JOIN docs d USING (lang)
    GROUP BY r.lang, n_docs, total_tokens, rate
    """,
    doc=f"Corpus mixture curation: deterministic hash sampling of each "
    f"language down to a {MIX_BUDGET_TOKENS}-token budget — the "
    "per-source mixture-weight downsampling every LLM data pipeline "
    "runs before training. The keep decision is a pure function of "
    "doc_id (portable 60-bit hash vs the lang's rate), so the kept "
    "set is reproducible across engines, runs, and cluster sizes; "
    "the lang-rate dim is broadcast, the scan stays shuffle-free.",
)
def sample_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
        .cast("bigint")
        .alias("n_tok"),
        (
            sk.h60(F.concat(F.lit("mix:"), F.col("doc_id").cast("string")))
            % 1000000
        ).alias("u"),
    )
    tot = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
    )
    rated = tot.select(
        "lang",
        "n_docs",
        "total_tokens",
        F.least(
            F.lit(1.0),
            F.lit(float(MIX_BUDGET_TOKENS))
            / F.col("total_tokens").cast("double"),
        ).alias("rate"),
    )
    keep = F.col("u") < F.floor(F.col("rate") * 1000000)
    return (
        docs.join(F.broadcast(rated), "lang")
        .groupBy("lang", "n_docs", "total_tokens", "rate")
        .agg(
            F.sum(F.when(keep, 1).otherwise(0)).cast("bigint").alias("kept_docs"),
            F.sum(F.when(keep, F.col("n_tok")).otherwise(0))
            .cast("bigint")
            .alias("kept_tokens"),
        )
        .select(
            "lang",
            "n_docs",
            "total_tokens",
            F.round("rate", 6).alias("sample_rate"),
            "kept_docs",
            "kept_tokens",
        )
    )


# ---------------------------------------------------------------------------
# crawl_budget_waterfill — max-min fair per-domain fetch budget
# ---------------------------------------------------------------------------
WATERFILL_BUDGET = 6000  # global fetches per round (< total demand)


@register(
    "crawl_budget_waterfill",
    oracle=f"""
    WITH dem AS (
      SELECT 'site' || CAST(o_orderkey % 97 AS VARCHAR) AS domain,
             COUNT(*)::BIGINT AS demand
      FROM orders GROUP BY 1
    ),
    ranked AS (
      SELECT domain, demand,
             SUM(demand) OVER (ORDER BY demand, domain
                               ROWS UNBOUNDED PRECEDING) AS cum,
             ROW_NUMBER() OVER (ORDER BY demand, domain) AS idx,
             COUNT(*) OVER () AS n
      FROM dem
    ),
    -- a domain is fully satisfiable iff giving it (and everything
    -- after it, which demands at least as much) its full demand still
    -- fits: demand*(n-idx+1) + (cum-demand) <= B  (exact integers)
    flagged AS (
      SELECT *,
             demand * (n - idx + 1) + (cum - demand) <= {WATERFILL_BUDGET}
               AS satisfied
      FROM ranked
    ),
    lvl AS (
      SELECT SUM(CASE WHEN satisfied THEN demand ELSE 0 END) AS s,
             SUM(CASE WHEN satisfied THEN 1 ELSE 0 END) AS k,
             MAX(n) AS n_tot
      FROM flagged
    )
    SELECT domain, demand, satisfied,
           ROUND(CASE WHEN satisfied THEN demand::DOUBLE
                      ELSE ({WATERFILL_BUDGET} - s)::DOUBLE / (n_tot - k)
                 END, 4) AS allocated
    FROM flagged, lvl
    """,
    doc=f"Water-filling (max-min fair) allocation of a global "
    f"{WATERFILL_BUDGET}-fetch round budget across domain queues: "
    "small queues get their full demand, the rest share the remainder "
    "at a common water level — the budget assignment a politeness-"
    "bounded frontier makes each round. The satisfied/level split is "
    "computed in EXACT integer arithmetic (one window over the "
    "domain-count frame, which is bounded by #domains, never #urls).",
)
def crawl_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixcrawler_spark.operators.politeness import waterfill_allocate

    o = load_table(spark, sf_dir, "orders")
    dem = o.groupBy(
        F.concat(F.lit("site"), (F.col("o_orderkey") % 97).cast("string")).alias(
            "domain"
        )
    ).agg(F.count(F.lit(1)).cast("bigint").alias("demand"))
    # the global window inside waterfill_allocate runs over the DOMAIN
    # frame: rows = distinct domains (a politeness-bounded crawl has
    # 10^6-10^8 of them, not 10^10) — a single-partition sort of a
    # bounded dim, not of the url corpus
    return waterfill_allocate(dem, WATERFILL_BUDGET)


# ---------------------------------------------------------------------------
# crawl_sitemap_extract — Sitemap: directives from robots bodies
# ---------------------------------------------------------------------------
@register(
    "crawl_sitemap_extract",
    oracle="""
    WITH src AS (SELECT DISTINCT source FROM documents)
    SELECT source AS domain,
           CAST(1 + length(source) % 2 AS BIGINT) AS n_sitemaps,
           'https://' || source || '.example/sitemap0.xml' AS first_sitemap
    FROM src
    """,
    doc="Sitemap-directive extraction from robots.txt (RFC 9309 §2.3 "
    "non-group records: they count from ANY user-agent group, which "
    "the synthesized bodies exercise by placing one inside the "
    "googlebot group). Bodies are synthesized per domain by a "
    "deterministic rule; the engine PARSES them with pure JVM array "
    "exprs (operators/robots.py sitemap_urls) and the oracle states "
    "the expected outcome from the same rule. Sitemap discovery is "
    "the frontier's second seed source next to SERP seeding.",
)
def crawl_sitemap_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixcrawler_spark.operators.robots import sitemap_urls

    d = load_table(spark, sf_dir, "documents").select("source").distinct()
    # deterministic body: sitemap0 sits INSIDE the googlebot group (it
    # must still be extracted — non-group record); domains with odd
    # name length get a second one after the * group
    base = F.concat(
        F.lit("User-agent: googlebot\nDisallow: /\nSitemap: https://"),
        F.col("source"),
        F.lit(".example/sitemap0.xml\nUser-agent: *\nDisallow: /tmp/\n"),
    )
    body = F.when(
        F.length("source") % 2 == 1,
        F.concat(
            base,
            F.lit("Sitemap: https://"),
            F.col("source"),
            F.lit(".example/sitemap1.xml\n"),
        ),
    ).otherwise(base)
    maps = sitemap_urls(body)
    return d.select(
        F.col("source").alias("domain"),
        F.size(maps).cast("bigint").alias("n_sitemaps"),
        F.element_at(maps, 1).alias("first_sitemap"),
    )


# ---------------------------------------------------------------------------
# graph_anchor_text — per-target anchor-text aggregation over REAL html
# ---------------------------------------------------------------------------
# Registered past the 50-entry driver window (the window is exactly
# full with queries that have no earlier driver row); pytest-oracle-
# verified this round, and the r05 rotation should move it inside.
@register(
    "graph_anchor_text",
    oracle="""
    WITH n AS (SELECT COUNT(*) AS c FROM documents),
    links AS (
      SELECT doc_id AS src, (7 * doc_id + 1) % c AS tgt FROM documents, n
      UNION ALL
      SELECT doc_id, (13 * doc_id + 2) % c FROM documents, n
    )
    SELECT 'https://ex.com/d' || CAST(tgt AS VARCHAR) AS target_url,
           COUNT(*)::BIGINT AS n_refs,
           COUNT(DISTINCT src)::BIGINT AS n_sources,
           MIN('kw' || CAST(src % 3 AS VARCHAR) || '-'
               || CAST(tgt % 17 AS VARCHAR)) AS top_anchor
    FROM links GROUP BY tgt
    """,
    doc="Per-target anchor-text aggregation — the web-graph relevance "
    "signal (what linking pages CALL a url, the classic ranking/"
    "labeling feature outlink extraction drops). Each doc's html is "
    "synthesized by a deterministic rule, the engine PARSES it with "
    "the Arrow anchor UDF (functions/text.py extract_anchors_py "
    "oracle discipline) and aggregates by target; the SQL oracle "
    "states the expected graph from the same rule WITHOUT parsing, "
    "so the extraction is earned. Scale: one explode of ~links/page "
    "rows, one target-keyed agg (uniform key: target ids), no joins.",
)
def graph_anchor_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixcrawler_spark.functions.text import extract_anchors_udf

    d = load_table(spark, sf_dir, "documents")
    n = d.agg(F.count(F.lit(1)).alias("c"))
    withn = d.select("doc_id").crossJoin(F.broadcast(n))
    t1 = (7 * F.col("doc_id") + 1) % F.col("c")
    t2 = (13 * F.col("doc_id") + 2) % F.col("c")

    def a_tag(tgt: Column) -> Column:
        return F.concat(
            F.lit('<a href="https://ex.com/d'),
            tgt.cast("string"),
            F.lit('" rel="x">kw'),
            (F.col("doc_id") % 3).cast("string"),
            F.lit("-"),
            (tgt % 17).cast("string"),
            F.lit("</a>"),
        )

    html = F.concat(
        F.lit("<html><title>t</title><p>body</p>"),
        a_tag(t1),
        F.lit("<p>mid</p>"),
        a_tag(t2),
        F.lit("</html>"),
    ).cast("binary")
    pages = withn.select("doc_id", html.alias("html"))
    anchors = pages.select(
        "doc_id", F.explode(extract_anchors_udf(F.col("html"))).alias("a")
    ).select(
        F.col("doc_id").alias("src"),
        F.col("a.href").alias("target_url"),
        F.col("a.anchor").alias("anchor"),
    )
    return anchors.groupBy("target_url").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_refs"),
        F.countDistinct("src").cast("bigint").alias("n_sources"),
        F.min("anchor").alias("top_anchor"),
    )


# ---------------------------------------------------------------------------
# sketch_histogram_quantiles — mergeable fixed-bin quantile estimates
# ---------------------------------------------------------------------------
# binning shared with the streaming windowed build (operators/sketches
# owns the constants; events.value ranges 0..~490 — one fixed bin width)
HIST_BINS = sk.HIST_BINS
HIST_MAX = sk.HIST_MAX
HIST_W = sk.HIST_W


@register(
    "sketch_histogram_quantiles",
    oracle=f"""
    WITH b AS (
      SELECT event_type,
             least(CAST(floor(value / {HIST_W!r}) AS BIGINT),
                   {HIST_BINS - 1}) AS bin
      FROM events
    ),
    h AS (
      SELECT event_type, bin, COUNT(*)::BIGINT AS c
      FROM b GROUP BY event_type, bin
    ),
    cum AS (
      SELECT event_type, bin, c,
             SUM(c) OVER (PARTITION BY event_type ORDER BY bin
                          ROWS UNBOUNDED PRECEDING) AS cc,
             SUM(c) OVER (PARTITION BY event_type) AS n
      FROM h
    )
    SELECT event_type, MAX(n)::BIGINT AS n,
           ROUND(MIN(CASE WHEN cc >= 0.50 * n
                 THEN (bin + 1) * {HIST_W!r} END), 4) AS p50_est,
           ROUND(MIN(CASE WHEN cc >= 0.95 * n
                 THEN (bin + 1) * {HIST_W!r} END), 4) AS p95_est,
           ROUND(MIN(CASE WHEN cc >= 0.99 * n
                 THEN (bin + 1) * {HIST_W!r} END), 4) AS p99_est
    FROM cum GROUP BY event_type
    """,
    doc=f"Mergeable quantile telemetry: a fixed {HIST_BINS}-bin "
    "histogram per group (SUM-combinable — the same partial-agg shape "
    "as CMS), quantiles read as the upper edge of the first bin whose "
    "cumulative count crosses the rank. Per-domain latency/size "
    "percentiles for the fetch scheduler without an exact sort: the "
    "shuffle carries <= groups x 256 counter rows, and two rounds' "
    "histograms ADD where exact percentiles cannot merge. Estimate "
    "error is bounded by one bin width "
    f"({HIST_W!r} here); registered past the driver window "
    "(pytest-oracle-verified; r05 rotation candidate).",
)
def sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    h = sk.hist_counts(ev, ["event_type"], F.col("value"))
    return sk.hist_quantiles(h, ["event_type"])


# ---------------------------------------------------------------------------
# sample_quality_budget — greedy quality-first selection to a token budget
# ---------------------------------------------------------------------------
QB_BUDGET_TOKENS = 2500  # per-lang token budget (< each lang's total)


@register(
    "sample_quality_budget",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS n_tok,
             len(list_distinct(regexp_split_to_array(trim(text), '\\s+')))::DOUBLE
               / len(regexp_split_to_array(trim(text), '\\s+')) AS uniq_ratio
      FROM documents
    ),
    r AS (
      SELECT doc_id, lang, n_tok,
             ROUND(uniq_ratio, 4) AS quality,
             SUM(n_tok) OVER (PARTITION BY lang
                              ORDER BY uniq_ratio DESC, doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM t
    )
    SELECT doc_id, lang, n_tok, quality, cum_tokens::BIGINT AS cum_tokens,
           cum_tokens <= {QB_BUDGET_TOKENS} AS kept
    FROM r
    """,
    doc=f"Quality-first budget selection: within each language, docs "
    "ordered by unique-token ratio (a Gopher-style repetition/quality "
    "proxy) fill a {QB}-token budget greedily — the curation step "
    "that spends a fixed token budget on the BEST documents rather "
    "than a uniform sample (contrast sample_corpus_mixture). One "
    "window per lang over doc-count rows; the kept set is a "
    "deterministic pure function of the corpus, reproducible across "
    "engines and cluster sizes. Registered past the driver window "
    "(pytest-oracle-verified; r05 rotation candidate)."
    .replace("{QB}", str(QB_BUDGET_TOKENS)),
)
def sample_quality_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    t = d.select(
        "doc_id",
        "lang",
        F.size(toks).cast("bigint").alias("n_tok"),
        (
            F.size(F.array_distinct(toks)).cast("double")
            / F.size(toks)
        ).alias("uniq_ratio"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.desc("uniq_ratio"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    r = t.select(
        "doc_id",
        "lang",
        "n_tok",
        F.round("uniq_ratio", 4).alias("quality"),
        F.sum("n_tok").over(w).alias("cum_tokens"),
    )
    return r.select(
        "doc_id",
        "lang",
        "n_tok",
        "quality",
        F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
        (F.col("cum_tokens") <= QB_BUDGET_TOKENS).alias("kept"),
    )
