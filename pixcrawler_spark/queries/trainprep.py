"""Corpus-preparation queries: paragraph dedup, PII redaction, benchmark
decontamination, duplicate-graph components, semantic dedup.

The corpus-hygiene passes between crawling and training (CCNet
paragraph dedup, GPT-3/PaLM n-gram decontamination, SemDeDup) — each a
registered query over the shared testdata with a DuckDB oracle built
from the SAME constants, following queries/pipeline.py's conventions.
Registered early (queries/__init__.py) so all five land inside the
driver's 50-entry correctness window; the five analytics/crawlops
queries they displace all carry green CORRECTNESS_r03 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pixcrawler_spark.operators import dedup, trainprep
from pixcrawler_spark.queries.annparams import K_CENTROIDS
from pixcrawler_spark.queries.pipeline import (
    BAND_SIZE,
    NUM_HASHES,
    SHINGLE_N,
    _BAND_SELECTS,
    _SHINGLES_CTE,
    _SIG_COLS,
    _sql_cos,
)
from pixcrawler_spark.queries.registry import register
from pixcrawler_spark.sources.tables import load_table

PARA_TOKENS = 10
DECONTAM_N = 8  # gram width: GPT-3 used 13-gram, PaLM 8-gram overlap
BENCH_MOD, BENCH_REM = 13, 5  # docs with id % 13 == 5 form the benchmark
CC_ITERS = 3
SEM_THRESHOLD = 0.3  # within-cluster cosine >= this → semantic dup
                     # (p90 of within-cluster pairs is ~0.24 on the
                     # synthetic embeddings; 0.3 prunes the true tail)

_TOKS_SQL = "regexp_split_to_array(trim(text), '\\s+')"


# ---------------------------------------------------------------------------
# text_paragraph_dedup — CCNet-style corpus-wide keep-first
# ---------------------------------------------------------------------------
@register(
    "text_paragraph_dedup",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    paras AS (
      SELECT doc_id, pidx,
             array_to_string(list_slice(toks, pidx*{PARA_TOKENS}+1,
                                        pidx*{PARA_TOKENS}+{PARA_TOKENS}), ' ') AS para
      FROM (SELECT doc_id, toks,
                   unnest(range(CAST(floor(len(toks)/{PARA_TOKENS}) AS BIGINT))) AS pidx
            FROM t)
    ),
    marked AS (
      SELECT doc_id, pidx, para,
             (row_number() OVER (PARTITION BY md5(para)
                                 ORDER BY doc_id, pidx) = 1) AS keep
      FROM paras
    ),
    agg AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_paras,
             CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_dup_paras,
             round(count(*) FILTER (WHERE NOT keep) * 1.0 / count(*), 4)
               AS dup_para_fraction,
             string_agg(para, ' ' ORDER BY pidx) FILTER (WHERE keep) AS kept_text
      FROM marked GROUP BY doc_id
    )
    SELECT d.doc_id AS doc_id,
           coalesce(a.n_paras, 0) AS n_paras,
           coalesce(a.n_dup_paras, 0) AS n_dup_paras,
           coalesce(a.dup_para_fraction, 0.0) AS dup_para_fraction,
           coalesce(a.kept_text, '') AS kept_text
    FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
    """,
    doc=f"CCNet-style paragraph-level exact dedup: {PARA_TOKENS}-token "
    "paragraphs hashed corpus-wide, first occurrence (doc_id, pidx) "
    "kept, docs reassembled without their duplicate paragraphs. The "
    "cross-doc shuffle keys on md5(paragraph) — uniform, never hot — "
    "so the pass is two hash exchanges at any corpus size.",
)
def text_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return trainprep.paragraph_dedup(d, "doc_id", "text", PARA_TOKENS)


# ---------------------------------------------------------------------------
# text_paragraph_dedup_incremental — the O(delta) round-loop form
# ---------------------------------------------------------------------------
# Deterministic split (the dedup_minhash_incremental pattern): docs with
# doc_id >= PARA_SPLIT are "this round's delta"; earlier docs are the
# accumulated corpus whose paragraph hashes a real pipeline reads back
# from the TableStore instead of rehashing (tests/test_trainprep.py
# drives that store path through an ascending-id round loop and asserts
# union == batch). This query checks the MATH on a fixed split: because
# corpus ids all precede delta ids, the incremental report must equal
# the batch keep-first restricted to the delta docs — which is exactly
# what the oracle states.
PARA_SPLIT = 400


@register(
    "text_paragraph_dedup_incremental",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    paras AS (
      SELECT doc_id, pidx,
             array_to_string(list_slice(toks, pidx*{PARA_TOKENS}+1,
                                        pidx*{PARA_TOKENS}+{PARA_TOKENS}), ' ') AS para
      FROM (SELECT doc_id, toks,
                   unnest(range(CAST(floor(len(toks)/{PARA_TOKENS}) AS BIGINT))) AS pidx
            FROM t)
    ),
    marked AS (
      SELECT doc_id, pidx, para,
             (row_number() OVER (PARTITION BY md5(para)
                                 ORDER BY doc_id, pidx) = 1) AS keep
      FROM paras
    ),
    agg AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_paras,
             CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_dup_paras,
             round(count(*) FILTER (WHERE NOT keep) * 1.0 / count(*), 4)
               AS dup_para_fraction,
             string_agg(para, ' ' ORDER BY pidx) FILTER (WHERE keep) AS kept_text
      FROM marked WHERE doc_id >= {PARA_SPLIT} GROUP BY doc_id
    )
    SELECT d.doc_id AS doc_id,
           coalesce(a.n_paras, 0) AS n_paras,
           coalesce(a.n_dup_paras, 0) AS n_dup_paras,
           coalesce(a.dup_para_fraction, 0.0) AS dup_para_fraction,
           coalesce(a.kept_text, '') AS kept_text
    FROM (SELECT doc_id FROM documents WHERE doc_id >= {PARA_SPLIT}) d
    LEFT JOIN agg a ON d.doc_id = a.doc_id
    """,
    doc="Incremental (delta-vs-corpus) paragraph dedup: the delta's "
    "paragraphs probe the accumulated paragraph-hash store instead of "
    "rescanning corpus text — per-round cost O(delta), the same "
    "static-side membership shape as the crawl seen-set. Oracle = the "
    "batch keep-first restricted to the delta docs (exact because "
    "corpus ids precede delta ids — the crawl's arrival order).",
)
def text_paragraph_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    corpus = d.where(F.col("doc_id") < PARA_SPLIT)
    delta = d.where(F.col("doc_id") >= PARA_SPLIT)
    corpus_hashes = trainprep.paragraph_hashes(
        corpus, "doc_id", "text", PARA_TOKENS
    ).select("phash")
    report, _new = trainprep.incremental_paragraph_dedup(
        delta, corpus_hashes, "doc_id", "text", PARA_TOKENS
    )
    return report


# ---------------------------------------------------------------------------
# text_pii_redact — oracle-by-construction synthetic PII
# ---------------------------------------------------------------------------
# Deterministic synthesis (the queries/media.py pattern): each doc gets
# a contact tail built from doc_id — 1+(id%2) emails, a phone unless
# id%3=0, always one IPv4 — appended to its first-5-token prefix. Spark
# must EARN the counts and placeholders through the real regexes
# (operators/trainprep.py EMAIL_RE/IPV4_RE/PHONE_RE); the oracle states
# the expected output arithmetically without running any regex.
@register(
    "text_pii_redact",
    oracle=f"""
    SELECT doc_id,
           CAST(1 + (doc_id % 2) AS INTEGER) AS n_emails,
           CAST(CASE WHEN doc_id % 3 = 0 THEN 0 ELSE 1 END AS INTEGER) AS n_phones,
           CAST(1 AS INTEGER) AS n_ips,
           prefix || ' contact: <EMAIL>' ||
           CASE WHEN doc_id % 2 = 1 THEN ' and <EMAIL>' ELSE '' END ||
           CASE WHEN doc_id % 3 = 0 THEN '' ELSE ' tel <PHONE>' END ||
           ' ip <IP> ref ' || CAST(doc_id AS VARCHAR) AS redacted
    FROM (SELECT doc_id,
                 array_to_string(list_slice({_TOKS_SQL}, 1, 5), ' ') AS prefix
          FROM documents)
    """,
    doc="PII redaction (emails / phones / IPv4 → typed placeholders) as "
    "three codegen'd regexp passes, counted before replacement — "
    "map-side only, no shuffle. Oracle by construction: the planted "
    "contact tail is derived from doc_id on both sides; Spark earns "
    "the redacted string through the real regexes.",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    k = F.col("doc_id").cast("long")
    s = lambda c: c.cast("string")  # noqa: E731
    toks = F.split(F.trim(F.col("text")), trainprep.TOKEN_SPLIT_REGEX)
    prefix = F.array_join(F.slice(toks, 1, 5), " ")
    email1 = F.concat(F.lit("user"), s(k), F.lit("@mail"), s(k % 7), F.lit(".com"))
    email2 = F.when(
        k % 2 == 1, F.concat(F.lit(" and alt"), s(k), F.lit("@ex.net"))
    ).otherwise(F.lit(""))
    phone = F.when(k % 3 == 0, F.lit("")).otherwise(
        F.concat(F.lit(" tel +1 555-"), s(k % 9000 + 1000))
    )
    ip = F.concat(
        F.lit(" ip "), s(k % 223 + 1), F.lit("."), s(k % 256), F.lit("."),
        s((k * 7) % 256), F.lit("."), s(k % 200 + 1),
    )
    raw = F.concat(
        prefix, F.lit(" contact: "), email1, email2, phone, ip,
        F.lit(" ref "), s(k),
    )
    base = d.select(F.col("doc_id"), raw.alias("pii_text"))
    return trainprep.pii_redact(base, "pii_text").select(
        "doc_id", "n_emails", "n_phones", "n_ips", "redacted"
    )


# ---------------------------------------------------------------------------
# text_decontaminate — benchmark n-gram overlap sweep
# ---------------------------------------------------------------------------
@register(
    "text_decontaminate",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    grams AS (
      SELECT doc_id, gidx,
             array_to_string(list_slice(toks, gidx+1, gidx+{DECONTAM_N}), ' ') AS gram
      FROM (SELECT doc_id, toks, unnest(range(len(toks)-{DECONTAM_N - 1})) AS gidx
            FROM t WHERE len(toks) >= {DECONTAM_N})
    ),
    bench AS (SELECT DISTINCT gram FROM grams
              WHERE doc_id % {BENCH_MOD} = {BENCH_REM}),
    tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS total_grams
            FROM grams GROUP BY doc_id),
    hits AS (SELECT g.doc_id, CAST(count(DISTINCT g.gram) AS BIGINT) AS hit_grams
             FROM grams g JOIN bench b ON g.gram = b.gram GROUP BY g.doc_id)
    SELECT d.doc_id AS doc_id,
           coalesce(t.total_grams, 0) AS total_grams,
           coalesce(h.hit_grams, 0) AS hit_grams,
           (coalesce(h.hit_grams, 0) >= 1) AS contaminated,
           (d.doc_id % {BENCH_MOD} = {BENCH_REM}) AS is_bench_source
    FROM documents d
    LEFT JOIN tot t ON d.doc_id = t.doc_id
    LEFT JOIN hits h ON d.doc_id = h.doc_id
    """,
    doc=f"GPT-3/PaLM-style decontamination: a doc is contaminated if it "
    f"shares any {DECONTAM_N}-token gram with the benchmark corpus "
    f"(docs with id % {BENCH_MOD} = {BENCH_REM} stand in for the eval "
    "suites). The benchmark gram set is broadcast, so the corpus scan "
    "stays map-side; the only exchange is the per-doc count.",
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bench = trainprep.token_ngrams(
        d.where(F.col("doc_id") % BENCH_MOD == BENCH_REM),
        "doc_id", "text", DECONTAM_N,
    ).select("gram")
    rep = trainprep.ngram_decontaminate(d, bench, "doc_id", "text", DECONTAM_N)
    return rep.select(
        "doc_id", "total_grams", "hit_grams", "contaminated",
        (F.col("doc_id") % BENCH_MOD == BENCH_REM).alias("is_bench_source"),
    )


# ---------------------------------------------------------------------------
# text_tfidf_topterms — corpus-statistics term scoring
# ---------------------------------------------------------------------------
TFIDF_TOPK = 3


@register(
    "text_tfidf_topterms",
    oracle=f"""
    WITH t AS (SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents),
    tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
           FROM t GROUP BY doc_id, term),
    df AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
           FROM t GROUP BY term),
    n AS (SELECT count(*) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             round(tf.tf * ln((n.n + 1.0) / (df.df + 1.0)), 4) AS tfidf
      FROM tf JOIN df USING(term) CROSS JOIN n
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term) AS rk
      FROM scored
    )
    SELECT doc_id, term, tf, df, tfidf, CAST(rk AS INTEGER) AS rk
    FROM ranked WHERE rk <= {TFIDF_TOPK}
    """,
    doc=f"Per-doc top-{TFIDF_TOPK} tf-idf terms (smoothed idf "
    "ln((N+1)/(df+1))): the classic two-pass corpus statistic — one "
    "term-keyed aggregate builds the document-frequency table, the "
    "doc-count reduces to a single broadcast row, and the per-doc "
    "ranking window bounds output map-side (WindowGroupLimit on the "
    "literal rank). No driver-side state; both aggregates shuffle on "
    "uniform keys (doc, term).",
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.explode(
            F.split(F.trim(F.col("text")), trainprep.TOKEN_SPLIT_REGEX)
        ).alias("term"),
    ).persist()  # tf and df both derive from the token explode
    tf = t.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfc = t.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(dfc, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)), 4
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TFIDF_TOPK)
        .select("doc_id", "term", "tf", "df", "tfidf", "rk")
    )


# ---------------------------------------------------------------------------
# dedup_connected_components — pairs → clusters → representatives
# ---------------------------------------------------------------------------
def _cc_steps(iters: int) -> str:
    steps = []
    for i in range(1, iters + 1):
        prev = f"l{i - 1}"
        steps.append(f"""
    l{i} AS (
      SELECT l.node AS node, least(l.comp, coalesce(m.nbr, l.comp)) AS comp
      FROM {prev} l LEFT JOIN (
        SELECT s.dst AS dst, min(x.comp) AS nbr
        FROM sym s JOIN {prev} x ON s.src = x.node GROUP BY s.dst
      ) m ON l.node = m.dst
    )""")
    return ",".join(steps)


@register(
    "dedup_connected_components",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sigs AS (
      SELECT doc_id,
             {_SIG_COLS}
      FROM sh GROUP BY doc_id
    ),
    bands AS (
{_BAND_SELECTS}
    ),
    edges AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
      WHERE a.doc_id < b.doc_id
    ),
    sym AS (SELECT id_a AS src, id_b AS dst FROM edges
            UNION ALL SELECT id_b AS src, id_a AS dst FROM edges),
    l0 AS (SELECT DISTINCT src AS node, src AS comp FROM sym),{_cc_steps(CC_ITERS)}
    SELECT node AS doc_id, comp AS component,
           (node = comp) AS is_representative
    FROM l{CC_ITERS}
    """,
    doc=f"Duplicate-graph connected components over the MinHash-LSH "
    f"candidate edges: {CC_ITERS} unrolled rounds of min-label "
    "propagation (Hash-to-Min) turn duplicate PAIRS into duplicate "
    "CLUSTERS with a deterministic min-id representative — the final "
    "grouping pass every pair-emitting dedup needs before keep/drop. "
    "Each round is one src-keyed join + one dst-keyed aggregate over "
    "the sparse edge list; near-dup clusters are star/clique shaped "
    "so the fixed unroll is exact for the dedup diameter.",
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(
        d, "doc_id", "text", n=SHINGLE_N, num_hashes=NUM_HASHES
    )
    edges = dedup.lsh_candidate_pairs(
        sigs, "doc_id", num_hashes=NUM_HASHES, band_size=BAND_SIZE
    )
    labels = trainprep.connected_components(edges, "id_a", "id_b", CC_ITERS)
    return labels.select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("component"),
        (F.col("node") == F.col("comp")).alias("is_representative"),
    )


# ---------------------------------------------------------------------------
# dedup_semantic_clusters — SemDeDup over the IVF codebook
# ---------------------------------------------------------------------------
@register(
    "dedup_semantic_clusters",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS cvec
      FROM embeddings WHERE vec_id < {K_CENTROIDS}
    ),
    assigned AS (
      SELECT vec_id, embedding, cent_id,
             {_sql_cos('embedding', 'cvec')} AS cos_c,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY {_sql_cos('embedding', 'cvec')} DESC,
                                         cent_id) AS rk
      FROM embeddings CROSS JOIN cents
    ),
    lists AS (SELECT vec_id, embedding, cent_id AS cluster,
                     cos_c AS cos_centroid
              FROM assigned WHERE rk = 1),
    dropped AS (
      SELECT DISTINCT b.vec_id AS vec_id
      FROM lists a JOIN lists b
        ON a.cluster = b.cluster AND a.vec_id != b.vec_id
      WHERE {_sql_cos('a.embedding', 'b.embedding')} >= {SEM_THRESHOLD}
        AND (a.cos_centroid < b.cos_centroid
             OR (a.cos_centroid = b.cos_centroid AND a.vec_id < b.vec_id))
    )
    SELECT l.vec_id AS vec_id, l.cluster AS cluster,
           l.cos_centroid AS cos_centroid,
           (d.vec_id IS NULL) AS kept
    FROM lists l LEFT JOIN dropped d ON l.vec_id = d.vec_id
    """,
    doc=f"SemDeDup (Abbas et al. 2023): cluster embeddings on the "
    f"deterministic {K_CENTROIDS}-centroid IVF codebook, then within "
    f"each cluster drop vectors with cosine >= {SEM_THRESHOLD} to a "
    "kept neighbor, keeping the member farthest from its centroid. "
    "Exact cosine work is confined to within-cluster pairs (~n^1.5/K "
    "total with K≈√n) — the same inverted-list scale shape as the IVF "
    "ANN family, never an all-pairs join.",
)
def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return trainprep.semantic_dedup(
        e, "vec_id", "embedding", K_CENTROIDS, SEM_THRESHOLD
    )


# ---------------------------------------------------------------------------
# text_corpus_prep_decision — the composed keep/drop flagship
# ---------------------------------------------------------------------------
# The whole corpus-prep pass as ONE plan: every doc gets a keep/drop
# decision with a reason, in drop-precedence order near_dup (MinHash
# cluster non-representative) > contaminated (benchmark gram overlap)
# > boilerplate (duplicate-paragraph mass) > too_short. This is the
# query a 100 TB pipeline actually ships — the building blocks above
# are its independently-verified stages, and Catalyst fuses them into
# doc_id-keyed joins of per-doc aggregates.

MIN_TOKENS = 30
BOILER_FRAC = 0.5


@register(
    "text_corpus_prep_decision",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    sigs AS (
      SELECT doc_id,
             {_SIG_COLS}
      FROM sh GROUP BY doc_id
    ),
    bands AS (
{_BAND_SELECTS}
    ),
    edges AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
      WHERE a.doc_id < b.doc_id
    ),
    sym AS (SELECT id_a AS src, id_b AS dst FROM edges
            UNION ALL SELECT id_b AS src, id_a AS dst FROM edges),
    l0 AS (SELECT DISTINCT src AS node, src AS comp FROM sym),{_cc_steps(CC_ITERS)},
    t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    paras AS (
      SELECT doc_id, pidx,
             array_to_string(list_slice(toks, pidx*{PARA_TOKENS}+1,
                                        pidx*{PARA_TOKENS}+{PARA_TOKENS}), ' ') AS para
      FROM (SELECT doc_id, toks,
                   unnest(range(CAST(floor(len(toks)/{PARA_TOKENS}) AS BIGINT))) AS pidx
            FROM t)
    ),
    marked AS (
      SELECT doc_id,
             (row_number() OVER (PARTITION BY md5(para)
                                 ORDER BY doc_id, pidx) = 1) AS keep
      FROM paras
    ),
    pfrac AS (
      SELECT doc_id,
             round(count(*) FILTER (WHERE NOT keep) * 1.0 / count(*), 4) AS dupf
      FROM marked GROUP BY doc_id
    ),
    grams AS (
      SELECT doc_id, gidx,
             array_to_string(list_slice(toks, gidx+1, gidx+{DECONTAM_N}), ' ') AS gram
      FROM (SELECT doc_id, toks, unnest(range(len(toks)-{DECONTAM_N - 1})) AS gidx
            FROM t WHERE len(toks) >= {DECONTAM_N})
    ),
    bench AS (SELECT DISTINCT gram FROM grams
              WHERE doc_id % {BENCH_MOD} = {BENCH_REM}),
    hits AS (SELECT DISTINCT g.doc_id FROM grams g
             JOIN bench b ON g.gram = b.gram),
    feat AS (
      SELECT d.doc_id AS doc_id,
             CAST(len({_TOKS_SQL}) AS BIGINT) AS n_tokens,
             coalesce(p.dupf, 0.0) AS dup_para_fraction,
             (h.doc_id IS NOT NULL) AS contaminated,
             (c.comp IS NOT NULL AND c.comp != d.doc_id) AS near_dup
      FROM documents d
      LEFT JOIN pfrac p ON d.doc_id = p.doc_id
      LEFT JOIN hits h ON d.doc_id = h.doc_id
      LEFT JOIN (SELECT node, comp FROM l{CC_ITERS}) c ON d.doc_id = c.node
    )
    SELECT doc_id, n_tokens, dup_para_fraction, contaminated, near_dup,
           CASE WHEN near_dup THEN 'near_dup'
                WHEN contaminated THEN 'contaminated'
                WHEN dup_para_fraction > {BOILER_FRAC} THEN 'boilerplate'
                WHEN n_tokens < {MIN_TOKENS} THEN 'too_short'
                ELSE 'keep' END AS reason,
           (NOT near_dup AND NOT contaminated
            AND dup_para_fraction <= {BOILER_FRAC}
            AND n_tokens >= {MIN_TOKENS}) AS keep
    FROM feat
    """,
    doc="The composed corpus-prep flagship: per-doc keep/drop with a "
    "reason, precedence near_dup (MinHash cluster non-representative) "
    "> contaminated (benchmark gram hit) > boilerplate "
    f"(dup-paragraph fraction > {BOILER_FRAC}) > too_short "
    f"(< {MIN_TOKENS} tokens). One plan of doc_id-keyed joins over "
    "per-doc aggregates — every stage independently driver-verified "
    "by the four queries above. near_dup / contaminated / too_short / "
    "keep all fire on the fixture; boilerplate is shadowed there "
    "(every dup-paragraph doc is also an LSH near-dup, which "
    "outranks it) but the stage itself is pinned by "
    "text_paragraph_dedup and tests/test_trainprep.py.",
)
def text_corpus_prep_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(
        d, "doc_id", "text", n=SHINGLE_N, num_hashes=NUM_HASHES
    )
    edges = dedup.lsh_candidate_pairs(
        sigs, "doc_id", num_hashes=NUM_HASHES, band_size=BAND_SIZE
    )
    comp = trainprep.connected_components(edges, "id_a", "id_b", CC_ITERS)
    pfrac = trainprep.paragraph_dedup(d, "doc_id", "text", PARA_TOKENS).select(
        "doc_id", "dup_para_fraction"
    )
    bench = trainprep.token_ngrams(
        d.where(F.col("doc_id") % BENCH_MOD == BENCH_REM),
        "doc_id", "text", DECONTAM_N,
    ).select("gram")
    dec = trainprep.ngram_decontaminate(
        d, bench, "doc_id", "text", DECONTAM_N
    ).select("doc_id", "contaminated")
    toks = F.split(F.trim(F.col("text")), trainprep.TOKEN_SPLIT_REGEX)
    feat = (
        d.select("doc_id", F.size(toks).cast("long").alias("n_tokens"))
        .join(pfrac, "doc_id", "left")
        .join(dec, "doc_id", "left")
        .join(
            comp.select(F.col("node").alias("doc_id"), "comp"), "doc_id", "left"
        )
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("dup_para_fraction", F.lit(0.0)).alias(
                "dup_para_fraction"
            ),
            F.coalesce("contaminated", F.lit(False)).alias("contaminated"),
            (F.col("comp").isNotNull() & (F.col("comp") != F.col("doc_id"))).alias(
                "near_dup"
            ),
        )
    )
    reason = (
        F.when(F.col("near_dup"), "near_dup")
        .when(F.col("contaminated"), "contaminated")
        .when(F.col("dup_para_fraction") > BOILER_FRAC, "boilerplate")
        .when(F.col("n_tokens") < MIN_TOKENS, "too_short")
        .otherwise("keep")
    )
    return feat.select(
        "doc_id", "n_tokens", "dup_para_fraction", "contaminated", "near_dup",
        reason.alias("reason"),
        (
            ~F.col("near_dup") & ~F.col("contaminated")
            & (F.col("dup_para_fraction") <= BOILER_FRAC)
            & (F.col("n_tokens") >= MIN_TOKENS)
        ).alias("keep"),
    )
