"""Round-5 batch: Neyman-allocated stratified sampling and keyword
typo deduplication (blocked edit distance).

- ``sample_neyman_allocation``: variance-optimal stratified sampling
  (Cochran): a fixed label/QA budget B is allocated across language
  strata proportional to N_h x S_h (stratum size x stratum stddev of
  the target metric) — high-variance strata earn more samples, which
  minimizes the variance of the stratified mean estimator under the
  budget. The selection within each stratum is an exact-size top-n_h
  by deterministic hash order, so the sample is reproducible across
  engines and cluster sizes (the A-ES/holdout property).
- ``dedup_keyword_typos``: the keyword-variation cleanup the
  reference's keyword manager needs but never had (builder/core
  generates variations; nothing ever dedups near-identical ones):
  single-edit typo pairs found by BLOCKED edit distance — block on
  (first char), band on length +/-1, verify levenshtein <= 1 inside
  the block — never an all-pairs comparison. Typos are planted
  deterministically on the part-name vocabulary (both engines) so
  the blocking + verify machinery is what's verified.

Scale design (100 TB / 1000 executors):
- neyman: one stats aggregation over the corpus (map-side partials),
  a <=|strata|-row allocation dim broadcast back, and a per-stratum
  WindowGroupLimit top-n_h (map-side partial top-K, O(n_h) state per
  task). The floor() of the allocation runs on a round(.,6)-stabilized
  ratio so an ulp of stddev drift cannot flip a boundary.
- typos: the self-join keys on the block (first char here; first
  char + length band at vocabulary scale), so candidate pairs are
  bounded per block; levenshtein runs only inside blocks. Keyword
  vocabularies are dim-sized (millions, not corpus-sized) — the
  block join is broadcastable end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pixcrawler_spark.operators import sketches as sk
from pixcrawler_spark.queries.registry import register
from pixcrawler_spark.sources.tables import load_table

__all__: list[str] = []


# ---------------------------------------------------------------------------
# sample_neyman_allocation — variance-optimal stratified sampling
# ---------------------------------------------------------------------------
NEY_BUDGET = 100

_NEY_U_SQL = "('0x' || substr(md5('ney:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"


@register(
    "sample_neyman_allocation",
    oracle=f"""
    WITH stats AS (
      SELECT lang,
             CAST(count(*) AS BIGINT) AS n_h,
             stddev_samp(n_chars) AS s_h
      FROM documents GROUP BY lang
    ),
    alloc AS (
      SELECT lang, n_h,
             CAST(floor(round({NEY_BUDGET} * (n_h * s_h)
                   / sum(n_h * s_h) OVER (), 6)) AS BIGINT) AS n_alloc
      FROM stats
    ),
    ranked AS (
      SELECT d.doc_id, d.lang, a.n_alloc,
             row_number() OVER (
               PARTITION BY d.lang
               ORDER BY {_NEY_U_SQL}, d.doc_id
             ) AS rn
      FROM documents d JOIN alloc a ON a.lang = d.lang
    )
    SELECT lang, CAST(n_alloc AS BIGINT) AS n_alloc, doc_id
    FROM ranked WHERE rn <= n_alloc
    """,
    doc=f"Neyman-allocated stratified sample (budget {NEY_BUDGET}): "
    "each language stratum gets floor(B * N_h*S_h / sum N_h*S_h) "
    "slots — proportional to size x stddev of n_chars, the "
    "allocation that minimizes the stratified-mean variance under a "
    "fixed budget (Cochran). Selection is exact-size top-n_h by "
    "deterministic hash order (WindowGroupLimit, map-side partial "
    "top-K), so the sample is reproducible at any cluster size; the "
    "allocation floor runs on a round(.,6)-stabilized ratio so an "
    "ulp of stddev drift cannot flip a slot across engines.",
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    stats = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_h"),
        F.stddev_samp("n_chars").alias("s_h"),
    )
    tot = stats.agg(
        F.sum(F.col("n_h") * F.col("s_h")).alias("tot_ns")
    )
    alloc = (
        stats.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            F.floor(
                F.round(
                    NEY_BUDGET * (F.col("n_h") * F.col("s_h"))
                    / F.col("tot_ns"),
                    6,
                )
            )
            .cast("bigint")
            .alias("n_alloc"),
        )
    )
    u = sk.h60(F.concat(F.lit("ney:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(u.asc(), F.col("doc_id").asc())
    return (
        d.join(F.broadcast(alloc), "lang")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= F.col("n_alloc"))
        .select("lang", "n_alloc", "doc_id")
    )


# ---------------------------------------------------------------------------
# dedup_keyword_typos — blocked edit-distance keyword cleanup
# ---------------------------------------------------------------------------
# The operator runs on the DISTINCT keyword VOCABULARY, not occurrence
# rows: part names repeat ~300x at sf0.1, and pairing occurrences
# would emit C(m,2) rows per duplicated string — the quadratic
# pair-listing anti-pattern the dedup family exists to avoid.
# Planted typo: every 3rd vocabulary word (hash-selected) gets a
# one-char-deleted variant (deleted position >= 2, so the blocking
# first char survives). IDs are salted 60-bit hashes of the string.
_KW_H = sk.sql_h60("'kw:' || kw")
_KW_HT = sk.sql_h60("'kwt:' || kw")
_KW_POS = f"(1 + {_KW_H} % (length(kw) - 2))"
_KW_BASE_SQL = f"""
    vocab AS (SELECT DISTINCT p_name AS kw FROM part),
    kw AS (
      SELECT {_KW_H} AS kw_id, kw FROM vocab
      UNION ALL
      SELECT {_KW_HT} AS kw_id,
             substr(kw, 1, {_KW_POS}) || substr(kw, {_KW_POS} + 2)
               AS kw
      FROM vocab WHERE {_KW_H} % 3 = 0 AND length(kw) > 3
    )
"""


@register(
    "dedup_keyword_typos",
    oracle=f"""
    WITH {_KW_BASE_SQL}
    SELECT a.kw_id AS id_a, b.kw_id AS id_b,
           a.kw AS kw_a, b.kw AS kw_b,
           CAST(levenshtein(a.kw, b.kw) AS BIGINT) AS dist
    FROM kw a JOIN kw b
      ON substr(a.kw, 1, 1) = substr(b.kw, 1, 1)
     AND a.kw_id < b.kw_id
     AND abs(length(a.kw) - length(b.kw)) <= 1
    WHERE levenshtein(a.kw, b.kw) <= 1
    """,
    doc="Keyword typo pairs by BLOCKED edit distance: block on the "
    "first character, band on length +/-1, verify levenshtein <= 1 "
    "inside the block — never an all-pairs scan (at vocabulary scale "
    "the block key widens to first-char + length band, and the whole "
    "join is broadcastable because keyword sets are dim-sized). "
    "Runs on the DISTINCT vocabulary, never occurrence rows — "
    "pairing occurrences would emit C(m,2) rows per duplicated "
    "string, the quadratic listing the dedup family's decision forms "
    "exist to avoid. Typo variants are planted deterministically "
    "(single char deleted at a hash-derived position >= 2, so the "
    "block key survives); the reference generates keyword variations "
    "but never dedups near-identical ones.",
)
def dedup_keyword_typos(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    vocab = p.select(F.col("p_name").alias("kw")).distinct()
    h = sk.h60(F.concat(F.lit("kw:"), F.col("kw")))
    ht = sk.h60(F.concat(F.lit("kwt:"), F.col("kw")))
    base = vocab.select(h.alias("kw_id"), "kw")
    pos = 1 + h % (F.length("kw") - 2)
    typo = (
        vocab.where((h % 3 == 0) & (F.length("kw") > 3))
        .select(
            ht.alias("kw_id"),
            F.concat(
                F.col("kw").substr(F.lit(1), pos),
                F.col("kw").substr(
                    pos + 2, F.length("kw")
                ),
            ).alias("kw"),
        )
    )
    kw = base.unionAll(typo).withColumn(
        "blk", F.substring("kw", 1, 1)
    )
    a = kw.select(
        F.col("kw_id").alias("id_a"), F.col("kw").alias("kw_a"), "blk"
    )
    b = kw.select(
        F.col("kw_id").alias("id_b"), F.col("kw").alias("kw_b"), "blk"
    )
    return (
        a.join(b, "blk")
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (
                F.abs(F.length("kw_a") - F.length("kw_b")) <= 1
            )
        )
        .withColumn(
            "dist",
            F.levenshtein("kw_a", "kw_b").cast("bigint"),
        )
        .where(F.col("dist") <= 1)
        .select("id_a", "id_b", "kw_a", "kw_b", "dist")
    )
