"""Webtext pipeline queries: AI-response keyword parsing, Gopher-style
repetition quality, and SRP-bucketed embedding near-dup pairs.

- ``text_keyword_extract`` closes the last SURVEY §2.8 gap: the
  reference's AI-response keyword extraction
  (builder/_keywords.py:150-220 ``_extract_keywords_from_response`` +
  ``_clean_and_deduplicate_keywords``). The AI *call* stays out of
  scope (the reference's prod path disables it); what this implements
  is the parsing/cleanup semantics — first-``[...]`` list parse with a
  line-by-line fallback, marker/quote stripping, order-preserving
  dedup, category always included — as pure JVM-side column
  expressions. Oracle-by-construction (the queries/media.py pattern):
  the response text is synthesized deterministically per doc in four
  format variants, Spark must EARN the keyword list through the real
  regexp/from_json parse path, and the DuckDB oracle derives the
  expected list arithmetically without parsing anything.
- ``text_repetition_quality``: duplicate-n-gram quality filters in the
  Gopher/MassiveText style (token top-2-gram fraction, duplicate
  3-gram fraction) — per-doc array ops plus one doc_id-keyed
  aggregation, no cross-doc shuffle wider than the doc itself.
- ``dedup_embedding_srp_pairs``: the scale path next to
  ``dedup_embedding_cosine_pairs`` (label-blocked, O(sum block²) by
  caller contract): SRP sign-buckets as the blocking key — candidate
  pairs share a bucket (population ~ n / 2^planes, hash-uniform), then
  exact cosine verify. At 10^10 vectors the bucketed self-join
  replaces any quadratic block; planes derive from corpus size
  (similarity.planes_for), mirroring the ANN family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pixcrawler_spark.operators import similarity
from pixcrawler_spark.queries.pipeline import COSINE_THRESHOLD, _sql_cos
from pixcrawler_spark.queries.registry import register
from pixcrawler_spark.queries.scalepath import N_PLANES, PLANES, _SQL_BUCKET
from pixcrawler_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# text_keyword_extract
# ---------------------------------------------------------------------------
# Synthetic response construction (deterministic in doc_id):
#   category = 'cat' || (doc_id % 7)
#   kwa/kwb/kwc = 'kw' || doc_id || {'a','b','c'}
#   variant doc_id % 4:
#     0  prose with a double-quoted list (kwa repeated → dedup must fire)
#     1  bare single-quoted list (reference eval() accepts; we normalize
#        quotes before from_json)
#     2  bullet lines (-, *, •, quoted) + a '[end]' line the fallback
#        must drop (starts with '[') — note '[end]' is ALSO the first
#        [...] match, so the list-parse attempt fails and the line path
#        must take over, exactly like the reference's eval() failure
#     3  numbered lines with a blank line and a quoted item
# Expected (derived arithmetically in the oracle): category first (never
# present in the synthesized list), then kwa,kwb for variant 0 (the
# repeat deduped) or kwa,kwb,kwc otherwise.


def _kw(doc_id: Column, suffix: str) -> Column:
    return F.concat(F.lit("kw"), doc_id.cast("string"), F.lit(suffix))


def _synth_response(doc_id: Column) -> Column:
    kwa, kwb, kwc = (_kw(doc_id, s) for s in ("a", "b", "c"))
    v = doc_id % 4
    quoted = lambda k, q: F.concat(F.lit(q), k, F.lit(q))  # noqa: E731
    return (
        F.when(v == 0, F.concat(
            F.lit('Sure! Here are keywords: ["'), kwa, F.lit('", "'),
            kwb, F.lit('", "'), kwa, F.lit('"] hope this helps'),
        ))
        .when(v == 1, F.concat(
            F.lit("['"), kwa, F.lit("', '"), kwb, F.lit("', '"),
            kwc, F.lit("']"),
        ))
        .when(v == 2, F.concat(
            F.lit("- "), kwa, F.lit("\n* "), kwb, F.lit("\n• "),
            quoted(kwc, '"'), F.lit("\n[end]"),
        ))
        .otherwise(F.concat(
            F.lit("1. "), kwa, F.lit("\n2. "), kwb, F.lit("\n\n3. "),
            quoted(kwc, '"'),
        ))
    )


def extract_keywords_expr(response: Column, category: Column) -> Column:
    """Reference parse semantics as one column expression
    (builder/_keywords.py:150-220): first ``[...]`` parsed as a list of
    strings (single quotes normalized — the reference's eval() accepts
    both), else line-by-line with marker/number/quote stripping and
    bracket-line exclusion; then trim, drop empties, order-preserving
    dedup, category prepended when absent."""
    bracket = F.regexp_extract(response, r"(?s)\[.*?\]", 0)
    parsed = F.from_json(
        F.regexp_replace(bracket, "'", '"'), "array<string>"
    )
    lines = F.transform(
        F.split(response, "\n"),
        lambda l: F.btrim(
            F.trim(F.regexp_replace(
                F.trim(F.regexp_replace(F.trim(l), r"^[-*•\"]", "")),
                r"^[0-9]+\.", "",
            )),
            F.lit("\"'"),
        ),
    )
    fallback = F.filter(
        lines,
        lambda x: (x != "")
        & ~x.startswith("[")
        & ~x.startswith("]"),
    )
    raw = F.coalesce(parsed, fallback)
    cleaned = F.array_distinct(
        F.filter(F.transform(raw, F.trim), lambda x: x != "")
    )
    return F.when(
        F.array_contains(cleaned, category), cleaned
    ).otherwise(F.concat(F.array(category), cleaned))


@register(
    "text_keyword_extract",
    oracle="""
    SELECT doc_id,
           'cat' || CAST(doc_id % 7 AS VARCHAR) AS category,
           CASE WHEN doc_id % 4 = 0 THEN
             'cat' || CAST(doc_id % 7 AS VARCHAR)
               || '|kw' || CAST(doc_id AS VARCHAR) || 'a'
               || '|kw' || CAST(doc_id AS VARCHAR) || 'b'
           ELSE
             'cat' || CAST(doc_id % 7 AS VARCHAR)
               || '|kw' || CAST(doc_id AS VARCHAR) || 'a'
               || '|kw' || CAST(doc_id AS VARCHAR) || 'b'
               || '|kw' || CAST(doc_id AS VARCHAR) || 'c'
           END AS kw_list,
           CAST(CASE WHEN doc_id % 4 = 0 THEN 3 ELSE 4 END AS BIGINT)
             AS n_keywords
    FROM documents
    """,
    doc="AI-response keyword extraction (reference "
    "builder/_keywords.py:150-220) over synthesized 4-variant "
    "responses; oracle-by-construction — the expected list is "
    "md5-free arithmetic, Spark must earn it through the real "
    "regexp/from_json/fallback parse path.",
)
def text_keyword_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    doc_id = F.col("doc_id")
    category = F.concat(F.lit("cat"), (doc_id % 7).cast("string"))
    kws = extract_keywords_expr(_synth_response(doc_id), category)
    return d.select(
        "doc_id",
        category.alias("category"),
        F.concat_ws("|", kws).alias("kw_list"),
        F.size(kws).cast("long").alias("n_keywords"),
    )


# ---------------------------------------------------------------------------
# text_repetition_quality
# ---------------------------------------------------------------------------
TOP_BIGRAM_MAX = 0.18   # Gopher-style repetition gates (token-count
DUP_TRIGRAM_MAX = 0.30  # variant of the MassiveText character gates)

_SQL_TOKS = "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')"


@register(
    "text_repetition_quality",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
    ), g AS (
      SELECT doc_id, len(toks) AS n,
        CASE WHEN len(toks) >= 2 THEN
          list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
        ELSE [] END AS bi,
        CASE WHEN len(toks) >= 3 THEN
          list_transform(range(1, len(toks) - 1),
                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        ELSE [] END AS tri
      FROM t
    ), bstat AS (
      SELECT doc_id, CAST(max(c) AS DOUBLE) AS mx, CAST(sum(c) AS DOUBLE) AS tot
      FROM (
        SELECT doc_id, bg, count(*) AS c
        FROM (SELECT doc_id, unnest(bi) AS bg FROM g)
        GROUP BY doc_id, bg
      ) GROUP BY doc_id
    ), j AS (
      SELECT g.doc_id AS doc_id, CAST(g.n AS BIGINT) AS n_tokens,
        round(COALESCE(bstat.mx / bstat.tot, 0), 4) AS top_bigram_frac,
        round(CASE WHEN len(g.tri) > 0 THEN
          (len(g.tri) - len(list_distinct(g.tri))) / CAST(len(g.tri) AS DOUBLE)
        ELSE 0 END, 4) AS dup_trigram_frac
      FROM g LEFT JOIN bstat ON g.doc_id = bstat.doc_id
    )
    SELECT doc_id, n_tokens, top_bigram_frac, dup_trigram_frac,
           (top_bigram_frac > {TOP_BIGRAM_MAX}
            OR dup_trigram_frac > {DUP_TRIGRAM_MAX}) AS repetitive
    FROM j
    """,
    doc="Gopher-style repetition quality: per-doc top-2-gram token "
    "fraction and duplicate-3-gram fraction with a repetitive flag. "
    "Trigram dedup is a pure array op (no shuffle); the bigram mode "
    "needs one doc_id-keyed aggregation — per-key cardinality is "
    "bounded by doc length, so no key is ever hotter than one doc.",
)
def text_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != ""
    )
    n = F.size(toks)
    base = d.select("doc_id", toks.alias("toks"), n.alias("n"))

    def grams(width: int) -> Column:
        idx = F.sequence(F.lit(0), F.col("n") - width)
        mk = lambda i: F.concat_ws(  # noqa: E731
            " ", *[F.element_at(F.col("toks"), i + k + 1) for k in range(width)]
        )
        return F.when(
            F.col("n") >= width, F.transform(idx, mk)
        ).otherwise(F.array().cast("array<string>"))

    g = base.select(
        "doc_id", "n",
        grams(2).alias("bi"), grams(3).alias("tri"),
    )
    bstat = (
        g.select("doc_id", F.explode("bi").alias("bg"))
        .groupBy("doc_id", "bg").count()
        .groupBy("doc_id")
        .agg(
            F.max("count").cast("double").alias("mx"),
            F.sum("count").cast("double").alias("tot"),
        )
    )
    n_tri = F.size("tri")
    top_bi = F.round(F.coalesce(F.col("mx") / F.col("tot"), F.lit(0.0)), 4)
    dup_tri = F.round(
        F.when(
            n_tri > 0,
            (n_tri - F.size(F.array_distinct("tri"))) / n_tri.cast("double"),
        ).otherwise(F.lit(0.0)),
        4,
    )
    return (
        g.join(bstat, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n").cast("long").alias("n_tokens"),
            top_bi.alias("top_bigram_frac"),
            dup_tri.alias("dup_trigram_frac"),
        )
        .withColumn(
            "repetitive",
            (F.col("top_bigram_frac") > TOP_BIGRAM_MAX)
            | (F.col("dup_trigram_frac") > DUP_TRIGRAM_MAX),
        )
    )


# ---------------------------------------------------------------------------
# dedup_embedding_srp_pairs
# ---------------------------------------------------------------------------
@register(
    "dedup_embedding_srp_pairs",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding, {_SQL_BUCKET} AS bucket FROM embeddings
    )
    SELECT a.vec_id AS id_a, c.vec_id AS id_b,
           {_sql_cos('a.embedding', 'c.embedding')} AS cosine
    FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    WHERE {_sql_cos('a.embedding', 'c.embedding')} >= {COSINE_THRESHOLD}
    """,
    doc="SRP-bucketed embedding near-dup pairs: sign-random-projection "
    "buckets as the blocking key (population ~ n/2^planes, "
    "hash-uniform, planes derived via similarity.planes_for), exact "
    "cosine verify within buckets — the 10^10-scale path next to the "
    "label-blocked dedup_embedding_cosine_pairs.",
)
def dedup_embedding_srp_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    b = e.select(
        "vec_id", "embedding",
        similarity.srp_bucket_expr("embedding", PLANES[:N_PLANES]).alias("bucket"),
    ).persist()  # both self-join sides: compute the plane dots once
    a, c = b.alias("a"), b.alias("c")
    cos = F.round(
        similarity.cosine_expr(F.col("a.embedding"), F.col("c.embedding")), 6
    )
    return (
        a.join(
            c,
            (F.col("a.bucket") == F.col("c.bucket"))
            & (F.col("a.vec_id") < F.col("c.vec_id")),
        )
        .where(cos >= COSINE_THRESHOLD)
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("c.vec_id").alias("id_b"),
            cos.alias("cosine"),
        )
    )
