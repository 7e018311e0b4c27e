"""Training-data selection queries: quality gating, shard packing,
and importance weighting — the curation stage between a crawled corpus
and a training run.

Reference analog: none — alaamer12/PixCrawler stops at download +
validity checks (validator/integrity.py); these are the operations the
north rule's 100 TB webtext pipeline needs NEXT. Spark-first notes per
query in the docstrings; all three are pure JVM expressions (no Python
in the hot path) with DuckDB oracles built from the same constants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pixcrawler_spark.operators import sketches as sk
from pixcrawler_spark.operators.prefixsum import partitioned_cumsum
from pixcrawler_spark.queries.registry import register
from pixcrawler_spark.sources.tables import load_table

__all__: list[str] = []

_SQL_TOKS = (
    "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')"
)


def _toks() -> Column:
    return F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")


# ---------------------------------------------------------------------------
# text_gopher_rules — MassiveText/Gopher-style per-doc quality gates
# ---------------------------------------------------------------------------
GOPHER_MIN_WORDS = 40
GOPHER_MAX_WORDS = 100_000
GOPHER_MEAN_LEN_MIN = 3.0
GOPHER_MEAN_LEN_MAX = 10.0
GOPHER_STOP_MIN = 2
GOPHER_STOPWORDS = ["the", "and", "to", "of", "a", "in", "is", "that"]
_SQL_STOPLIST = "[" + ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS) + "]"


@register(
    "text_gopher_rules",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
    ), s AS (
      SELECT doc_id,
             len(toks)::BIGINT AS n_words,
             ROUND(CASE WHEN len(toks) > 0 THEN
               list_sum(list_transform(toks, x -> length(x)))::DOUBLE
                 / len(toks)
             ELSE 0 END, 4) AS mean_word_len,
             len(list_filter(
               toks, x -> list_contains({_SQL_STOPLIST}, x)
             ))::BIGINT AS stopword_hits
      FROM t
    )
    SELECT doc_id, n_words, mean_word_len, stopword_hits,
           (n_words >= {GOPHER_MIN_WORDS}
              AND n_words <= {GOPHER_MAX_WORDS}) AS ok_word_count,
           (mean_word_len >= {GOPHER_MEAN_LEN_MIN!r}
              AND mean_word_len <= {GOPHER_MEAN_LEN_MAX!r}) AS ok_mean_len,
           (stopword_hits >= {GOPHER_STOP_MIN}) AS ok_stopwords,
           (n_words >= {GOPHER_MIN_WORDS}
              AND n_words <= {GOPHER_MAX_WORDS}
              AND mean_word_len >= {GOPHER_MEAN_LEN_MIN!r}
              AND mean_word_len <= {GOPHER_MEAN_LEN_MAX!r}
              AND stopword_hits >= {GOPHER_STOP_MIN}) AS keep
    FROM s
    """,
    doc="Gopher/MassiveText structural quality gates (Rae et al. 2021 "
    "§A1.1 subset): word-count bounds, mean-word-length bounds, "
    "minimum stopword hits — the cheap first filter of every LLM "
    "corpus pipeline, complementing text_repetition_quality's "
    "repetition gates. Narrow map over the scan, zero shuffle, all "
    "JVM array folds; at 100 TB this is the filter you push FIRST so "
    "everything downstream reads fewer rows.",
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = _toks()
    base = d.select("doc_id", toks.alias("toks"))
    n = F.size("toks")
    mean_len = F.round(
        F.when(
            n > 0,
            F.aggregate(
                F.col("toks"), F.lit(0).cast("bigint"), lambda a, t: a + F.length(t)
            ).cast("double")
            / n,
        ).otherwise(F.lit(0.0)),
        4,
    )
    stop_hits = F.size(
        F.filter(F.col("toks"), lambda t: t.isin(*GOPHER_STOPWORDS))
    )
    s = base.select(
        "doc_id",
        n.cast("bigint").alias("n_words"),
        mean_len.alias("mean_word_len"),
        stop_hits.cast("bigint").alias("stopword_hits"),
    )
    ok_count = (F.col("n_words") >= GOPHER_MIN_WORDS) & (
        F.col("n_words") <= GOPHER_MAX_WORDS
    )
    ok_mean = (F.col("mean_word_len") >= GOPHER_MEAN_LEN_MIN) & (
        F.col("mean_word_len") <= GOPHER_MEAN_LEN_MAX
    )
    ok_stop = F.col("stopword_hits") >= GOPHER_STOP_MIN
    return s.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "stopword_hits",
        ok_count.alias("ok_word_count"),
        ok_mean.alias("ok_mean_len"),
        ok_stop.alias("ok_stopwords"),
        (ok_count & ok_mean & ok_stop).alias("keep"),
    )


# ---------------------------------------------------------------------------
# train_shard_pack — token-budget shard assignment via two-phase scan
# ---------------------------------------------------------------------------
SHARD_TOKENS = 2000  # tokens per training shard (per language)
PS_BUCKET_WIDTH = 64  # prefix-sum bucket width (see operators/prefixsum.py)


@register(
    "train_shard_pack",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, lang, len({_SQL_TOKS})::BIGINT AS n_tok
      FROM documents
    ), c AS (
      SELECT doc_id, lang, n_tok,
             COALESCE(SUM(n_tok) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS cum_before
      FROM docs
    )
    SELECT lang,
           CAST(floor(cum_before / {float(SHARD_TOKENS)!r}) AS BIGINT)
             AS shard_id,
           COUNT(*)::BIGINT AS n_docs,
           SUM(n_tok)::BIGINT AS shard_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM c
    GROUP BY lang, shard_id
    """,
    doc="Deterministic token-budget shard packing: per language, docs "
    "in doc_id order are packed into ~{}-token training shards — the "
    "write layout step before tokenization. The running token total "
    "is operators/prefixsum.partitioned_cumsum, a TWO-PHASE scan "
    "(per-bucket sums -> tiny bucket-frame prefix -> within-bucket "
    "window), not a naive one-task-per-language window: no task ever "
    "holds more than bucket_width rows, so the plan survives a "
    "language with 10^10 documents. Exactness vs the naive window is "
    "pytest-asserted; here the DuckDB window IS the oracle.".format(
        SHARD_TOKENS
    ),
)
def train_shard_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id", "lang", F.size(_toks()).cast("bigint").alias("n_tok")
    )
    c = partitioned_cumsum(
        docs,
        ["lang"],
        "doc_id",
        "n_tok",
        bucket_width=PS_BUCKET_WIDTH,
    )
    shard = F.floor(F.col("cum_before") / float(SHARD_TOKENS)).cast("bigint")
    return (
        c.withColumn("shard_id", shard)
        .groupBy("lang", "shard_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("shard_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


# ---------------------------------------------------------------------------
# text_dsir_importance — hashed-bigram importance weights (DSIR-style)
# ---------------------------------------------------------------------------
DSIR_BUCKETS = 4096
DSIR_TARGET_LANG = "en"  # the corpus slice standing in for the target dist


@register(
    "text_dsir_importance",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, {_SQL_TOKS} AS toks FROM documents
    ), g AS (
      SELECT doc_id, lang,
        CASE WHEN len(toks) >= 2 THEN
          list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
        ELSE [] END AS bi
      FROM t
    ), f AS (
      SELECT doc_id, lang,
             {sk.sql_h60("'ds:' || bg")} % {DSIR_BUCKETS} AS b
      FROM (SELECT doc_id, lang, unnest(bi) AS bg FROM g)
    ), raw AS (
      SELECT b, COUNT(*)::BIGINT AS r FROM f GROUP BY b
    ), tgt AS (
      SELECT b, COUNT(*)::BIGINT AS t FROM f
      WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY b
    ), dim AS (
      SELECT raw.b AS b, r, COALESCE(t, 0) AS t
      FROM raw LEFT JOIN tgt ON raw.b = tgt.b
    ), tot AS (
      SELECT SUM(r)::BIGINT AS tr, SUM(t)::BIGINT AS tt FROM dim
    ), w AS (
      SELECT b,
             ln(((t + 1.0) * (tr + {DSIR_BUCKETS}))
                / ((r + 1.0) * (tt + {DSIR_BUCKETS}))) AS w
      FROM dim, tot
    ), s AS (
      SELECT doc_id, COUNT(*)::BIGINT AS n_feats, SUM(w) AS sc
      FROM f JOIN w USING (b) GROUP BY doc_id
    )
    SELECT d.doc_id AS doc_id,
           COALESCE(n_feats, 0) AS n_feats,
           ROUND(COALESCE(sc, 0), 4) AS importance,
           COALESCE(sc, 0) > 0 AS selected
    FROM documents d LEFT JOIN s USING (doc_id)
    """,
    doc="DSIR-style data selection (Xie et al. 2023, 'Data Selection "
    "for Language Models via Importance Resampling'): hashed-bigram "
    "features ({} buckets, portable 60-bit hash), importance weight = "
    "sum of log-likelihood ratios between a target distribution (the "
    "'{}' slice as the target proxy) and the raw corpus, add-1 "
    "smoothed. Plan: one bigram explode (same cost class as span "
    "dedup), two <= {}-row count dims joined and BROADCAST back onto "
    "the feature stream, one doc_id-keyed sum — per-key cardinality "
    "bounded by doc length, no hot keys, no Python.".format(
        DSIR_BUCKETS, DSIR_TARGET_LANG, DSIR_BUCKETS
    ),
)
def text_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = _toks()
    base = d.select("doc_id", "lang", toks.alias("toks"))
    n = F.size("toks")
    bi = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("toks"), i + 1),
                F.element_at(F.col("toks"), i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = base.select(
        "doc_id", "lang", F.explode(bi).alias("bg")
    ).select(
        "doc_id",
        "lang",
        (sk.h60(F.concat(F.lit("ds:"), F.col("bg"))) % DSIR_BUCKETS).alias(
            "b"
        ),
    )
    raw = feats.groupBy("b").agg(F.count(F.lit(1)).cast("bigint").alias("r"))
    tgt = (
        feats.where(F.col("lang") == DSIR_TARGET_LANG)
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    )
    dim = raw.join(tgt, "b", "left").select(
        "b", "r", F.coalesce("t", F.lit(0).cast("bigint")).alias("t")
    )
    tot = dim.agg(
        F.sum("r").cast("bigint").alias("tr"),
        F.sum("t").cast("bigint").alias("tt"),
    )
    w = dim.crossJoin(F.broadcast(tot)).select(
        "b",
        F.log(
            ((F.col("t") + 1.0) * (F.col("tr") + DSIR_BUCKETS))
            / ((F.col("r") + 1.0) * (F.col("tt") + DSIR_BUCKETS))
        ).alias("w"),
    )
    s = (
        feats.join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_feats"),
            F.sum("w").alias("sc"),
        )
    )
    return d.select("doc_id").join(s, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_feats", F.lit(0).cast("bigint")).alias("n_feats"),
        F.round(F.coalesce("sc", F.lit(0.0)), 4).alias("importance"),
        (F.coalesce("sc", F.lit(0.0)) > 0).alias("selected"),
    )
