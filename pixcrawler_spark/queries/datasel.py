"""Training-data selection queries: quality gating, shard packing,
and importance weighting — the curation stage between a crawled corpus
and a training run.

Reference analog: none — alaamer12/PixCrawler stops at download +
validity checks (validator/integrity.py); these are the operations the
north rule's 100 TB webtext pipeline needs NEXT. Spark-first notes per
query in the docstrings; every query is pure JVM expressions (no
Python in the hot path) with DuckDB oracles built from the same
constants.
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


# ---------------------------------------------------------------------------
# train_chunk_windows — fixed-token-window chunking with stride
# ---------------------------------------------------------------------------
CHUNK_TOKENS = 128
CHUNK_STRIDE = 96  # 32-token overlap between consecutive windows


@register(
    "train_chunk_windows",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
    ), s AS (
      SELECT doc_id, toks, len(toks)::BIGINT AS n,
             CASE WHEN len(toks) = 0 THEN 0 ELSE
               1 + (greatest(len(toks) - {CHUNK_TOKENS}, 0)
                    + {CHUNK_STRIDE} - 1) // {CHUNK_STRIDE}
             END AS n_chunks
      FROM t
    ), c AS (
      SELECT doc_id, unnest(range(0, n_chunks)) AS chunk_id
      FROM s
    )
    SELECT c.doc_id AS doc_id,
           chunk_id::BIGINT AS chunk_id,
           (chunk_id * {CHUNK_STRIDE})::BIGINT AS start_tok,
           least({CHUNK_TOKENS}, s.n - chunk_id * {CHUNK_STRIDE})::BIGINT
             AS n_chunk_tokens,
           {sk.sql_h60(
               "array_to_string(list_slice(s.toks, "
               f"chunk_id * {CHUNK_STRIDE} + 1, "
               f"chunk_id * {CHUNK_STRIDE} + least({CHUNK_TOKENS}, "
               f"s.n - chunk_id * {CHUNK_STRIDE})), ' ')"
           )} AS chunk_hash
    FROM c JOIN s ON c.doc_id = s.doc_id
    """,
    doc="Training-window chunking: each doc's token stream cut into "
    f"{CHUNK_TOKENS}-token windows at stride {CHUNK_STRIDE} (the "
    "context-window packing step before tokenized shard writes), with "
    "a portable 60-bit content hash per chunk so chunk-level dedup "
    "can run downstream. One narrow map + explode, zero shuffle; "
    "chunk counts are bounded by doc length so the explode factor is "
    "uniform — no skew at 100 TB.",
)
def train_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    base = d.select("doc_id", _toks().alias("toks"))
    n = F.size("toks")
    n_chunks = F.when(n == 0, F.lit(0)).otherwise(
        1
        + F.floor(
            (F.greatest(n - CHUNK_TOKENS, F.lit(0)) + CHUNK_STRIDE - 1)
            / CHUNK_STRIDE
        ).cast("int")
    )
    s = base.select("doc_id", "toks", n.cast("bigint").alias("n"), n_chunks.alias("n_chunks"))
    c = s.select(
        "doc_id",
        "toks",
        "n",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_id"),
    ).where(F.col("n_chunks") > 0)
    start = F.col("chunk_id") * CHUNK_STRIDE
    clen = F.least(F.lit(CHUNK_TOKENS).cast("bigint"), F.col("n") - start)
    chunk = F.slice(F.col("toks"), (start + 1).cast("int"), clen.cast("int"))
    return c.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        start.cast("bigint").alias("start_tok"),
        clen.cast("bigint").alias("n_chunk_tokens"),
        sk.h60(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )


# ---------------------------------------------------------------------------
# sample_lang_temperature — temperature-based language resampling
# ---------------------------------------------------------------------------
# alpha = 0.5 (rate proportional to sqrt of the language's token share).
# sqrt is IEEE correctly-rounded in BOTH engines, so the keep threshold
# floor(rate * 1e6) is bit-identical across Spark and DuckDB — unlike a
# pow()-based temperature, which can differ by 1 ulp between libms.
_TEMP_KEY = "'tmp:' || CAST(doc_id AS VARCHAR)"
_TEMP_U = f"{sk.sql_h60(_TEMP_KEY)} % 1000000"


@register(
    "sample_lang_temperature",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, lang, len({_SQL_TOKS})::BIGINT AS n_tok,
             {_TEMP_U} AS u
      FROM documents
    ), tot AS (
      SELECT lang, COUNT(*)::BIGINT AS n_docs,
             SUM(n_tok)::BIGINT AS total_tokens
      FROM docs GROUP BY lang
    ), mx AS (
      SELECT MAX(total_tokens)::BIGINT AS max_tokens FROM tot
    ), rated AS (
      SELECT lang, n_docs, total_tokens,
             sqrt(total_tokens::DOUBLE / max_tokens) AS rate
      FROM tot, mx
    )
    SELECT r.lang AS lang, n_docs, total_tokens,
           ROUND(rate, 6) AS sample_rate,
           SUM(CASE WHEN u < CAST(floor(rate * 1000000) AS BIGINT)
               THEN 1 ELSE 0 END)::BIGINT AS kept_docs,
           SUM(CASE WHEN u < CAST(floor(rate * 1000000) AS BIGINT)
               THEN n_tok ELSE 0 END)::BIGINT AS kept_tokens
    FROM rated r JOIN docs d USING (lang)
    GROUP BY r.lang, n_docs, total_tokens, rate
    """,
    doc="Temperature (alpha=0.5) language resampling: keep rate per "
    "language proportional to sqrt(token share), largest language at "
    "rate 1 — the standard multilingual rebalancing (mBERT/XLM-R "
    "exponentiated sampling) next to sample_corpus_mixture's absolute "
    "budgets. Keep decision is a pure function of doc_id (portable "
    "hash vs the lang rate), reproducible across engines and cluster "
    "sizes; rate dim broadcast, scan shuffle-free.",
)
def sample_lang_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id",
        "lang",
        F.size(_toks()).cast("bigint").alias("n_tok"),
        (
            sk.h60(F.concat(F.lit("tmp:"), F.col("doc_id").cast("string")))
            % 1000000
        ).alias("u"),
    )
    tot = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
    )
    mx = tot.agg(F.max("total_tokens").cast("bigint").alias("max_tokens"))
    rated = tot.crossJoin(F.broadcast(mx)).select(
        "lang",
        "n_docs",
        "total_tokens",
        F.sqrt(F.col("total_tokens").cast("double") / F.col("max_tokens")).alias(
            "rate"
        ),
    )
    thresh = F.floor(F.col("rate") * 1000000).cast("bigint")
    kept = F.col("u") < thresh
    return (
        docs.join(F.broadcast(rated), "lang")
        .groupBy("lang", "n_docs", "total_tokens", "rate")
        .agg(
            F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("kept_docs"),
            F.sum(F.when(kept, F.col("n_tok")).otherwise(0))
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
# text_quality_classifier — fastText-style hashed linear quality model
# ---------------------------------------------------------------------------
# Deterministic stand-in for a trained classifier: the WEIGHTS are a
# pure function of the feature bucket (portable 60-bit hash), so both
# engines score identically without shipping a model file. The
# plumbing — hashing trick, per-token weight lookup, mean margin,
# logistic link — is exactly what a real fastText/CCNet quality
# filter runs; swap the weight expression for a broadcast lookup of
# trained weights and nothing else changes.
QC_BUCKETS = 1024
QC_SCALE = 4.0

_SQL_QC_W = (
    "(('0x' || substr(md5('qw:' || CAST("
    "('0x' || substr(md5('qc:' || t), 1, 15))::BIGINT % "
    f"{QC_BUCKETS} AS VARCHAR)), 1, 15))::BIGINT % 2001) - 1000"
)


@register(
    "text_quality_classifier",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
    ), s AS (
      SELECT doc_id, len(toks)::BIGINT AS n_tok,
             COALESCE(CAST(list_sum(list_transform(
               toks, t -> {_SQL_QC_W}
             )) AS BIGINT), 0) AS weight_sum
      FROM t
    )
    SELECT doc_id, n_tok, weight_sum,
           ROUND(CASE WHEN n_tok = 0 THEN 0.5 ELSE
             1.0 / (1.0 + exp(-{QC_SCALE!r} * weight_sum
                              / (1000.0 * n_tok)))
           END, 4) AS quality_prob,
           (weight_sum > 0) AS keep
    FROM s
    """,
    doc="fastText-style hashed linear quality classifier (the "
    "model-based filter of CCNet/LLaMA corpus pipelines, Wenzek et "
    f"al. 2020): tokens hashed into {QC_BUCKETS} buckets, integer "
    "centi-weights in [-1000,1000] derived from the bucket hash, doc "
    "score = logistic(mean weight). The weight SUM is integer, so "
    "the keep decision is bit-exact across engines and summation "
    "orders; only the display probability touches floats (one exp, "
    "rounded). Zero shuffle: F.aggregate folds the token array in "
    "place — no explode, no groupBy; at 100 TB this is a pure "
    "map stage pipelined with the scan.",
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")

    def w(t: Column) -> Column:
        bucket = (sk.h60(F.concat(F.lit("qc:"), t)) % QC_BUCKETS).cast(
            "string"
        )
        return (sk.h60(F.concat(F.lit("qw:"), bucket)) % 2001) - 1000

    s = d.select(
        "doc_id",
        F.size(_toks()).cast("bigint").alias("n_tok"),
        F.aggregate(
            _toks(),
            F.lit(0).cast("bigint"),
            lambda acc, t: acc + w(t),
        ).alias("weight_sum"),
    )
    margin = F.col("weight_sum") / (1000.0 * F.col("n_tok"))
    prob = F.when(F.col("n_tok") == 0, F.lit(0.5)).otherwise(
        1.0 / (1.0 + F.exp(-QC_SCALE * margin))
    )
    return s.select(
        "doc_id",
        "n_tok",
        "weight_sum",
        F.round(prob, 4).alias("quality_prob"),
        (F.col("weight_sum") > 0).alias("keep"),
    )


# ---------------------------------------------------------------------------
# text_perplexity_buckets — CCNet head/middle/tail perplexity split
# ---------------------------------------------------------------------------
LM_BUCKETS = 4096


@register(
    "text_perplexity_buckets",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, {_SQL_TOKS} AS toks FROM documents
    ), g AS (
      SELECT doc_id, lang, toks FROM t WHERE len(toks) >= 2
    ), f AS (
      SELECT doc_id, lang,
             {sk.sql_h60("'lm1:' || w1")} % {LM_BUCKETS} AS ub,
             {sk.sql_h60("'lm2:' || w1 || ' ' || w2")} % {LM_BUCKETS} AS bb
      FROM (
        SELECT doc_id, lang,
               unnest(list_transform(range(1, len(toks)),
                                     i -> toks[i])) AS w1,
               unnest(list_transform(range(1, len(toks)),
                                     i -> toks[i+1])) AS w2
        FROM g
      )
    ), cu AS (
      SELECT ub, COUNT(*)::BIGINT AS cu FROM f GROUP BY ub
    ), cb AS (
      SELECT bb, COUNT(*)::BIGINT AS cb FROM f GROUP BY bb
    ), sc AS (
      SELECT doc_id, lang, COUNT(*)::BIGINT AS n_bigrams,
             ROUND(SUM(ln((cb + 1.0) / (cu + {LM_BUCKETS})))
                   / COUNT(*), 4) AS avg_logprob
      FROM f JOIN cu USING (ub) JOIN cb USING (bb)
      GROUP BY doc_id, lang
    ), hist AS (
      SELECT lang, avg_logprob, COUNT(*)::BIGINT AS n
      FROM sc GROUP BY lang, avg_logprob
    ), cum AS (
      SELECT lang, avg_logprob,
             COALESCE(SUM(n) OVER (
               PARTITION BY lang ORDER BY avg_logprob DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0)::BIGINT AS better,
             SUM(n) OVER (PARTITION BY lang)::BIGINT AS total
      FROM hist
    )
    SELECT doc_id, sc.lang AS lang, n_bigrams, sc.avg_logprob AS avg_logprob,
           CASE WHEN better * 3 < total THEN 'head'
                WHEN better * 3 < total * 2 THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM sc JOIN cum ON sc.lang = cum.lang
                    AND sc.avg_logprob = cum.avg_logprob
    """,
    doc="CCNet-style perplexity bucketing (Wenzek et al. 2020): a "
    f"hashed-bigram LM ({LM_BUCKETS} buckets, add-1 smoothing) "
    "trained on the corpus itself scores each doc's mean bigram "
    "log-probability; docs split per-language into head/middle/tail "
    "terciles (bucket = share of strictly-better docs, ties share a "
    "bucket). Scale path: the two count dims are <= "
    f"{LM_BUCKETS} rows and BROADCAST; the tercile split sorts only "
    "the per-(lang, rounded-score) HISTOGRAM dim — never a full "
    "per-language sort of the documents (the same two-phase trick as "
    "train_shard_pack), then hash-joins buckets back. Integer "
    "3*better<total comparisons keep the split exact.",
)
def text_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    base = d.select("doc_id", "lang", _toks().alias("toks")).where(
        F.size("toks") >= 2
    )
    n = F.size("toks")
    pairs = F.transform(
        F.sequence(F.lit(0), n - 2),
        lambda i: F.struct(
            F.element_at(F.col("toks"), i + 1).alias("w1"),
            F.element_at(F.col("toks"), i + 2).alias("w2"),
        ),
    )
    f = base.select("doc_id", "lang", F.explode(pairs).alias("p")).select(
        "doc_id",
        "lang",
        (sk.h60(F.concat(F.lit("lm1:"), F.col("p.w1"))) % LM_BUCKETS).alias(
            "ub"
        ),
        (
            sk.h60(
                F.concat(
                    F.lit("lm2:"), F.col("p.w1"), F.lit(" "), F.col("p.w2")
                )
            )
            % LM_BUCKETS
        ).alias("bb"),
    )
    # Both LM dims in ONE pass over the bigram stream (each bigram row
    # contributes a unigram-prefix event and a bigram event), persisted
    # at <= 2 * LM_BUCKETS rows so the two broadcast sides don't each
    # re-run the explode. The feature stream itself is then evaluated
    # exactly TWICE (count pass + score pass) — the classic two-pass
    # LM-train/score shape, like text_tfidf_topterms.
    cnts = (
        f.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("u").alias("k"), F.col("ub").alias("bk")
                    ),
                    F.struct(F.lit("b").alias("k"), F.col("bb").alias("bk")),
                )
            ).alias("e")
        )
        .groupBy("e.k", "e.bk")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .persist()
    )
    cu = cnts.where(F.col("k") == "u").select(
        F.col("bk").alias("ub"), F.col("c").alias("cu")
    )
    cb = cnts.where(F.col("k") == "b").select(
        F.col("bk").alias("bb"), F.col("c").alias("cb")
    )
    sc = (
        f.join(F.broadcast(cu), "ub")
        .join(F.broadcast(cb), "bb")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(
                F.sum(F.log((F.col("cb") + 1.0) / (F.col("cu") + LM_BUCKETS)))
                / F.count(F.lit(1)),
                4,
            ).alias("avg_logprob"),
        )
        .persist()  # doc-level rows: feeds BOTH the histogram dim and
        # the final join — without this the whole LM pipeline runs 2x
    )
    hist = sc.groupBy("lang", "avg_logprob").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    wdesc = (
        Window.partitionBy("lang")
        .orderBy(F.col("avg_logprob").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wall = Window.partitionBy("lang")
    cum = hist.select(
        "lang",
        "avg_logprob",
        F.coalesce(F.sum("n").over(wdesc), F.lit(0))
        .cast("bigint")
        .alias("better"),
        F.sum("n").over(wall).cast("bigint").alias("total"),
    )
    bucket = (
        F.when(F.col("better") * 3 < F.col("total"), F.lit("head"))
        .when(F.col("better") * 3 < F.col("total") * 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return sc.join(F.broadcast(cum), ["lang", "avg_logprob"]).select(
        "doc_id",
        "lang",
        "n_bigrams",
        "avg_logprob",
        bucket.alias("ppl_bucket"),
    )


# ---------------------------------------------------------------------------
# text_source_reputation — RefinedWeb-style source/domain-level gate
# ---------------------------------------------------------------------------
# Thresholds as integer cross-multiplications so every decision is
# exact: block when >=30% duplicate docs or <30% classifier-positive
# docs; review when >=10% duplicates or <50% positive.
REP_DUP_BLOCK_PCT = 30
REP_POS_BLOCK_PCT = 30
REP_DUP_REVIEW_PCT = 10
REP_POS_REVIEW_PCT = 50


@register(
    "text_source_reputation",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, md5(text) AS h,
             COALESCE(CAST(list_sum(list_transform(
               {_SQL_TOKS}, t -> {_SQL_QC_W}
             )) AS BIGINT), 0) AS wsum
      FROM documents
    ), s AS (
      SELECT source,
             COUNT(*)::BIGINT AS n_docs,
             (COUNT(*) - COUNT(DISTINCT h))::BIGINT AS dup_docs,
             SUM(CASE WHEN wsum > 0 THEN 1 ELSE 0 END)::BIGINT AS pos_docs
      FROM t GROUP BY source
    )
    SELECT source, n_docs, dup_docs,
           ROUND(dup_docs * 1.0 / n_docs, 4) AS dup_share,
           pos_docs,
           ROUND(pos_docs * 1.0 / n_docs, 4) AS pos_share,
           CASE
             WHEN dup_docs * 100 >= n_docs * {REP_DUP_BLOCK_PCT}
               OR pos_docs * 100 < n_docs * {REP_POS_BLOCK_PCT}
               THEN 'block'
             WHEN dup_docs * 100 >= n_docs * {REP_DUP_REVIEW_PCT}
               OR pos_docs * 100 < n_docs * {REP_POS_REVIEW_PCT}
               THEN 'review'
             ELSE 'allow'
           END AS decision
    FROM s
    """,
    doc="Source/domain-level reputation gate (the RefinedWeb/C4 "
    "pattern of filtering whole domains, not just docs): per-source "
    "duplicate share (md5 distinct) and classifier-positive share "
    "(text_quality_classifier's integer weight sum) roll up into an "
    "allow/review/block decision via integer cross-multiplication "
    "thresholds — every output value is exact (integer counts and "
    "exact decimal shares), zero float divergence risk. One "
    "source-keyed agg; at 100 TB sources are ~10^7 keys with Zipf "
    "skew, but the agg is all map-side partial (count/distinct-hash "
    "partials), and the output is dim-sized — the gate then joins "
    "back to docs as a broadcast.",
)
def text_source_reputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")

    def w(t: Column) -> Column:
        bucket = (sk.h60(F.concat(F.lit("qc:"), t)) % QC_BUCKETS).cast(
            "string"
        )
        return (sk.h60(F.concat(F.lit("qw:"), bucket)) % 2001) - 1000

    t = d.select(
        "source",
        F.md5("text").alias("h"),
        F.aggregate(
            _toks(), F.lit(0).cast("bigint"), lambda acc, tok: acc + w(tok)
        ).alias("wsum"),
    )
    s = t.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (F.count(F.lit(1)) - F.countDistinct("h"))
        .cast("bigint")
        .alias("dup_docs"),
        F.sum(F.when(F.col("wsum") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("pos_docs"),
    )
    decision = (
        F.when(
            (F.col("dup_docs") * 100 >= F.col("n_docs") * REP_DUP_BLOCK_PCT)
            | (F.col("pos_docs") * 100 < F.col("n_docs") * REP_POS_BLOCK_PCT),
            F.lit("block"),
        )
        .when(
            (F.col("dup_docs") * 100 >= F.col("n_docs") * REP_DUP_REVIEW_PCT)
            | (
                F.col("pos_docs") * 100
                < F.col("n_docs") * REP_POS_REVIEW_PCT
            ),
            F.lit("review"),
        )
        .otherwise(F.lit("allow"))
    )
    return s.select(
        "source",
        "n_docs",
        "dup_docs",
        F.round(F.col("dup_docs") * 1.0 / F.col("n_docs"), 4).alias(
            "dup_share"
        ),
        "pos_docs",
        F.round(F.col("pos_docs") * 1.0 / F.col("n_docs"), 4).alias(
            "pos_share"
        ),
        decision.alias("decision"),
    )
