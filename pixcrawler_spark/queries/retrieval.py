"""BM25 ranked retrieval over the document corpus.

``text_bm25_topk``: the standard probabilistic ranking function
(Robertson-Sparck Jones BM25, Lucene's idf variant) for a small query
termset — the retrieval primitive a corpus-scale engine needs beside
phrase search (text_phrase_postings) and tf-idf salience
(text_tfidf_topterms): dedup review tooling, eval-set curation, and
"find documents like this query" all reduce to it.

Reference analog: none — the reference has no text index or ranking
at all (its "search" is SERP scraping, builder/_engine.py); this is
the operation a corpus store needs once the crawl LANDS somewhere.

Scale design (100 TB / 1000 executors):
- the only corpus-wide work is the token explode filtered to the
  query terms BEFORE any shuffle — posting-list cost (rows containing
  a query term), not corpus cost, exactly like the phrase join;
- df/N/avgdl are tiny aggregates broadcast back (3-row term dim +
  1-row stats);
- the final top-k is orderBy+limit => TakeOrderedAndProject: map-side
  partial top-K per partition, never a global sort (the UCB/quota
  pattern, plan-audited in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pixcrawler_spark.queries.registry import register
from pixcrawler_spark.sources.tables import load_table

__all__: list[str] = []

BM25_TERMS = ("batch", "stream", "merge")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20

_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)


@register(
    "text_bm25_topk",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ),
    d AS (SELECT doc_id, len(toks) AS dl FROM t),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n, avg(dl) AS avgdl FROM d
    ),
    p AS (SELECT doc_id, unnest(toks) AS term FROM t),
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM p WHERE term IN ({_TERMS_SQL})
      GROUP BY doc_id, term
    ),
    dft AS (
      SELECT term, CAST(count(*) AS BIGINT) AS dfc
      FROM tf GROUP BY term
    ),
    scored AS (
      SELECT tf.doc_id,
             sum(ln(1 + (n - dfc + 0.5) / (dfc + 0.5))
                 * tf * ({BM25_K1} + 1)
                 / (tf + {BM25_K1}
                    * (1 - {BM25_B} + {BM25_B} * d.dl / avgdl))) AS s
      FROM tf
      JOIN d ON d.doc_id = tf.doc_id
      JOIN dft ON dft.term = tf.term
      CROSS JOIN stats
      GROUP BY tf.doc_id
    )
    SELECT doc_id, round(s, 6) AS bm25
    FROM scored
    ORDER BY round(s, 6) DESC, doc_id
    LIMIT {BM25_TOPK}
    """,
    doc=f"BM25 top-{BM25_TOPK} retrieval for the query "
    f"{' '.join(BM25_TERMS)!r} (k1={BM25_K1}, b={BM25_B}, Lucene "
    "idf ln(1+(N-df+0.5)/(df+0.5))): the ranking primitive beside "
    "phrase search and tf-idf salience. The corpus-wide explode is "
    "filtered to the query terms BEFORE any shuffle (posting-list "
    "cost, not corpus cost); df/N/avgdl are broadcast dims; the "
    "top-k is TakeOrderedAndProject (map-side partial top-K, no "
    "global sort). Ranking runs on the ROUNDED score with doc_id "
    "tiebreak so the cut is identical across engines.",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    d = docs.select("doc_id", F.size(toks).alias("dl"), toks.alias("toks"))
    stats = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.avg("dl").alias("avgdl"),
    )
    tf = (
        d.select("doc_id", F.explode("toks").alias("term"))
        .where(F.col("term").isin(*BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    dft = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("dfc")
    )
    dl = d.select("doc_id", "dl")
    term_score = (
        F.log(
            1
            + (F.col("n") - F.col("dfc") + 0.5) / (F.col("dfc") + 0.5)
        )
        * F.col("tf")
        * (BM25_K1 + 1)
        / (
            F.col("tf")
            + BM25_K1
            * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    return (
        tf.join(dl, "doc_id")
        .join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(term_score), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(BM25_TOPK)
    )
