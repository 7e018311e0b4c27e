"""Scale-path variants of similarity/fingerprinting operators.

- ``ann_srp_lsh_topk``: the LSH-bucketed ANN path (vs the brute-force
  ``ann_cosine_topk`` baseline): sign-random-projection buckets over
  the embedding column, exact cosine only within the query's bucket.
  At 10^10 vectors the bucket join replaces the full scan — candidate
  count drops by ~2^planes and the bucket key is hash-uniform (no
  skew). The hyperplanes are deterministic literals (seeded integer
  hash, documented below) so the DuckDB oracle computes the identical
  buckets.
- ``text_bottomk_sketch``: bottom-k document sketch over word-shingle
  hashes (the rolling-hash fingerprint family: a k-minimum-values
  sketch supports resemblance estimation and near-dup blocking).
  Portable hash = md5(shingle), same as the MinHash family in
  queries/pipeline.py.

Reference analog: the two-tier MD5 + perceptual-hash dedup of
validator/integrity.py:108-249 — SRP buckets are the embedding-space
perceptual hash; the bottom-k sketch is the content-hash tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pixcrawler_spark.operators import dedup, similarity
from pixcrawler_spark.queries.pipeline import _DOT, _sql_cos, _SHINGLES_CTE
from pixcrawler_spark.queries.registry import register
from pixcrawler_spark.sources.tables import load_table

EMB_DIM = 64
N_PLANES = 4
SKETCH_K = 5


def _plane(p: int) -> list[float]:
    """Deterministic hyperplane p: component j =
    (((p*EMB_DIM + j) * 2654435761 + 42) mod 2001 - 1000) / 1000 —
    a documented integer-hash literal shared with the SQL oracle."""
    return [
        ((((p * EMB_DIM + j) * 2654435761 + 42) % 2001) - 1000) / 1000.0
        for j in range(EMB_DIM)
    ]


PLANES = [_plane(p) for p in range(N_PLANES)]


def _sql_plane_bit(p: int) -> str:
    lit = "[" + ", ".join(f"{x!r}" for x in PLANES[p]) + "]"
    dot = (
        f"list_sum(list_transform(range(len(embedding)), "
        f"i -> CAST(embedding[i + 1] AS DOUBLE) * ({lit})[i + 1]))"
    )
    return f"CASE WHEN {dot} >= 0 THEN '1' ELSE '0' END"


_SQL_BUCKET = " || ".join(_sql_plane_bit(p) for p in range(N_PLANES))


@register(
    "ann_srp_lsh_topk",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding, {_SQL_BUCKET} AS bucket FROM embeddings
    ),
    q AS (SELECT embedding AS vq, bucket AS qb FROM b WHERE vec_id = 0)
    SELECT b.vec_id AS vec_id, {_sql_cos('b.embedding', 'vq')} AS cosine
    FROM b, q WHERE b.bucket = q.qb
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
    doc="LSH-bucketed ANN top-k (sign-random-projection buckets, exact "
    "cosine within the query's bucket) — the scale path next to the "
    "ann_cosine_topk brute-force baseline.",
)
def ann_srp_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    bucketed = e.select(
        "vec_id",
        "embedding",
        similarity.srp_bucket_expr("embedding", PLANES).alias("bucket"),
    )
    q = bucketed.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("vq"), F.col("bucket").alias("qb")
    )
    cos = F.round(similarity.cosine_expr(F.col("embedding"), F.col("vq")), 6)
    return (
        bucketed.join(F.broadcast(q), F.col("bucket") == F.col("qb"))
        .select("vec_id", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


@register(
    "text_bottomk_sketch",
    oracle=f"""
    WITH {_SHINGLES_CTE}
    SELECT doc_id,
           array_to_string(
             list_slice(list_sort(list(DISTINCT md5(shingle))), 1, {SKETCH_K}),
             ','
           ) AS sketch
    FROM sh GROUP BY doc_id
    """,
    doc=f"Bottom-{SKETCH_K} k-minimum-values sketch over word-shingle "
    "hashes: the rolling-hash document fingerprint (resemblance "
    "estimation + near-dup blocking key).",
)
def text_bottomk_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sh = dedup.with_shingles(d, "doc_id", "text", n=3)
    return sh.groupBy("doc_id").agg(
        F.concat_ws(
            ",",
            F.slice(
                F.array_sort(F.collect_set(F.md5(F.col("shingle")))),
                1,
                SKETCH_K,
            ),
        ).alias("sketch")
    )
