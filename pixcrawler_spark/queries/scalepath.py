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
from pixcrawler_spark.queries.annparams import (
    EXPECTED_N,
    K_CENTROIDS,
    N_PLANES,
    N_PLANES_FINE,
    NPROBE,
    PLANES,
    RECALL_K,
    _SQL_BUCKET,
    _sql_bucket,
)
from pixcrawler_spark.queries.pipeline import _DOT, _sql_cos, _SHINGLES_CTE
from pixcrawler_spark.queries.registry import register
from pixcrawler_spark.sources.tables import load_table

SKETCH_K = 5


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
        similarity.srp_bucket_expr("embedding", PLANES[:N_PLANES]).alias("bucket"),
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
    "ann_srp_multiprobe_topk",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding, {_sql_bucket(N_PLANES_FINE)} AS bucket
      FROM embeddings
    ),
    q AS (SELECT embedding AS vq, bucket AS qb FROM b WHERE vec_id = 0),
    probes AS (
      SELECT vq,
             list_prepend(qb, list_transform(range(1, {N_PLANES_FINE + 1}),
               j -> substring(qb, 1, j - 1)
                    || (CASE WHEN substring(qb, j, 1) = '1' THEN '0' ELSE '1' END)
                    || substring(qb, j + 1, {N_PLANES_FINE} - j))) AS pb
      FROM q
    )
    SELECT b.vec_id AS vec_id, {_sql_cos('b.embedding', 'vq')} AS cosine
    FROM b, probes WHERE list_contains(pb, b.bucket)
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
    doc=f"Multi-probe SRP ANN at the finer {N_PLANES_FINE}-plane "
    "resolution: probe the query bucket plus every hamming-1 neighbor "
    "(one flipped plane bit) — smaller buckets for corpus growth, "
    "recall recovered at probe cost linear in plane count.",
)
def ann_srp_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    bucketed = e.select(
        "vec_id",
        "embedding",
        similarity.srp_bucket_expr(
            "embedding", PLANES[:N_PLANES_FINE]
        ).alias("bucket"),
    )
    q = bucketed.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("vq"),
        similarity.multiprobe_buckets_expr(
            F.col("bucket"), N_PLANES_FINE
        ).alias("pb"),
    )
    cos = F.round(similarity.cosine_expr(F.col("embedding"), F.col("vq")), 6)
    return (
        bucketed.join(
            F.broadcast(q), F.array_contains(F.col("pb"), F.col("bucket"))
        )
        .select("vec_id", cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


@register(
    "ann_srp_bucket_stats",
    oracle=f"""
    WITH b4 AS (
      SELECT {_sql_bucket(N_PLANES)} AS bucket, count(*) AS n
      FROM embeddings GROUP BY 1
    ),
    b6 AS (
      SELECT {_sql_bucket(N_PLANES_FINE)} AS bucket, count(*) AS n
      FROM embeddings GROUP BY 1
    )
    SELECT CAST({N_PLANES} AS INT) AS n_planes,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(max(n) AS BIGINT) AS max_occupancy,
           round(avg(n), 4) AS avg_occupancy
    FROM b4
    UNION ALL
    SELECT CAST({N_PLANES_FINE} AS INT) AS n_planes,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(max(n) AS BIGINT) AS max_occupancy,
           round(avg(n), 4) AS avg_occupancy
    FROM b6
    """,
    doc="SRP bucket-occupancy telemetry at both registered plane "
    "counts — the observable that justifies planes_for(): occupancy "
    "halves per added plane, so within-bucket exact-cosine work stays "
    "bounded as the corpus grows.",
)
def ann_srp_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    outs = []
    for n_planes in (N_PLANES, N_PLANES_FINE):
        occ = (
            e.select(
                similarity.srp_bucket_expr(
                    "embedding", PLANES[:n_planes]
                ).alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        outs.append(
            occ.agg(
                F.lit(n_planes).cast("int").alias("n_planes"),
                F.count(F.lit(1)).alias("n_buckets"),
                F.max("n").alias("max_occupancy"),
                F.round(F.avg("n"), 4).alias("avg_occupancy"),
            )
        )
    return outs[0].unionByName(outs[1])


# IVF parameters (K_CENTROIDS/NPROBE) are shared constants in
# queries/annparams.py — derived there from EXPECTED_N.


@register(
    "ann_ivf_topk",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS cvec
      FROM embeddings WHERE vec_id < {K_CENTROIDS}
    ),
    assigned AS (
      SELECT vec_id, embedding, cent_id,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY {_sql_cos('embedding', 'cvec')} DESC,
                                         cent_id) AS rk
      FROM embeddings CROSS JOIN cents
    ),
    lists AS (SELECT vec_id, embedding, cent_id FROM assigned WHERE rk = 1),
    qprobe AS (
      SELECT cent_id FROM assigned WHERE vec_id = 0 AND rk <= {NPROBE}
    ),
    q AS (SELECT embedding AS vq FROM embeddings WHERE vec_id = 0)
    SELECT l.vec_id AS vec_id, {_sql_cos('l.embedding', 'vq')} AS cosine
    FROM lists l, q
    WHERE l.cent_id IN (SELECT cent_id FROM qprobe)
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
    doc=f"IVF-style ANN top-k: {K_CENTROIDS} coarse centroids (first "
    f"{K_CENTROIDS} vectors as the deterministic codebook), each "
    "vector assigned to its nearest centroid's inverted list, query "
    f"probes its {NPROBE} nearest lists, exact cosine within them — "
    "the second scale-path ANN family next to SRP-LSH (candidates "
    "shrink by ~nprobe/K; the codebook broadcast is K rows).",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_topk(
        e, "vec_id", "embedding", query_id=0, k=10,
        k_centroids=K_CENTROIDS, nprobe=NPROBE,
    )


@register(
    "ann_ivf_list_stats",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS cvec
      FROM embeddings WHERE vec_id < {K_CENTROIDS}
    ),
    assigned AS (
      SELECT vec_id, cent_id,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY {_sql_cos('embedding', 'cvec')} DESC,
                                         cent_id) AS rk
      FROM embeddings CROSS JOIN cents
    ),
    occ AS (
      SELECT cent_id, count(*) AS n FROM assigned WHERE rk = 1
      GROUP BY cent_id
    )
    SELECT CAST({K_CENTROIDS} AS INTEGER) AS k_centroids,
           CAST(count(*) AS BIGINT) AS n_lists,
           CAST(max(n) AS BIGINT) AS max_occupancy,
           round(avg(n), 4) AS avg_occupancy
    FROM occ
    """,
    doc="IVF inverted-list occupancy telemetry — the observable that "
    f"justifies centroids_for (K={K_CENTROIDS} ≈ √{EXPECTED_N}): "
    "n_lists/max/avg occupancy over the nearest-centroid assignment, "
    "mirroring ann_srp_bucket_stats for the SRP family.",
)
def ann_ivf_list_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return similarity.ivf_list_stats(
        e, "vec_id", "embedding", k_centroids=K_CENTROIDS
    )


# GPT-style pre-tokenization classes: letter runs, digit runs, single
# punctuation marks — the BPE-input token stream (whitespace-free).
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


@register(
    "text_token_bpe",
    oracle=f"""
    SELECT doc_id,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
                AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS BIGINT)
             AS n_bpe_tokens,
           round(CASE WHEN length(trim(text)) = 0 THEN 0.0
                 ELSE CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS DOUBLE)
                      / len(regexp_split_to_array(trim(text), '\\s+')) END,
                 4) AS bpe_per_word
    FROM documents
    """,
    doc="BPE-ish token counting: GPT-style pre-tokenizer classes "
    "(letter runs / digit runs / single punctuation) counted next to "
    "whitespace tokens, with the fertility ratio — the standard "
    "token-budget estimator for training-data pipelines.",
)
def text_token_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n_ws = F.when(F.length(F.trim("text")) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
    )
    n_bpe = F.regexp_count("text", F.lit(BPE_PATTERN))
    return d.select(
        "doc_id",
        n_ws.cast("long").alias("n_ws_tokens"),
        n_bpe.cast("long").alias("n_bpe_tokens"),
        F.round(
            F.when(n_ws == 0, 0.0).otherwise(
                n_bpe.cast("double") / n_ws
            ),
            4,
        ).alias("bpe_per_word"),
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


# ---------------------------------------------------------------------------
# ANN recall@k — the observable that justifies every approximate path
# ---------------------------------------------------------------------------
# RECALL_K is shared from queries/annparams.py


@register(
    "ann_recall_at_k",
    oracle=f"""
    WITH q AS (SELECT embedding AS vq FROM embeddings WHERE vec_id = 0),
    brute AS (
      SELECT vec_id FROM embeddings, q
      ORDER BY {_sql_cos('embedding', 'vq')} DESC, vec_id
      LIMIT {RECALL_K}
    ),
    b4 AS (
      SELECT vec_id, embedding, {_SQL_BUCKET} AS bucket FROM embeddings
    ),
    q4 AS (SELECT embedding AS vq, bucket AS qb FROM b4 WHERE vec_id = 0),
    srp AS (
      SELECT b4.vec_id FROM b4, q4 WHERE b4.bucket = q4.qb
      ORDER BY {_sql_cos('b4.embedding', 'vq')} DESC, vec_id
      LIMIT {RECALL_K}
    ),
    b6 AS (
      SELECT vec_id, embedding, {_sql_bucket(N_PLANES_FINE)} AS bucket
      FROM embeddings
    ),
    q6 AS (SELECT embedding AS vq, bucket AS qb FROM b6 WHERE vec_id = 0),
    probes AS (
      SELECT vq,
             list_prepend(qb, list_transform(range(1, {N_PLANES_FINE + 1}),
               j -> substring(qb, 1, j - 1)
                    || (CASE WHEN substring(qb, j, 1) = '1' THEN '0' ELSE '1' END)
                    || substring(qb, j + 1, {N_PLANES_FINE} - j))) AS pb
      FROM q6
    ),
    mp AS (
      SELECT b6.vec_id FROM b6, probes WHERE list_contains(pb, b6.bucket)
      ORDER BY {_sql_cos('b6.embedding', 'vq')} DESC, vec_id
      LIMIT {RECALL_K}
    ),
    cents AS (
      SELECT vec_id AS cent_id, embedding AS cvec
      FROM embeddings WHERE vec_id < {K_CENTROIDS}
    ),
    assigned AS (
      SELECT vec_id, embedding, cent_id,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY {_sql_cos('embedding', 'cvec')} DESC,
                                         cent_id) AS rk
      FROM embeddings CROSS JOIN cents
    ),
    ivf AS (
      SELECT l.vec_id FROM
        (SELECT vec_id, embedding, cent_id FROM assigned WHERE rk = 1) l, q
      WHERE l.cent_id IN
        (SELECT cent_id FROM assigned WHERE vec_id = 0 AND rk <= {NPROBE})
      ORDER BY {_sql_cos('l.embedding', 'vq')} DESC, vec_id
      LIMIT {RECALL_K}
    ),
    approx AS (
      SELECT 'srp_lsh' AS method, vec_id FROM srp
      UNION ALL SELECT 'srp_multiprobe', vec_id FROM mp
      UNION ALL SELECT 'ivf', vec_id FROM ivf
    )
    SELECT method,
           CAST(count(*) AS BIGINT) AS returned,
           CAST(sum(CASE WHEN vec_id IN (SELECT vec_id FROM brute)
                         THEN 1 ELSE 0 END) AS BIGINT) AS hits,
           round(sum(CASE WHEN vec_id IN (SELECT vec_id FROM brute)
                          THEN 1 ELSE 0 END) / {float(RECALL_K)}, 4) AS recall
    FROM approx GROUP BY method
    """,
    doc=f"Recall@{RECALL_K} of every approximate ANN path (SRP-LSH, "
    "SRP multi-probe, IVF) against the brute-force truth, computed "
    "INSIDE the engine (one plan, no driver collect) — the observable "
    "that justifies planes_for/centroids_for/nprobe at any corpus "
    "scale; at 10^10 vectors the truth side samples queries instead "
    "of scanning, same plan shape. Interpretation caveat measured on "
    "the synthetic fixture: its nearest neighbors sit at ~74 deg "
    "(cosine ~0.3), giving SRP only 0.589 collision probability per "
    "plane vs 0.5 random — LSH recall is bounded by data contrast "
    "there (multi-table L=8 reaches just 0.6 while scanning 1/3 of "
    "the corpus), which is exactly the decision signal this query "
    "exists to provide: on low-contrast corpora prefer the IVF path "
    "(measures 1.0 here) or raise nprobe.",
)
def ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixcrawler_spark.queries.pipeline import ann_cosine_topk

    truth = ann_cosine_topk(spark, sf_dir).select("vec_id", F.lit(1).alias("_hit"))
    approx = (
        ann_srp_lsh_topk(spark, sf_dir)
        .select(F.lit("srp_lsh").alias("method"), "vec_id")
        .unionByName(
            ann_srp_multiprobe_topk(spark, sf_dir).select(
                F.lit("srp_multiprobe").alias("method"), "vec_id"
            )
        )
        .unionByName(
            ann_ivf_topk(spark, sf_dir).select(
                F.lit("ivf").alias("method"), "vec_id"
            )
        )
    )
    return (
        approx.join(F.broadcast(truth), "vec_id", "left")
        .groupBy("method")
        .agg(
            F.count(F.lit(1)).alias("returned"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("hits"),
        )
        .withColumn(
            "recall", F.round(F.col("hits") / F.lit(float(RECALL_K)), 4)
        )
    )
