"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force cosine top-k against a query vector —
  the exactness baseline. The dot product is a JVM-side fold
  (zip_with + aggregate), no Python in the loop; at scale this is one
  scan + one top-k (TakeOrderedAndProject), embarrassingly parallel.
- ``lsh_bucketed_pairs``: sign-random-projection (SimHash-for-vectors)
  bucketing — the scale path: near-dup pairs are only computed within
  buckets, turning O(n^2) into O(sum bucket^2) with hash-uniform keys.
- ``blocked_cosine_pairs``: near-dup pairs within an explicit blocking
  key (e.g. a precomputed cluster/label) — the generic blocked join.

Everything stays in whole-stage codegen; rounding to 6 decimals makes
results bit-comparable with the DuckDB oracle (both engines fold the
same doubles in the same order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Column


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Brute-force cosine top-k: (id, cosine) ordered desc, id tiebreak."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cos = F.round(cosine_expr(F.col(vec_col), q), round_to)
    return (
        df.select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def planes_for(expected_n: int, target_bucket: int = 32) -> int:
    """Plane count sized from the expected corpus: bucket population is
    ~n / 2^planes, so ``planes = ceil(log2(n / target_bucket))`` keeps
    the within-bucket exact-cosine work bounded as the corpus grows
    (a fixed plane count lets buckets grow linearly with n — the
    scale hazard this replaces). Pair with ``multiprobe_buckets_expr``
    to keep recall as planes increase."""
    import math

    return max(1, math.ceil(math.log2(max(2.0, expected_n / target_bucket))))


def multiprobe_buckets_expr(bucket_col: Column, n_planes: int) -> Column:
    """Multi-probe bucket set: the bucket itself plus every bucket at
    hamming distance 1 (one flipped plane bit) — n_planes + 1 probes.
    Standard multi-probe LSH: raising the plane count shrinks buckets
    but splits near neighbors across adjacent buckets; probing the
    1-flip neighborhood recovers them at probe cost linear in planes,
    not exponential."""
    flips = []
    for j in range(1, n_planes + 1):
        flipped_bit = F.when(
            F.substring(bucket_col, j, 1) == "1", F.lit("0")
        ).otherwise(F.lit("1"))
        flips.append(
            F.concat(
                F.substring(bucket_col, 1, j - 1),
                flipped_bit,
                F.substring(bucket_col, j + 1, n_planes - j),
            )
        )
    return F.concat(F.array(bucket_col), F.array(*flips))


def srp_bucket_expr(vec_col: str, planes: list[list[float]]) -> Column:
    """Sign-random-projection bucket id: one bit per hyperplane (the
    sign of the dot product), concatenated to a bit-string key."""
    bits = []
    for p in planes:
        pv = F.array(*[F.lit(float(x)) for x in p])
        bits.append(F.when(_dot(F.col(vec_col), pv) >= 0, "1").otherwise("0"))
    return F.concat(*bits)


def lsh_bucketed_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    planes: list[list[float]],
    threshold: float = 0.9,
    round_to: int = 6,
) -> DataFrame:
    """ANN near-dup pairs: SRP-bucket, then exact cosine within bucket."""
    bucketed = df.select(
        F.col(id_col),
        F.col(vec_col),
        srp_bucket_expr(vec_col, planes).alias("bucket"),
    )
    a = bucketed.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"), "bucket"
    )
    b = bucketed.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"), "bucket"
    )
    cos = F.round(cosine_expr(F.col("vec_a"), F.col("vec_b")), round_to)
    return (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def blocked_cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float = 0.9,
    round_to: int = 6,
) -> DataFrame:
    """Near-dup pairs within an explicit block (cluster/label) key."""
    a = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
    )
    b = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
    )
    cos = F.round(cosine_expr(F.col("vec_a"), F.col("vec_b")), round_to)
    return (
        a.join(b, "blk")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )
