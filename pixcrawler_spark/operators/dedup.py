"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Maps the reference's two-tier duplicate detection (MD5 content hash +
perceptual aHash over images, validator/integrity.py:108-249,348-426)
onto text-scale dedup, Spark-first:

- exact dedup      → groupBy(md5(content)) keep-first (hash aggregate)
- minhash + LSH    → shingle explode → min(md5(seed:shingle)) per seed
                     (lexicographic MinHash) → band join → candidate
                     pairs; at 100 TB the band join is the only shuffle
                     and keys are uniformly-distributed hashes (no skew)
- simhash          → per-token md5 nibbles → ±1 sums per dimension →
                     16-bit fingerprint (hamming-bucketable)
- n-gram jaccard   → distinct-shingle equi-join, |A∩B|/|A∪B|

All operators are pure DataFrame expressions (whole-stage codegen; no
Python UDFs). Hash choice is md5-hex because the DuckDB oracle computes
the identical value — MinHash over lexicographic string order is
order-isomorphic to MinHash over any injective map of it, so this is a
real MinHash, just with a portable hash family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F

# Hex chars whose high bit is set — used for simhash bit extraction.
_HIGH_NIBBLES = ("8", "9", "a", "b", "c", "d", "e", "f")


def tokens_expr(text_col: str):
    """Whitespace tokenization of trimmed text (portable to DuckDB's
    regexp_split_to_array)."""
    return F.split(F.trim(F.col(text_col)), r"\s+")


def with_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Explode word n-gram shingles: one row per (id, shingle).

    Documents with fewer than ``n`` tokens produce no shingles (same
    as the oracle's range() producing an empty list).
    """
    toks = tokens_expr(text_col)
    parts = " || ' ' || ".join(f"_toks[i + {j}]" for j in range(n))
    shingles = F.expr(
        f"transform(sequence(0, size(_toks) - {n}), i -> {parts})"
    )
    return (
        df.select(F.col(id_col), toks.alias("_toks"))
        .where(F.size("_toks") >= n)
        .select(F.col(id_col), F.explode(shingles).alias("shingle"))
    )


def exact_duplicates(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Keep-first exact dedup (validator/integrity.py:348-370 semantics):
    group rows by content hash, keep the lowest id as the original.

    Returns (id, content_hash, is_original, original_id).
    """
    hashed = df.select(
        F.col(id_col), F.md5(F.col(content_col)).alias("content_hash")
    )
    w = Window.partitionBy("content_hash").orderBy(F.asc(id_col))
    return hashed.select(
        F.col(id_col),
        "content_hash",
        (F.row_number().over(w) == 1).alias("is_original"),
        F.min(id_col).over(Window.partitionBy("content_hash")).alias("original_id"),
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 8,
) -> DataFrame:
    """MinHash signature per document: sig_i = min(md5(i || ':' || shingle)).

    One shuffle (groupBy id); the k hash evaluations are per-row
    expressions inside codegen. Returns (id, sig_0..sig_{k-1}).
    """
    sh = with_shingles(df, id_col, text_col, n)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"sig_{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str,
    num_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """LSH banding: concat ``band_size`` consecutive sigs per band, join
    docs sharing any band value. Returns distinct (id_a, id_b), a < b.

    The band join shuffles on uniformly-distributed hash keys — no skew
    by construction; duplicate-heavy corpora produce hot bands which AQE
    skew-join splits.
    """
    assert num_hashes % band_size == 0
    n_bands = num_hashes // band_size
    bands = [
        F.concat_ws(
            "|", *[F.col(f"sig_{b * band_size + j}") for j in range(band_size)]
        ).alias(f"band_{b}")
        for b in range(n_bands)
    ]
    banded = sigs.select(F.col(id_col), *bands)
    # unpivot: one row per (id, band_idx, band_val)
    stack_expr = ", ".join(f"{b}, band_{b}" for b in range(n_bands))
    long = banded.select(
        F.col(id_col),
        F.expr(f"stack({n_bands}, {stack_expr}) as (band_idx, band_val)"),
    )
    a = long.select(
        F.col(id_col).alias("id_a"), "band_idx", "band_val"
    )
    b = long.select(
        F.col(id_col).alias("id_b"), "band_idx", "band_val"
    )
    return (
        a.join(b, ["band_idx", "band_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs by n-gram Jaccard similarity >= threshold.

    Candidate generation is the distinct-shingle self-equi-join (only
    pairs sharing >=1 shingle are ever materialized); at scale this is
    the standard prefix-free PPJoin-lite: the shingle join key is
    high-cardinality so the shuffle is well spread.

    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    sh = with_shingles(df, id_col, text_col, n).distinct()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def simhash_fingerprints(
    df: DataFrame, id_col: str, text_col: str, dims: int = 16
) -> DataFrame:
    """SimHash fingerprint per document over whitespace tokens.

    Dimension d's bit is the sign of sum over tokens of ±1, where the
    vote is the high bit of hex digit d of md5(token) (16 dimensions =
    the md5 hex prefix; extendable to 32 by using both nibble bits).
    Pure expressions: explode → groupBy(id) with ``dims`` conditional
    sums → bit-string concat.

    Returns (id, simhash) where simhash is a ``dims``-char bit string.
    """
    assert 1 <= dims <= 32
    toks = (
        df.select(F.col(id_col), F.explode(tokens_expr(text_col)).alias("tok"))
        .select(F.col(id_col), F.md5(F.col("tok")).alias("h"))
    )
    votes = [
        F.sum(
            F.when(
                F.substring(F.col("h"), d + 1, 1).isin(*_HIGH_NIBBLES), 1
            ).otherwise(-1)
        ).alias(f"v_{d}")
        for d in range(dims)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    bits = [
        F.when(F.col(f"v_{d}") > 0, "1").otherwise("0") for d in range(dims)
    ]
    return agg.select(F.col(id_col), F.concat(*bits).alias("simhash"))
