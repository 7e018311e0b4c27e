"""Media queries: the REAL image decode + perceptual-aHash path under
the driver's DuckDB oracle.

SQL cannot decode a BMP, so the oracle works by construction: each
document gets a synthetic 64×64 BMP whose 8×8 blocks encode the bits
of ``md5(doc_id % K)`` (bit=1 → block value 200, bit=0 → 40). The
true average-hash of that image IS those 64 bits — every 200-block
sits above the global mean, every 40-block below (degenerate all-
same-bit md5 prefixes don't occur for K=300, asserted in pytest) — so
the expected hash is expressible in SQL as
``substring(md5(...), 1, 16)`` while the Spark side must EARN it by
synthesizing the BMP bytes, parsing them back with the real numpy
decoder, and hashing the pixels (operators/multimodal.py). A bug
anywhere in encode, decode, grayscale, block-mean, threshold or
bit-packing breaks the match.

Reference parity: perceptual aHash dedup, validator/integrity.py:
108-127,172-215 (hash) and 389-426 (grouping).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pixcrawler_spark.queries.registry import register
from pixcrawler_spark.sources.tables import load_table

N_GROUPS = 300  # doc_id % N_GROUPS documents share one image pattern
N_VARIANTS = 3  # byte-distinct, perceptually-identical variants per pattern


def _pattern_pixels(group: int) -> np.ndarray:
    digest = hashlib.md5(str(int(group)).encode()).digest()
    bits = np.unpackbits(np.frombuffer(digest[:8], dtype=np.uint8))
    blocks = np.where(bits, 200, 40).astype(np.uint8).reshape(8, 8)
    px = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    return np.stack([px, px, px], axis=-1)


def pattern_bmp(group: int) -> bytes:
    """Deterministic 64×64 BMP whose aHash equals the first 16 hex
    chars of md5(str(group))."""
    from pixcrawler_spark.operators.multimodal import bmp_encode

    return bmp_encode(_pattern_pixels(group))


def pattern_png(group: int) -> bytes:
    """Same pattern as :func:`pattern_bmp` but PNG-encoded: exercises
    the stdlib zlib inflate + unfilter decode path end-to-end."""
    from pixcrawler_spark.operators.multimodal import png_encode

    return png_encode(_pattern_pixels(group))


def pattern_jpeg(group: int) -> bytes:
    """Same pattern, baseline-JPEG-encoded: exercises the pure-numpy
    Huffman + IDCT decode path. Lossy, but the 40-vs-200 block margin
    (~80 gray levels) dwarfs the <1-level quantization error on block
    means, so the aHash bits are provably unchanged (verified for all
    300 groups in pytest)."""
    from pixcrawler_spark.operators.jpegcodec import jpeg_encode

    return jpeg_encode(_pattern_pixels(group), quality=90)


def documents_as_media(
    spark: SparkSession, sf_dir: str, fmt: str = "bmp"
) -> DataFrame:
    """documents → (media_id, kind, payload) with synthesized BMPs or
    PNGs, via an Arrow-batched mapInPandas (the payload never exists
    on the driver)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", (F.col("doc_id") % N_GROUPS).alias("g")
    )
    make = {"png": pattern_png, "jpeg": pattern_jpeg}.get(fmt, pattern_bmp)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[int, bytes] = {}
        for pdf in batches:
            payloads = [
                cache.setdefault(int(g), make(int(g))) for g in pdf["g"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": "image",
                    "payload": payloads,
                }
            )

    return d.mapInPandas(gen, "media_id bigint, kind string, payload binary")


def pattern_bmp_variant(group: int, variant: int) -> bytes:
    """Like :func:`pattern_bmp` but nudges pixel (0,0) by ``variant``:
    byte-DIFFERENT payloads (distinct sha256) whose aHash is UNCHANGED —
    the +v/64 shift in one block mean is ~4 orders of magnitude smaller
    than the 80-gray-level margin between block means and the global
    mean, so no bit can flip (asserted in pytest)."""
    from pixcrawler_spark.operators.multimodal import bmp_encode

    px = _pattern_pixels(group).copy()
    px[0, 0, :] += np.uint8(variant)  # 40/200 + v<=2: no uint8 overflow
    return bmp_encode(px)


def documents_as_media_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (media_id, kind, payload) where exact groups are
    (doc_id % N_GROUPS, doc_id//N_GROUPS % N_VARIANTS) and perceptual
    groups are doc_id % N_GROUPS — so exact and perceptual duplication
    OVERLAP, exercising the precedence merge."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % N_GROUPS).alias("g"),
        ((F.col("doc_id") / N_GROUPS).cast("bigint") % N_VARIANTS).alias("v"),
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[tuple[int, int], bytes] = {}
        for pdf in batches:
            payloads = [
                cache.setdefault(
                    (int(g), int(v)), pattern_bmp_variant(int(g), int(v))
                )
                for g, v in zip(pdf["g"], pdf["v"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": "image",
                    "payload": payloads,
                }
            )

    return d.mapInPandas(gen, "media_id bigint, kind string, payload binary")


MAX_SIDE = 64  # resize bound for media_resize_reencode


@register(
    "media_resize_reencode",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             20 + (doc_id % 50) * 3 AS w,
             15 + (doc_id % 40) * 2 AS h,
             doc_id % 251 AS v,
             doc_id % 97 = 0 AS corrupt
      FROM documents
    )
    SELECT doc_id AS media_id,
           CAST(CASE WHEN corrupt THEN NULL ELSE w END AS INT) AS width,
           CAST(CASE WHEN corrupt THEN NULL ELSE h END AS INT) AS height,
           CAST(CASE WHEN corrupt THEN NULL
                WHEN greatest(w, h) <= {MAX_SIDE} THEN w
                ELSE (w * {MAX_SIDE}) // greatest(w, h) END AS INT) AS out_width,
           CAST(CASE WHEN corrupt THEN NULL
                WHEN greatest(w, h) <= {MAX_SIDE} THEN h
                ELSE (h * {MAX_SIDE}) // greatest(w, h) END AS INT) AS out_height,
           CASE WHEN corrupt THEN FALSE
                ELSE greatest(w, h) > {MAX_SIDE} END AS resized,
           CAST(CASE WHEN corrupt THEN NULL ELSE v END AS INT) AS out_value
    FROM m
    """,
    doc="REAL image resize + re-encode end-to-end (reference re-encode "
    "pipeline, utility/compress/formats.py:62-142): synthesize flat-gray "
    "BMPs with per-doc dimensions, area-resample + re-encode via "
    "operators/multimodal.resize_reencode, then RE-DECODE the emitted "
    "bytes — out_width/out_height/out_value are read back from the "
    "re-encoded payload, so encode→decode→resample→encode→decode must "
    "all be correct for the arithmetic oracle to match. Docs with "
    "doc_id %% 97 == 0 get truncated payloads exercising the corrupt "
    "branch (null output, resized = false).",
)
def media_resize_reencode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixcrawler_spark.operators.multimodal import (
        _decode_image,
        bmp_encode,
        resize_reencode,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (20 + (F.col("doc_id") % 50) * 3).cast("int").alias("w"),
        (15 + (F.col("doc_id") % 40) * 2).cast("int").alias("h"),
        (F.col("doc_id") % 251).cast("int").alias("v"),
        (F.col("doc_id") % 97 == 0).alias("corrupt"),
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[tuple[int, int, int], bytes] = {}

        def make(w: int, h: int, v: int) -> bytes:
            key = (w, h, v)
            if key not in cache:
                px = np.full((h, w, 3), v, dtype=np.uint8)
                cache[key] = bmp_encode(px)
            return cache[key]

        for pdf in batches:
            payloads = [
                make(int(w), int(h), int(v))[:30] if c else make(int(w), int(h), int(v))
                for w, h, v, c in zip(pdf["w"], pdf["h"], pdf["v"], pdf["corrupt"])
            ]
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "kind": "image", "payload": payloads}
            )

    media = d.mapInPandas(synth, "media_id bigint, kind string, payload binary")
    rr = resize_reencode(media, max_side=MAX_SIDE).select(
        "media_id", "width", "height", "resized", "payload_out"
    )

    def redecode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, w, h, rs, p in zip(
                pdf["media_id"], pdf["width"], pdf["height"],
                pdf["resized"], pdf["payload_out"],
            ):
                ow = oh = ov = None
                if p is not None:
                    real = _decode_image(bytes(p))
                    if real is not None and real[1] is not None:
                        ow, oh, gray = real[1]
                        ov = int(np.rint(gray[0, 0]))
                rows.append(
                    {
                        "media_id": mid,
                        "width": None if pd.isna(w) else int(w),
                        "height": None if pd.isna(h) else int(h),
                        "out_width": ow, "out_height": oh,
                        "resized": bool(rs), "out_value": ov,
                    }
                )
            yield pd.DataFrame(rows)

    return rr.mapInPandas(
        redecode,
        "media_id bigint, width int, height int, out_width int, "
        "out_height int, resized boolean, out_value int",
    )


@register(
    "media_dup_decision",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             doc_id % {N_GROUPS} AS g,
             (doc_id // {N_GROUPS}) % {N_VARIANTS} AS v
      FROM documents
    ),
    d AS (
      SELECT doc_id,
             min(doc_id) OVER (PARTITION BY g, v) AS e_min,
             min(doc_id) OVER (PARTITION BY g) AS p_min
      FROM m
    )
    SELECT doc_id AS media_id,
           CASE WHEN doc_id > e_min THEN 'duplicate_exact'
                WHEN doc_id > p_min THEN 'duplicate_perceptual'
                ELSE 'keep' END AS dup_decision
    FROM d
    """,
    doc="Exact-beats-perceptual dedup precedence end-to-end (reference "
    "validator/integrity.py:389-426): synthesize byte-distinct but "
    "perceptually-identical BMP variants per pattern group, decode for "
    "real, then merge — exact duplicates (same sha256) are removed "
    "first, perceptual groups form over exact-keepers only. The oracle "
    "knows the construction (exact key = (group, variant), perceptual "
    "key = group); Spark must earn both keys through the image path.",
)
def media_dup_decision_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixcrawler_spark.operators.multimodal import (
        decode_media,
        media_dup_decision,
    )

    decoded = decode_media(documents_as_media_variants(spark, sf_dir))
    return media_dup_decision(decoded).select("media_id", "dup_decision")


@register(
    "dedup_perceptual_ahash",
    oracle=f"""
    WITH hashed AS (
      SELECT doc_id,
             substring(md5(CAST(doc_id % {N_GROUPS} AS VARCHAR)), 1, 16) AS ahash
      FROM documents
    )
    SELECT ahash,
           CAST(count(*) AS BIGINT) AS n_dups,
           min(doc_id) AS canonical_doc
    FROM hashed GROUP BY ahash HAVING count(*) > 1
    """,
    doc="Perceptual-duplicate groups via the REAL image path: "
    "synthesize BMP bytes per document, decode them with the numpy BMP "
    "parser, compute the reference 8×8 mean-threshold aHash "
    "(validator/integrity.py:108-127,172-215), group by hash and keep "
    "groups >1 with the min-id canonical (the keep-first rule, "
    "validator/integrity.py:389-426).",
)
def dedup_perceptual_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixcrawler_spark.operators.multimodal import decode_media

    decoded = decode_media(documents_as_media(spark, sf_dir))
    return (
        decoded.groupBy("ahash")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("media_id").alias("canonical_doc"),
        )
        .where(F.col("n_dups") > 1)
    )


@register(
    "dedup_perceptual_ahash_png",
    oracle=f"""
    WITH hashed AS (
      SELECT doc_id,
             substring(md5(CAST(doc_id % {N_GROUPS} AS VARCHAR)), 1, 16) AS ahash
      FROM documents
    )
    SELECT ahash,
           CAST(count(*) AS BIGINT) AS n_dups,
           min(doc_id) AS canonical_doc
    FROM hashed GROUP BY ahash HAVING count(*) > 1
    """,
    doc="The dedup_perceptual_ahash oracle-by-construction, but the "
    "payloads are PNGs: Spark must earn the md5-derived expected hash "
    "through the stdlib PNG path — zlib inflate, per-row unfilter, "
    "grayscale, 8×8 area-mean, mean threshold (operators/multimodal.py "
    "_decode_png). A bug anywhere in the PNG encoder, chunk/CRC "
    "parsing, inflate or unfilter breaks the match.",
)
def dedup_perceptual_ahash_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixcrawler_spark.operators.multimodal import decode_media

    decoded = decode_media(documents_as_media(spark, sf_dir, fmt="png"))
    return (
        decoded.groupBy("ahash")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("media_id").alias("canonical_doc"),
        )
        .where(F.col("n_dups") > 1)
    )


@register(
    "dedup_perceptual_ahash_jpeg",
    oracle=f"""
    WITH hashed AS (
      SELECT doc_id,
             substring(md5(CAST(doc_id % {N_GROUPS} AS VARCHAR)), 1, 16) AS ahash
      FROM documents
    )
    SELECT ahash,
           CAST(count(*) AS BIGINT) AS n_dups,
           min(doc_id) AS canonical_doc
    FROM hashed GROUP BY ahash HAVING count(*) > 1
    """,
    doc="The dedup_perceptual_ahash oracle-by-construction over baseline "
    "JPEG payloads: Spark must earn the md5-derived expected hash "
    "through the pure-numpy JPEG codec — marker/DHT parse, Huffman "
    "entropy decode, dequantize, exact IDCT, YCbCr→RGB "
    "(operators/jpegcodec.py). The encode is LOSSY, so the match "
    "additionally proves the quantization-error bound: block means "
    "move <1 gray level, far inside the 80-level pattern margin. A bug "
    "anywhere in bit-packing, code assignment, zigzag, quant scaling "
    "or the IDCT breaks the match.",
)
def dedup_perceptual_ahash_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pixcrawler_spark.operators.multimodal import decode_media

    decoded = decode_media(documents_as_media(spark, sf_dir, fmt="jpeg"))
    return (
        decoded.groupBy("ahash")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("media_id").alias("canonical_doc"),
        )
        .where(F.col("n_dups") > 1)
    )
