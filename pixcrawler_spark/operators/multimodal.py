"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference's whole payload is images (PIL decode/verify, dimension
checks, perceptual hash — validator/integrity.py:91-249,462-498). At
100 TB the Spark-side shape is: binary payload column + map<str,str>
metadata, processed by Arrow-batched pandas UDFs over mapInPandas so
each Python worker sees columnar batches, decode libraries never run
on the driver, and partition sizing (maxPartitionBytes) bounds worker
memory.

The decode step itself is STUBBED in this sandbox (no PIL/ffmpeg in
the container): ``decode_image_batch`` raises NotImplementedError
unless ``deterministic_fake=True``, in which case it derives plausible
metadata purely from the bytes (length/first-bytes) so the Spark-side
plumbing — schema, batching, partitioning, UDF signature — is real and
tested end-to-end. Swapping in a real decoder touches ONLY the body of
`_decode_one`.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_FIELDS = (
    "media_id bigint, kind string, n_bytes bigint, format string, "
    "width int, height int, duration_s double, is_valid boolean, "
    "content_sha256 string"
)

_MAGIC = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"RIFF": "wav",
    b"GIF8": "gif",
}


def _sniff_format(payload: bytes) -> str:
    for magic, fmt in _MAGIC.items():
        if payload.startswith(magic):
            return fmt
    return "unknown"


def _decode_one(payload: bytes | None, kind: str, deterministic_fake: bool) -> dict:
    """Stub decode. A production build replaces this body with
    PIL.Image.open/verify (images), soundfile/ffprobe (audio/video) —
    reference semantics: validator/integrity.py:473-498 (verify) and
    :462-471 (dimension extraction)."""
    if payload is None:
        return {
            "n_bytes": 0, "format": None, "width": None, "height": None,
            "duration_s": None, "is_valid": False, "content_sha256": None,
        }
    if not deterministic_fake:
        raise NotImplementedError(
            "media decode requires PIL/ffmpeg (not in this sandbox); "
            "pass deterministic_fake=True for the plumbing path"
        )
    h = hashlib.sha256(payload).hexdigest()
    seed = int(h[:8], 16)
    fmt = _sniff_format(payload)
    valid = fmt != "unknown" and len(payload) >= 16
    return {
        "n_bytes": len(payload),
        "format": fmt,
        "width": 16 + seed % 4096 if kind == "image" else None,
        "height": 16 + (seed >> 12) % 4096 if kind == "image" else None,
        "duration_s": round((seed % 36000) / 100.0, 2) if kind in ("audio", "video") else None,
        "is_valid": valid,
        "content_sha256": h,
    }


def decode_media(df: DataFrame, deterministic_fake: bool = False) -> DataFrame:
    """mapInPandas decode over MEDIA_SCHEMA rows → DECODED_FIELDS rows.

    One Python stage; Arrow moves the binary column in batches. At
    scale, repartition upstream so partitions stay under a few hundred
    MB of payload (spark.sql.files.maxPartitionBytes governs scans)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [
                _decode_one(p, k, deterministic_fake)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            out = pd.DataFrame(meta)
            out.insert(0, "media_id", pdf["media_id"].to_numpy())
            out.insert(1, "kind", pdf["kind"].to_numpy())
            yield out

    return df.mapInPandas(gen, DECODED_FIELDS)


def validity_filter(decoded: DataFrame, min_w: int = 50, min_h: int = 50) -> DataFrame:
    """Dimension/validity gate (validator defaults 50x50; presets
    strict 100x100 / lenient 25x25 — validator/config.py:293-324)."""
    return decoded.where(
        F.col("is_valid")
        & (F.col("kind") != "image")
        | (
            F.col("is_valid")
            & (F.col("width") >= min_w)
            & (F.col("height") >= min_h)
        )
    )


def frame_sample_plan(df: DataFrame, every_s: float = 1.0) -> DataFrame:
    """Video frame-sampling plumbing: explode planned frame timestamps
    (0, every_s, 2*every_s, ... < duration). Decode of each frame is the
    same stubbed boundary. Demonstrates the explode-over-media pattern
    without touching codec libraries."""
    n_frames = F.greatest(
        F.lit(1), F.floor(F.col("duration_s") / F.lit(every_s)).cast("int")
    )
    return (
        df.where((F.col("kind") == "video") & F.col("is_valid"))
        .withColumn(
            "frame_ts_s",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n_frames - 1),
                    lambda i: i.cast("double") * F.lit(every_s),
                )
            ),
        )
        .select("media_id", "frame_ts_s")
    )


def resize_plan(
    decoded: DataFrame, max_side: int = 512
) -> DataFrame:
    """Aspect-preserving resize planning: target dimensions computed
    JVM-side (pure arithmetic — no decode needed). The pixel resample
    itself shares the stubbed decode boundary (`_decode_one`); this is
    the half of 'resize' that is pure dataflow: every image larger than
    ``max_side`` gets scaled dims, smaller ones pass through."""
    scale = F.greatest(F.col("width"), F.col("height")) / F.lit(float(max_side))
    needs = (F.col("kind") == "image") & (
        F.greatest(F.col("width"), F.col("height")) > max_side
    )
    tw = F.when(needs, F.round(F.col("width") / scale).cast("int")).otherwise(
        F.col("width")
    )
    th = F.when(needs, F.round(F.col("height") / scale).cast("int")).otherwise(
        F.col("height")
    )
    return decoded.where(F.col("kind") == "image").select(
        "media_id",
        "width",
        "height",
        needs.alias("needs_resize"),
        tw.alias("target_width"),
        th.alias("target_height"),
    )


FEATURE_FIELDS = "media_id bigint, feature array<float>"


def feature_extract(
    df: DataFrame, dim: int = 16, deterministic_fake: bool = False
) -> DataFrame:
    """Media → embedding plumbing: binary payload to array<float> via
    an Arrow-batched pandas UDF (the shape every downstream ANN /
    near-dup operator consumes — operators/similarity.py). The real
    model inference replaces `_fake_vec`; schema, batching and the
    vectorized transport are the production path."""
    import hashlib as _hl

    import numpy as np

    def _fake_vec(payload: bytes | None) -> list[float]:
        if payload is None:
            return [0.0] * dim
        h = _hl.sha256(payload).digest()
        raw = (h * ((dim * 4) // len(h) + 1))[: dim * 4]
        v = np.frombuffer(raw, dtype=np.uint32)[:dim].astype(np.float64)
        v = (v % 2000) / 1000.0 - 1.0
        return [float(round(x, 6)) for x in v]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "feature extraction requires a model runtime; pass "
                    "deterministic_fake=True for the plumbing path"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": [_fake_vec(p) for p in pdf["payload"]],
                }
            )

    return df.select("media_id", "payload").mapInPandas(gen, FEATURE_FIELDS)
