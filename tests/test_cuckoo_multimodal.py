"""Cuckoo filter (insert/lookup/delete, in-round dedup) and multimodal
decode plumbing (stubbed decode, validity gate, frame sampling)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pixcrawler_spark.operators.cuckoo import CuckooFilter, partition_dedup
from pixcrawler_spark.operators.multimodal import (
    decode_media,
    frame_sample_plan,
    validity_filter,
)


# -- cuckoo filter -------------------------------------------------------------
def test_cuckoo_insert_contains_delete():
    cf = CuckooFilter(capacity=10_000, seed=1)
    rng = np.random.default_rng(0)
    keys = rng.integers(1, 2**63, size=5000).astype(np.uint64)
    fresh = cf.insert_hashes(keys)
    assert fresh.all()
    assert cf.contains_hashes(keys).all()
    # re-insert → all detected as duplicates
    again = cf.insert_hashes(keys[:100])
    assert not again.any()
    # delete restores insertability
    assert cf.delete_hashes(keys[:100]).all()
    assert cf.insert_hashes(keys[:100]).all()


def test_cuckoo_false_positive_rate_bounded():
    cf = CuckooFilter(capacity=20_000, seed=2)
    rng = np.random.default_rng(3)
    present = rng.integers(1, 2**63, size=10_000).astype(np.uint64)
    cf.insert_hashes(present)
    absent = rng.integers(1, 2**63, size=10_000).astype(np.uint64)
    fp = cf.contains_hashes(absent).mean()
    assert fp < 0.01  # 16-bit fingerprints → ~2^-13 expected


def test_partition_dedup_drops_repeats(spark):
    df = spark.createDataFrame(
        [(f"u{i % 50}", i) for i in range(500)], "url string, v int"
    ).coalesce(1)
    out = partition_dedup(df, "url")
    assert out.count() == 50
    assert out.select("url").distinct().count() == 50


# -- multimodal ----------------------------------------------------------------
@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNG" + b"x" * 100, {"src": "a"}, None),
        (2, "image", b"\xff\xd8\xff" + b"y" * 50, {}, None),
        (3, "image", b"zz", {}, None),          # too short / unknown → invalid
        (4, "audio", b"RIFF" + b"w" * 64, {}, None),
        (5, "video", b"RIFF" + b"v" * 640, {}, None),
        (6, "image", None, {}, None),            # null payload
    ]
    from pixcrawler_spark.schemas import MEDIA_SCHEMA

    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_stub_raises_without_fake(media):
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        decode_media(media, deterministic_fake=False).collect()


def test_decode_fake_plumbing(media):
    out = decode_media(media, deterministic_fake=True)
    rows = {r["media_id"]: r for r in out.collect()}
    assert rows[1]["format"] == "png" and rows[1]["is_valid"]
    assert rows[2]["format"] == "jpeg"
    assert not rows[3]["is_valid"]
    assert rows[4]["duration_s"] is not None and rows[4]["width"] is None
    assert not rows[6]["is_valid"] and rows[6]["n_bytes"] == 0
    # deterministic: same bytes → same metadata
    again = {r["media_id"]: r for r in decode_media(media, deterministic_fake=True).collect()}
    assert rows == again


def test_validity_and_frame_sampling(media):
    decoded = decode_media(media, deterministic_fake=True)
    ok = validity_filter(decoded, min_w=1, min_h=1)
    assert {r["media_id"] for r in ok.collect()} <= {1, 2, 4, 5}
    frames = frame_sample_plan(decoded, every_s=1.0)
    fr = frames.where(F.col("media_id") == 5).collect()
    assert len(fr) >= 1
    assert all(abs(r["frame_ts_s"] - i * 1.0) < 1e-9 for i, r in enumerate(fr))


def test_resize_plan(spark):
    from pixcrawler_spark.operators.multimodal import resize_plan

    decoded = spark.createDataFrame(
        [(1, "image", 1024, 512, True), (2, "image", 100, 50, True),
         (3, "audio", None, None, True)],
        "media_id long, kind string, width int, height int, is_valid boolean",
    )
    got = {r["media_id"]: r.asDict() for r in resize_plan(decoded, max_side=512).collect()}
    assert set(got) == {1, 2}
    assert got[1]["needs_resize"] and got[1]["target_width"] == 512 and got[1]["target_height"] == 256
    assert not got[2]["needs_resize"] and got[2]["target_width"] == 100


def test_feature_extract_plumbing(spark):
    from pixcrawler_spark.operators.multimodal import feature_extract

    media = spark.createDataFrame(
        [(1, bytearray(b"\x89PNGxxxxxxxxxxxxxxx")), (2, None)],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: list(r["feature"]) for r in
            feature_extract(media, dim=8, deterministic_fake=True).collect()}
    assert len(rows[1]) == 8 and all(-1.0 <= x <= 1.0 for x in rows[1])
    assert rows[2] == [0.0] * 8
    # deterministic across runs
    rows2 = {r["media_id"]: list(r["feature"]) for r in
             feature_extract(media, dim=8, deterministic_fake=True).collect()}
    assert rows == rows2
