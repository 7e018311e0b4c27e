"""Baseline JPEG codec tests: exact flats, bounded lossy error on
texture, corruption predicate, aHash survival for every oracle group,
and the Spark decode path end-to-end."""

from __future__ import annotations

import hashlib

import numpy as np

from pixcrawler_spark.operators.jpegcodec import jpeg_decode, jpeg_encode


def _pattern(group: int) -> np.ndarray:
    digest = hashlib.md5(str(group).encode()).digest()
    bits = np.unpackbits(np.frombuffer(digest[:8], dtype=np.uint8))
    blocks = np.where(bits, 200, 40).astype(np.uint8).reshape(8, 8)
    return np.repeat(np.repeat(blocks, 8, 0), 8, 1)


def test_flat_images_roundtrip_exact():
    # flat blocks have only a DC coefficient; quantized DC error is the
    # sole error source and rounds away for these values
    for val, shape in ((180, (16, 24)), (77, (13, 19)), (0, (8, 8)), (255, (9, 17))):
        img = np.full(shape, val, np.uint8)
        out = jpeg_decode(jpeg_encode(img), want_rgb=True)
        assert out is not None
        w, h, gray, rgb = out
        assert (w, h) == (shape[1], shape[0])
        assert np.abs(gray - val).max() <= 1.0
        assert (rgb[:, :, 0] == rgb[:, :, 2]).all()


def test_color_flat_roundtrip():
    px = np.zeros((24, 40, 3), np.uint8)
    px[:] = (60, 120, 200)
    w, h, _gray, rgb = jpeg_decode(jpeg_encode(px), want_rgb=True)
    assert (w, h) == (40, 24)
    assert np.abs(rgb.astype(int) - np.array([60, 120, 200])).max() <= 2


def test_textured_error_bounded():
    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (32, 48), dtype=np.uint8)
    b = jpeg_encode(np.stack([base] * 3, -1), quality=90)
    dec = jpeg_decode(b, want_rgb=True)
    assert dec is not None
    err = np.abs(dec[3][:, :, 0].astype(float) - base.astype(float))
    # random noise is the worst case for DCT quantization; q90 keeps it
    # far from structural damage
    assert err.mean() < 8 and err.max() < 64


def test_corruption_predicate():
    b = jpeg_encode(np.full((32, 32), 140, np.uint8))
    assert jpeg_decode(b[: len(b) // 2]) is None  # truncated scan
    assert jpeg_decode(b[:3]) is None
    assert jpeg_decode(b"\xff\xd8\xff\xee") is None
    assert jpeg_decode(b"not a jpeg at all") is None
    # progressive SOF2 declared unsupported, not misparsed
    assert jpeg_decode(b.replace(b"\xff\xc0", b"\xff\xc2", 1)) is None


def test_ahash_survives_all_oracle_groups():
    """The by-construction oracle's load-bearing claim: for every md5
    pattern group the perceptual hash is IDENTICAL after the lossy
    round-trip (block-mean error < 1 level vs an 80-level margin)."""
    from pixcrawler_spark.operators.multimodal import ahash8

    for group in range(300):
        px = _pattern(group)
        out = jpeg_decode(jpeg_encode(np.stack([px] * 3, -1), quality=90))
        assert out is not None
        assert ahash8(out[2]) == hashlib.md5(str(group).encode()).digest()[:8].hex()


def test_decode_media_jpeg_path(spark):
    from pixcrawler_spark.operators.multimodal import decode_media

    good = jpeg_encode(np.stack([_pattern(5)] * 3, -1), quality=90)
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(good)),
            (2, "image", bytearray(good[: len(good) // 2])),  # corrupt
        ],
        "media_id long, kind string, payload binary",
    )
    rows = {r["media_id"]: r for r in decode_media(media).collect()}
    assert rows[1]["format"] == "jpeg" and rows[1]["is_valid"]
    assert (rows[1]["width"], rows[1]["height"]) == (64, 64)
    assert rows[1]["ahash"] == hashlib.md5(b"5").digest()[:8].hex()
    assert rows[2]["format"] == "jpeg" and not rows[2]["is_valid"]
    assert rows[2]["ahash"] is None


def test_resize_reencode_jpeg(spark):
    from pixcrawler_spark.operators.multimodal import resize_reencode

    flat = np.zeros((60, 100, 3), np.uint8)
    flat[:] = (90, 90, 90)
    media = spark.createDataFrame(
        [(1, "image", bytearray(jpeg_encode(flat)))],
        "media_id long, kind string, payload binary",
    )
    r = resize_reencode(media, max_side=50).collect()[0]
    assert (r["out_width"], r["out_height"]) == (50, 30)
    assert r["out_format"] == "jpeg" and r["resized"]
    out = jpeg_decode(bytes(r["payload_out"]), want_rgb=True)
    assert out is not None and (out[0], out[1]) == (50, 30)
    assert np.abs(out[3].astype(int) - 90).max() <= 2


def test_bitreader_acc_stays_bounded():
    """Regression: _BitReader._fill must mask off consumed bits.

    Without the mask, ``acc`` grows into an unbounded bignum and each
    shift is O(bytes consumed), making decode quadratic in stream
    length (an executor-hang DoS for ~1 MB crawl JPEGs). Asserting the
    invariant directly is deterministic under any host weather, unlike
    a wall-clock bound.
    """
    from pixcrawler_spark.operators.jpegcodec import _BitReader

    data = bytes((i * 37 + 11) % 255 for i in range(200_000))  # no 0xFF
    r = _BitReader(data, 0)
    consumed = 0
    while consumed + 7 < len(data) * 8:
        r.bits(7)
        consumed += 7
        assert r.acc.bit_length() <= 16, "acc grew unbounded: _fill lost its mask"


def test_large_jpeg_decodes_fast():
    """A ~1 MB entropy stream must decode in seconds, not minutes."""
    import time

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(512, 512, 3), dtype=np.uint8)
    blob = jpeg_encode(img)
    assert len(blob) > 200_000  # noise compresses poorly: big scan
    t0 = time.monotonic()
    out = jpeg_decode(blob, want_rgb=True)
    dt = time.monotonic() - t0
    assert out is not None and (out[0], out[1]) == (512, 512)
    # linear decode measures ~0.5-2 s; the quadratic bug took >50 s at
    # a quarter of this size. 30 s leaves 10x+ headroom for bad hosts.
    assert dt < 30, f"jpeg decode took {dt:.1f}s - quadratic regression?"
