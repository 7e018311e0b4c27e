"""Streaming/batch politeness parity — VERDICT r3 item 6.

The applyInPandasWithState token bucket (streaming/ingest.py) and the
batch window-ranked ``admit()`` (operators/politeness.py) implement the
same semantics: per registrable domain, at most ``capacity`` candidates
admitted, chosen in priority order (depth asc, score desc, url asc).
This asserts row-for-row equivalence of the admitted sets on a shared
fixture driven through BOTH paths.
"""

from pyspark.sql import functions as F

from pixcrawler_spark.operators import politeness as pol
from pixcrawler_spark.streaming.ingest import (
    politeness_bucket_stream,
    run_available_now,
)

CAPACITY = 10


def _candidates(spark):
    """5 domains x 30 urls, varying depth and score — more candidates
    than capacity everywhere so admission decisions are non-trivial."""
    rows = []
    for d in range(5):
        for i in range(30):
            rows.append(
                (
                    f"https://d{d}.example/p/{i:03d}",
                    f"d{d}.example",
                    (i * 7) % 4,            # depth 0-3, interleaved
                    float((i * 13) % 17),   # score, ties included
                )
            )
    return spark.createDataFrame(
        rows, "url string, domain string, depth int, score double"
    )


def test_streaming_bucket_matches_batch_admit(spark, tmp_path):
    cand = _candidates(spark)

    # --- batch path: window-ranked admission with capacity == CAPACITY ---
    batch_in = cand.withColumn(
        "crawl_delay_s", F.lit(0.0)
    ).withColumn("max_per_round", F.lit(CAPACITY))
    batch = pol.admit(batch_in)
    batch_admitted = {
        (r["domain"], r["url"])
        for r in batch.where("admitted").select("domain", "url").collect()
    }
    assert len(batch_admitted) == 5 * CAPACITY

    # --- streaming path: one availableNow drain through the state fn ---
    src_dir = str(tmp_path / "cand_src")
    # one file -> one micro-batch: both engines see the same window of
    # candidates (cross-batch arrival order is a different, weaker
    # contract tested in test_streaming.py)
    cand.coalesce(1).write.parquet(src_dir)
    stream = (
        spark.readStream.schema("url string, domain string, depth int, score double")
        .parquet(src_dir)
    )
    out_dir = str(tmp_path / "out")
    run_available_now(
        politeness_bucket_stream(stream, capacity=CAPACITY),
        out_dir,
        str(tmp_path / "ckpt"),
    )
    got = spark.read.parquet(out_dir)
    stream_admitted = {
        (r["domain"], r["url"])
        for r in got.where("admitted").select("domain", "url").collect()
    }

    assert stream_admitted == batch_admitted
    # and the full decision row set covers every candidate exactly once
    assert got.count() == cand.count()
    assert got.select("url").distinct().count() == cand.count()


def test_adaptive_delay_tightens_capacity(spark):
    """admit() with adaptive_delay_s: effective delay is
    greatest(robots, adaptive); robots 0 + slow host => adaptive
    governs instead of unlimited."""
    cand = _candidates(spark)
    base = cand.withColumn("max_per_round", F.lit(25))

    # robots delay 2s, round 60s -> floor(60/2)=30 -> cap = 25 (max)
    robots_only = pol.admit(
        base.withColumn("crawl_delay_s", F.lit(2.0)), round_len_s=60.0
    )
    assert robots_only.where("admitted").count() == 5 * 25

    # adaptive 6s > robots 2s -> floor(60/6)=10 per domain
    adaptive = pol.admit(
        base.withColumn("crawl_delay_s", F.lit(2.0)).withColumn(
            "adaptive_delay_s", F.lit(6.0)
        ),
        round_len_s=60.0,
    )
    assert adaptive.where("admitted").count() == 5 * 10

    # robots floor still wins when it is the larger: adaptive 1s
    floor_wins = pol.admit(
        base.withColumn("crawl_delay_s", F.lit(4.0)).withColumn(
            "adaptive_delay_s", F.lit(1.0)
        ),
        round_len_s=60.0,
    )
    assert floor_wins.where("admitted").count() == 5 * 15

    # no robots directive (0) + slow host: adaptive replaces unlimited
    no_directive = pol.admit(
        base.withColumn("crawl_delay_s", F.lit(0.0)).withColumn(
            "adaptive_delay_s", F.lit(12.0)
        ),
        round_len_s=60.0,
    )
    assert no_directive.where("admitted").count() == 5 * 5

    # null adaptive (domain with no latency history) degrades to robots
    null_adaptive = pol.admit(
        base.withColumn("crawl_delay_s", F.lit(2.0)).withColumn(
            "adaptive_delay_s", F.lit(None).cast("double")
        ),
        round_len_s=60.0,
    )
    assert null_adaptive.where("admitted").count() == 5 * 25
