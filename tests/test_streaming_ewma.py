"""Streaming/batch EWMA parity: the applyInPandasWithState per-host
EWMA (streaming/ingest.py) folded across THREE separate micro-batches
— each a separate availableNow drain sharing one checkpoint, so state
survives two full query restarts — must agree with the batch
closed-form query (crawl_hostload_ewma) over the same observations."""

from __future__ import annotations

from pyspark.sql import functions as F

from pixcrawler_spark.queries import REGISTRY
from pixcrawler_spark.streaming.ingest import (
    hostload_ewma_stream,
    run_available_now,
)

SF = "/root/testdata/sf0.001"
OBS_SCHEMA = (
    "domain string, latency_ms double, ts timestamp, event_id long"
)


def test_streaming_ewma_matches_batch_closed_form(spark, tmp_path):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    obs = ev.select(
        F.concat(F.lit("h"), (F.col("user_id") % 50).cast("string")).alias(
            "domain"
        ),
        F.col("value").alias("latency_ms"),
        "ts",
        F.col("event_id").cast("long").alias("event_id"),
    )

    # split by time into 3 ordered files; arrivals respect event time
    # across batches (the recursion's ordering contract)
    bounds = obs.approxQuantile("event_id", [0.33, 0.66], 0.0)
    parts = [
        obs.where(F.col("event_id") <= bounds[0]),
        obs.where(
            (F.col("event_id") > bounds[0])
            & (F.col("event_id") <= bounds[1])
        ),
        obs.where(F.col("event_id") > bounds[1]),
    ]

    src = tmp_path / "obs_src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    for i, part in enumerate(parts):
        # one new file per drain -> one micro-batch; the shared
        # checkpoint resumes state across the query restarts
        part.coalesce(1).write.parquet(str(src / f"batch_{i}"))
        stream = spark.readStream.schema(OBS_SCHEMA).option(
            "pathGlobFilter", "*.parquet"
        ).parquet(f"{src}/*")
        run_available_now(hostload_ewma_stream(stream), out, ckpt)

    got = spark.read.parquet(out).toPandas()
    # last emitted row per host = the live forecast
    final = (
        got.sort_values("n_obs").groupby("domain").tail(1).set_index("domain")
    )

    batch = (
        REGISTRY["crawl_hostload_ewma"]
        .fn(spark, SF)
        .toPandas()
        .set_index("domain")
    )
    assert set(final.index) == set(batch.index)
    for dom in batch.index:
        assert final.loc[dom, "n_obs"] == batch.loc[dom, "n_obs"], dom
        # streaming folds the textbook recursion; batch computes the
        # closed form ROUNDED to 4 decimals (registry float rule) —
        # identical math up to float association + that rounding
        assert (
            abs(round(final.loc[dom, "ewma_ms"], 4) - batch.loc[dom, "ewma_ms"])
            < 1e-9 + 1e-6 * max(1.0, batch.loc[dom, "ewma_ms"])
        ), dom
    # every host emitted once per micro-batch that contained it: the
    # state genuinely folded across restarts (not recomputed from one
    # batch), so per-host emission counts exceed 1 somewhere
    assert (got.groupby("domain").size() > 1).any()


def test_streaming_cusum_matches_recursion(spark, tmp_path):
    """Per-host streaming CUSUM folded across two restarts equals the
    textbook max(0, .) recursion over the full ordered series."""
    from pixcrawler_spark.streaming.ingest import hostload_cusum_stream

    TARGET, SLACK, H = 50.0, 5.0, 200.0
    ev = spark.read.parquet(f"{SF}/events.parquet")
    obs = ev.select(
        F.concat(F.lit("h"), (F.col("user_id") % 10).cast("string")).alias(
            "domain"
        ),
        F.col("value").alias("latency_ms"),
        "ts",
        F.col("event_id").cast("long").alias("event_id"),
    )
    mid = obs.approxQuantile("event_id", [0.5], 0.0)[0]
    parts = [
        obs.where(F.col("event_id") <= mid),
        obs.where(F.col("event_id") > mid),
    ]
    src = tmp_path / "cusum_src"
    out, ckpt = str(tmp_path / "cusum_out"), str(tmp_path / "cusum_ckpt")
    src.mkdir()
    for i, part in enumerate(parts):
        part.coalesce(1).write.parquet(str(src / f"batch_{i}"))
        stream = spark.readStream.schema(OBS_SCHEMA).parquet(f"{src}/*")
        run_available_now(
            hostload_cusum_stream(stream, TARGET, SLACK, H), out, ckpt
        )

    got = spark.read.parquet(out).toPandas()
    final = (
        got.sort_values("n_obs").groupby("domain").tail(1).set_index("domain")
    )
    pdf = obs.toPandas().sort_values(["ts", "event_id"])
    for dom, grp in pdf.groupby("domain"):
        s, alarmed = 0.0, False
        for x in grp["latency_ms"]:
            s = max(0.0, s + x - TARGET - SLACK)
            alarmed = alarmed or s > H
        assert final.loc[dom, "n_obs"] == len(grp), dom
        assert abs(final.loc[dom, "s"] - s) < 1e-6 * max(1.0, s), dom
        # state carries across batches, so ANY crossing in the full
        # series is observed by exactly the batch it happens in: the
        # union of per-batch alarms equals the sequential alarm
        assert bool(got[got.domain == dom]["alarmed"].any()) == alarmed, dom
