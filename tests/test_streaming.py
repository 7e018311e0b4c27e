"""Structured Streaming ingest: file-source drain, frontier candidate
projection, watermarked windowed metrics."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from pixcrawler_spark.fixtures import FixtureSpec, generate_pages
from pixcrawler_spark.streaming.ingest import (
    frontier_candidates_stream,
    run_available_now,
    stream_pages,
    windowed_lang_metrics,
)


@pytest.fixture(scope="module")
def pages_stream_dir(tmp_path_factory):
    """Pages split across several files — each is a micro-batch unit."""
    d = tmp_path_factory.mktemp("pages_stream")
    t = generate_pages(FixtureSpec(rows=1200, seed=9))
    for i in range(3):
        pq.write_table(t.slice(i * 400, 400), str(d / f"part-{i}.parquet"))
    return str(d)


def test_stream_drain_to_frontier(spark, pages_stream_dir, tmp_path):
    src = stream_pages(spark, pages_stream_dir)
    assert src.isStreaming
    out = str(tmp_path / "frontier_out")
    run_available_now(
        frontier_candidates_stream(src), out, str(tmp_path / "ckpt")
    )
    got = spark.read.parquet(out)
    assert got.count() == 1200
    assert got.select("url").distinct().count() == 1200
    row = got.first()
    assert row["depth"] == 0 and row["engine"] == "google"
    # incremental: new file arrives → only the delta is processed
    t = generate_pages(FixtureSpec(rows=1300, seed=9))
    pq.write_table(t.slice(1200, 100), os.path.join(pages_stream_dir, "part-3.parquet"))
    run_available_now(
        frontier_candidates_stream(stream_pages(spark, pages_stream_dir)),
        out,
        str(tmp_path / "ckpt"),
    )
    assert spark.read.parquet(out).count() == 1300


def test_windowed_metrics_with_watermark(spark, pages_stream_dir):
    src = stream_pages(spark, pages_stream_dir)
    metrics = windowed_lang_metrics(src, watermark="1 hour", window="1 day")
    q = (
        metrics.writeStream.format("memory")
        .queryName("langmetrics")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM langmetrics")
    assert got.count() > 0
    # counts reconcile with the batch view
    batch = spark.read.parquet(pages_stream_dir)
    assert (
        got.agg(F.sum("n_pages")).collect()[0][0] == batch.count()
    )
    assert got.where(F.col("window_start") > F.col("window_end")).count() == 0
