"""Structured Streaming surface: incremental page ingest + live metrics.

The reference's "real-time" layer is SSE polling callbacks
(backend/services/crawl_job.py:997-1154) — not a real stream. The
engine's batch round loop stays the core (SURVEY §2.9), but a
continuously-arriving page corpus (WARC drops landing in object
storage) is a genuine streaming source at 100 TB, so we expose:

- ``stream_pages``: file-source readStream over the pages layout with
  the explicit PAGES_SCHEMA (new parquet files = new micro-batch; on a
  cluster this is the S3/HDFS drop folder);
- ``frontier_candidates_stream``: per-batch projection of new urls
  into frontier-shaped rows (the incremental seed feed);
- ``windowed_lang_metrics``: event-time windowed counts with a
  watermark on warc_ts — late pages beyond the watermark are dropped
  exactly like late task results in the reference's completion dedup
  (crawl_job.py:615-646);
- ``run_available_now``: drains everything currently in the source and
  stops — deterministic for tests, and the idiomatic backfill trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pixcrawler_spark.operators.politeness import domain_expr
from pixcrawler_spark.schemas import PAGES_SCHEMA


def stream_pages(spark: SparkSession, pages_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(pages_dir)
    )


def frontier_candidates_stream(pages: DataFrame) -> DataFrame:
    """New pages → frontier candidate rows (depth 0, engine google)."""
    return pages.select(
        "url",
        domain_expr("url").alias("domain"),
        F.lit(0).cast("int").alias("depth"),
        F.lit("google").alias("engine"),
        F.lit(1.0).alias("score"),
        F.lit(0).cast("int").alias("retry_count"),
        F.lit(0).cast("int").alias("discovered_round"),
    )


def windowed_lang_metrics(
    pages: DataFrame, watermark: str = "1 hour", window: str = "1 day"
) -> DataFrame:
    """Event-time windowed page counts per lang with late-data bound."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.when(F.col("html").isNull(), 1).otherwise(0)).alias("n_null_html"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
            "n_null_html",
        )
    )


def run_available_now(
    df: DataFrame, out_dir: str, checkpoint_dir: str, output_mode: str = "append"
) -> None:
    """Drain the source with the available-now trigger and block until
    done (bounded, deterministic — the backfill/test path)."""
    q = (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
