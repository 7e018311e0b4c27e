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


def test_stream_unseen_urls_dedup(spark, tmp_path):
    """Stateful streaming dedup: a url arriving in a later micro-batch
    is suppressed (the streaming seen-set)."""
    import pyarrow as pa

    from pixcrawler_spark.streaming.ingest import stream_unseen_urls

    d = tmp_path / "dup_stream"
    d.mkdir()
    ts = pa.array(
        [1704067200000000 + i for i in range(4)], pa.timestamp("us")
    )
    mk = lambda urls: pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": ts[: len(urls)],
            "html": pa.array([b"x"] * len(urls), pa.binary()),
            "text": pa.array(["x"] * len(urls), pa.string()),
            "lang": pa.array(["en"] * len(urls), pa.string()),
        }
    )
    pq.write_table(mk(["u1", "u2", "u3", "u1"]), str(d / "b0.parquet"))
    pq.write_table(mk(["u2", "u4"]), str(d / "b1.parquet"))
    src = stream_pages(spark, str(d))
    out = str(tmp_path / "unseen_out")
    run_available_now(
        stream_unseen_urls(src).select("url"), out, str(tmp_path / "ckpt_u")
    )
    urls = sorted(r["url"] for r in spark.read.parquet(out).collect())
    assert urls == ["u1", "u2", "u3", "u4"]


def test_politeness_bucket_stream_state(spark, tmp_path):
    """applyInPandasWithState token bucket: per-domain admissions are
    capacity-bounded ACROSS micro-batches (state persists)."""
    import pyarrow as pa

    from pixcrawler_spark.streaming.ingest import politeness_bucket_stream

    d = tmp_path / "cand_stream"
    d.mkdir()
    mk = lambda rows: pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "domain": pa.array([r[1] for r in rows], pa.string()),
            "depth": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    # batch 0: 3 candidates for dA, 1 for dB; batch 1: 2 more for dA
    pq.write_table(
        mk([("a1", "dA", 0), ("a2", "dA", 0), ("a3", "dA", 1), ("b1", "dB", 0)]),
        str(d / "b0.parquet"),
    )
    pq.write_table(mk([("a4", "dA", 0), ("a5", "dA", 2)]), str(d / "b1.parquet"))
    src = (
        spark.readStream.schema("url string, domain string, depth int")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    out = str(tmp_path / "bucket_out")
    run_available_now(
        politeness_bucket_stream(src, capacity=3), out, str(tmp_path / "ckpt_b")
    )
    got = {
        r["url"]: r["admitted"] for r in spark.read.parquet(out).collect()
    }
    assert len(got) == 6
    # dA admitted exactly 3 total across both batches; dB its 1
    admitted_a = [u for u, a in got.items() if a and u.startswith("a")]
    assert len(admitted_a) == 3
    assert got["b1"] is True
    # the two extra dA candidates were deferred
    assert sum(1 for u, a in got.items() if not a and u.startswith("a")) == 2


def test_windowed_hll_matches_batch_and_exact(spark, pages_stream_dir):
    """Streaming HLL registers == batch registers over the same data
    (max-merge determinism), and the folded estimate tracks the exact
    per-window distinct count."""
    from pixcrawler_spark.operators import sketches as sk
    from pixcrawler_spark.streaming.ingest import windowed_hll_registers

    src = stream_pages(spark, pages_stream_dir)
    q = (
        windowed_hll_registers(src, watermark="1 hour", window="1 day")
        .writeStream.format("memory")
        .queryName("hllreg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.sql("SELECT * FROM hllreg")

    batch = spark.read.parquet(pages_stream_dir).select(
        F.window("warc_ts", "1 day").alias("w"), "url"
    ).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "url",
    )
    batch_reg = sk.hll_registers(
        batch, ["window_start", "window_end"], F.col("url")
    )
    # register-level identity: same (window, bucket) -> same rho
    joined = streamed.join(
        batch_reg.withColumnRenamed("rho", "rho_b"),
        ["window_start", "window_end", "bucket"],
        "full",
    )
    assert joined.where(
        F.col("rho").isNull()
        | F.col("rho_b").isNull()
        | (F.col("rho") != F.col("rho_b"))
    ).count() == 0

    est = {
        (r["window_start"], r["window_end"]): r["hll_distinct"]
        for r in sk.hll_estimate(
            streamed, ["window_start", "window_end"]
        ).collect()
    }
    exact = {
        (r["window_start"], r["window_end"]): r["c"]
        for r in batch.groupBy("window_start", "window_end")
        .agg(F.countDistinct("url").alias("c"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, e in est.items():
        assert abs(e - exact[k]) / exact[k] < 0.15, (k, e, exact[k])


def test_windowed_cms_matches_batch(spark, pages_stream_dir):
    """Streaming CMS counters == batch counters over the same data
    (SUM-merge determinism)."""
    from pixcrawler_spark.operators import sketches as sk
    from pixcrawler_spark.operators.politeness import domain_expr
    from pixcrawler_spark.streaming.ingest import windowed_cms_counters

    src = stream_pages(spark, pages_stream_dir)
    q = (
        windowed_cms_counters(src, watermark="1 hour", window="1 day")
        .writeStream.format("memory")
        .queryName("cmsreg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.sql("SELECT * FROM cmsreg")
    assert streamed.count() > 0
    batch_pages = spark.read.parquet(pages_stream_dir).select(
        F.window("warc_ts", "1 day").alias("w"), "url"
    ).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        domain_expr("url").alias("k"),
    )
    key = F.col("k")
    rows = F.explode(
        F.array(
            *[
                F.struct(F.lit(j).alias("j"), sk.cms_bucket(key, j))
                for j in range(sk.CMS_DEPTH)
            ]
        )
    ).alias("e")
    batch = (
        batch_pages.select("window_start", "window_end", rows)
        .select(
            "window_start", "window_end",
            F.col("e.j").alias("j"), F.col("e.bucket").alias("bucket"),
        )
        .groupBy("window_start", "window_end", "j", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt_b"))
    )
    joined = streamed.join(
        batch, ["window_start", "window_end", "j", "bucket"], "full"
    )
    assert joined.where(
        F.col("cnt").isNull()
        | F.col("cnt_b").isNull()
        | (F.col("cnt") != F.col("cnt_b"))
    ).count() == 0


def test_windowed_histogram_matches_batch_and_bounds_quantiles(
    spark, pages_stream_dir
):
    """Streaming histogram registers == batch registers over the same
    data (SUM-merge determinism), and the folded p95 estimate is within
    one bin width ABOVE the exact p95 (upper-edge read-out)."""
    from pixcrawler_spark.operators import sketches as sk
    from pixcrawler_spark.streaming.ingest import windowed_value_histogram

    # deterministic pseudo-latency per url (no latency col in PAGES_SCHEMA)
    latency = (F.abs(F.hash("url")) % 500).cast("double")

    src = stream_pages(spark, pages_stream_dir)
    q = (
        windowed_value_histogram(
            src, latency, F.col("lang"), watermark="1 hour", window="1 day"
        )
        .writeStream.format("memory")
        .queryName("histreg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.sql("SELECT * FROM histreg")

    batch_rows = spark.read.parquet(pages_stream_dir).select(
        F.window("warc_ts", "1 day").alias("w"),
        F.col("lang").alias("key"),
        latency.alias("latency"),
    ).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "key",
        "latency",
    )
    batch_reg = sk.hist_counts(
        batch_rows,
        ["window_start", "window_end", "key"],
        F.col("latency"),
    )

    # register-level identity: same (window, key, bin) -> same count
    joined = streamed.withColumnRenamed("c", "c_s").join(
        batch_reg.withColumnRenamed("c", "c_b"),
        ["window_start", "window_end", "key", "bin"],
        "full",
    )
    assert joined.where(
        F.col("c_s").isNull()
        | F.col("c_b").isNull()
        | (F.col("c_s") != F.col("c_b"))
    ).count() == 0

    # folded p95 within one bin width above the discrete p95 order
    # statistic (rank ceil(0.95 n) sits IN the crossing bin, so the
    # upper-edge read-out bounds it from above by <= one bin width)
    import math

    est = {
        (r["window_start"], r["key"]): r["p95_est"]
        for r in sk.hist_quantiles(
            streamed, ["window_start", "window_end", "key"]
        ).collect()
    }
    pdf = batch_rows.toPandas()
    exact = {}
    for (ws, _we, key), grp in pdf.groupby(
        ["window_start", "window_end", "key"]
    ):
        v = sorted(grp["latency"])
        exact[(ws, key)] = v[math.ceil(0.95 * len(v)) - 1]
    assert est.keys() == exact.keys() and len(est) > 0
    for k, e in est.items():
        assert exact[k] <= e <= exact[k] + sk.HIST_W, (k, e, exact[k])


def test_sessionized_domains_match_batch_lag_algorithm(
    spark, pages_stream_dir
):
    """Streaming session windows == a batch lag+gap-split+cumsum
    sessionization (a DIFFERENT algorithm) over the same pages:
    same (domain, first_ts, last_ts, n_pages) session set, and
    session_end = last event + gap."""
    from pyspark.sql import Window

    from pixcrawler_spark.operators.politeness import domain_expr
    from pixcrawler_spark.streaming.ingest import (
        sessionized_domain_metrics,
        stream_pages,
    )

    gap_s = 7200
    src = stream_pages(spark, pages_stream_dir)
    q = (
        sessionized_domain_metrics(src, watermark="1 hour", gap="2 hours")
        .writeStream.format("memory")
        .queryName("sess")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.sql("SELECT * FROM sess").toPandas()
    assert (
        (streamed["session_end"] - streamed["last_ts"]).dt.total_seconds()
        == gap_s
    ).all()
    assert (streamed["session_start"] == streamed["first_ts"]).all()

    w = Window.partitionBy("domain").orderBy("warc_ts")
    batch = (
        spark.read.parquet(pages_stream_dir)
        .select(domain_expr("url").alias("domain"), "warc_ts")
        .withColumn("prev", F.lag("warc_ts").over(w))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev").isNull()
                | (
                    F.col("warc_ts")
                    >= F.col("prev") + F.expr(f"INTERVAL {gap_s} SECONDS")
                ),
                1,
            ).otherwise(0),
        )
        .withColumn("sid", F.sum("new_sess").over(w))
        .groupBy("domain", "sid")
        .agg(
            F.min("warc_ts").alias("first_ts"),
            F.max("warc_ts").alias("last_ts"),
            F.count(F.lit(1)).alias("n_pages"),
        )
        .toPandas()
    )
    key = ["domain", "first_ts", "last_ts", "n_pages"]
    got = streamed[key].sort_values(key, ignore_index=True)
    want = batch[key].sort_values(key, ignore_index=True)
    assert got.equals(want), (len(got), len(want))
