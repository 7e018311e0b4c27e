"""Output projections: labels, category index, sequential names, report.

Reference analogs (file:line into /root/reference):
- label files per image in txt/json/csv/yaml + dataset metadata
  (builder/_generator.py:662-736,896-1040) → one select() projection
  written once via df.write.json/csv — per-row writer loops collapse
  into a distributed sink;
- category index name→id, sorted (builder/_generator.py:702-736) →
  dense_rank over sorted distinct;
- sequential zero-padded rename (builder/_helpers.py:128-245) →
  row_number window + format_string (the temp-dir copy/delete/move
  dance disappears: names are values, not filesystem state);
- dataset summary/tracker report (builder/progress.py:157-235) →
  one aggregate row.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def category_index(results: DataFrame, category_col: str = "domain") -> DataFrame:
    """Sorted category names → contiguous ids 0..n-1."""
    return (
        results.select(F.col(category_col).alias("category"))
        .distinct()
        .withColumn(
            "category_id", F.dense_rank().over(Window.orderBy("category")) - 1
        )
    )


def sequential_names(
    results: DataFrame,
    group_col: str = "domain",
    order_cols: tuple[str, ...] = ("url",),
    pad: int = 4,
) -> DataFrame:
    """Deterministic zero-padded per-group sequence names.

    Padding rule mirrors the reference (width >= max(3, digits) with a
    fixed default of 4, builder/_helpers.py:221-232,245)."""
    w = Window.partitionBy(group_col).orderBy(*[F.asc(c) for c in order_cols])
    return results.withColumn(
        "seq_name",
        F.format_string(f"%0{pad}d", F.row_number().over(w)),
    )


def label_rows(results: DataFrame) -> DataFrame:
    """Per-item label projection: the reference's per-image label file
    columns (category, keyword→url, dimensions→depth/round metadata,
    timestamp — builder/_generator.py:982-984), one row per fetched
    item."""
    fetched = results.where(F.col("fetch_decision") == "fetched")
    named = sequential_names(fetched)
    idx = category_index(fetched)
    return (
        named.join(F.broadcast(idx), named["domain"] == idx["category"])
        .select(
            F.col("category"),
            F.col("category_id"),
            F.col("url"),
            F.col("seq_name"),
            F.col("depth"),
            F.col("round"),
            F.length("text").alias("text_chars"),
            F.size("outlinks").alias("n_outlinks"),
            F.col("warc_ts"),
        )
    )


def write_labels(results: DataFrame, out_dir: str, formats: tuple[str, ...] = ("json", "csv")) -> dict[str, str]:
    """Write label projections in the requested formats; returns paths.
    (yaml/txt variants of the reference are serialization of the same
    rows; json/csv are the two Spark-native sinks.)"""
    rows = label_rows(results)
    paths = {}
    for fmt in formats:
        path = os.path.join(out_dir, f"labels_{fmt}")
        if fmt == "json":
            rows.write.mode("overwrite").json(path)
        elif fmt == "csv":
            rows.write.mode("overwrite").option("header", True).csv(path)
        else:
            raise ValueError(f"unsupported label format: {fmt}")
        paths[fmt] = path
    return paths


def dataset_report(results: DataFrame) -> DataFrame:
    """One-row crawl summary (tracker report analog): totals, success
    rate, dedup-able url count, per-decision counts."""
    return results.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.countDistinct("url").alias("n_urls"),
        F.countDistinct("domain").alias("n_domains"),
        F.sum(F.when(F.col("fetch_decision") == "fetched", 1).otherwise(0)).alias(
            "n_fetched"
        ),
        F.sum(
            F.when(F.col("fetch_decision") == "robots_denied", 1).otherwise(0)
        ).alias("n_robots_denied"),
        F.round(
            F.sum(F.when(F.col("fetch_decision") == "fetched", 1).otherwise(0))
            / F.count(F.lit(1)),
            4,
        ).alias("success_rate"),
        F.max("round").alias("n_rounds"),
    )


def write_archive_tiers(
    results: DataFrame,
    out_dir: str,
    hot_threshold: int,
    order_cols: tuple[str, ...] = ("url",),
    hot_codec: str = "snappy",
    cold_codec: str = "zstd",
) -> dict[str, str]:
    """Storage-tiering + compression sink (reference: hot/warm archive
    pipeline, utility/compress/pipeline.py:63-233 + tier split
    backend/services/dataset_processing_pipeline.py:488-534): the first
    ``hot_threshold`` rows by deterministic order land in ``hot/`` with
    a cheap codec, the rest in ``cold/`` with zstd — the re-encode +
    tar/zstd archive step collapses into parquet codec options on two
    distributed writes (a real deployment points these at different
    storage classes)."""
    w = Window.orderBy(*[F.asc(c) for c in order_cols])
    ranked = results.withColumn("_rn", F.row_number().over(w))
    hot = os.path.join(out_dir, "hot")
    cold = os.path.join(out_dir, "cold")
    (
        ranked.where(F.col("_rn") <= hot_threshold)
        .drop("_rn")
        .write.mode("overwrite")
        .option("compression", hot_codec)
        .parquet(hot)
    )
    (
        ranked.where(F.col("_rn") > hot_threshold)
        .drop("_rn")
        .write.mode("overwrite")
        .option("compression", cold_codec)
        .parquet(cold)
    )
    return {"hot": hot, "cold": cold}
