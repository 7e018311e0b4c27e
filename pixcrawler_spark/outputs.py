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


LABEL_COLUMNS = (
    "category", "category_id", "url", "seq_name", "depth", "round",
    "text_chars", "n_outlinks", "warc_ts",
)
_LABEL_STRING_COLS = {"category", "url", "seq_name", "warc_ts"}


def _yaml_quote(col):
    """Single-quote a string for single-line (flow) YAML: embedded
    single quotes double. JVM expressions only — the serializer stays
    in whole-stage codegen, no Python in the write path."""
    return F.concat(F.lit("'"), F.regexp_replace(col, "'", "''"), F.lit("'"))


def _label_line(fmt: str):
    """One label row → one serialized line (txt / yaml), as a Column.

    - ``yaml``: a single-line flow mapping ``{category: 'x', ...}`` —
      valid YAML per record, so a distributed text sink (one record per
      line) works; strings are single-quoted (urls contain ``:``).
    - ``txt``: the reference's ``key: value`` lines
      (builder/_generator.py:896-932) tab-joined into one record.
    """
    parts = []
    for c in LABEL_COLUMNS:
        base = (
            F.date_format(c, "yyyy-MM-dd HH:mm:ss")
            if c == "warc_ts"
            else F.col(c).cast("string")
        )
        if fmt == "yaml" and c in _LABEL_STRING_COLS:
            base = _yaml_quote(base)
        parts.append(F.concat(F.lit(f"{c}: "), base))
    if fmt == "yaml":
        joined = parts[0]
        for p in parts[1:]:
            joined = F.concat(joined, F.lit(", "), p)
        return F.concat(F.lit("{"), joined, F.lit("}"))
    joined = parts[0]
    for p in parts[1:]:
        joined = F.concat(joined, F.lit("\t"), p)
    return joined


def write_labels(
    results: DataFrame,
    out_dir: str,
    formats: tuple[str, ...] = ("json", "csv", "txt", "yaml"),
) -> dict[str, str]:
    """Write label projections in the requested formats; returns paths.
    All four reference formats (builder/_generator.py:662-736,896-1040)
    serialize the same rows: json/csv via the native Spark sinks,
    txt/yaml via a JVM string-serializer column + the distributed text
    sink (per-row writer loops collapse into distributed writes)."""
    rows = label_rows(results)
    paths = {}
    for fmt in formats:
        path = os.path.join(out_dir, f"labels_{fmt}")
        if fmt == "json":
            rows.write.mode("overwrite").json(path)
        elif fmt == "csv":
            rows.write.mode("overwrite").option("header", True).csv(path)
        elif fmt in ("txt", "yaml"):
            rows.select(_label_line(fmt).alias("value")).write.mode(
                "overwrite"
            ).text(path)
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
    storage classes).

    Scale: NO global window (a partitionBy-less row_number would drag
    the whole table through one task). Instead the boundary KEY at rank
    ``hot_threshold`` is computed from the narrow key columns alone —
    each map task contributes its local top-K keys, a single reducer
    reduces K keys to one boundary value — and the split is then two
    fully distributed lexicographic filters against that literal. Exact
    when the order key is unique (url is); under ties every row equal
    to the boundary lands hot."""
    hot = os.path.join(out_dir, "hot")
    cold = os.path.join(out_dir, "cold")
    key_cols = [F.col(c) for c in order_cols]
    boundary = None
    if hot_threshold > 0:
        row = (
            results.select(F.struct(*key_cols).alias("_k"))
            .orderBy(F.asc("_k"))
            .limit(hot_threshold)
            .agg(F.max("_k").alias("m"))
            .collect()[0]
        )
        boundary = row["m"]
    if boundary is None:
        is_hot = F.lit(False)
    else:
        # lexicographic (c1..ck) <= boundary, built column-wise so no
        # struct literal is needed
        is_hot = F.lit(True)
        for c, v in reversed(list(zip(key_cols, list(boundary)))):
            is_hot = (c < F.lit(v)) | ((c == F.lit(v)) & is_hot)
    (
        results.where(is_hot)
        .write.mode("overwrite")
        .option("compression", hot_codec)
        .parquet(hot)
    )
    (
        results.where(~is_hot)
        .write.mode("overwrite")
        .option("compression", cold_codec)
        .parquet(cold)
    )
    return {"hot": hot, "cold": cold}
