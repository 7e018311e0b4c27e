"""Distributed prefix sums (running totals) without a one-task window.

``SUM(x) OVER (PARTITION BY part ORDER BY ord)`` puts every row of a
partition into ONE window task — for a per-language running token sum
over a 100 TB corpus that is a single straggler task per language, the
classic window-scalability failure. This operator computes the same
running total in two phases, the textbook parallel scan:

1. bucket rows by ``floor(ord / bucket_width)`` and aggregate one sum
   per (part, bucket) — a normal map-side-combined shuffle;
2. prefix-sum the tiny bucket frame (#rows = #buckets, a
   ``bucket_width``-fold reduction, so the single-task window runs
   over ~10^6 rows when the input has 10^12) and join the exclusive
   bucket offsets back;
3. finish with a within-bucket running sum — a window whose partitions
   are (part, bucket), i.e. parallelism = #buckets, each task bounded
   by ``bucket_width`` rows.

The result is EXACTLY the running total of the naive window (asserted
against it in tests/test_prefixsum.py) with no task ever holding more
than ``bucket_width`` input rows. Pick ``bucket_width`` ~ sqrt(rows
per part) to balance the bucket frame against the within-bucket tasks.

Reference analog: none — the reference (alaamer12/PixCrawler) never
computes running totals; this exists for the shard-packing /
budget-allocation paths a training-data pipeline needs
(queries/datasel.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def partitioned_cumsum(
    df: DataFrame,
    part_cols: list[str],
    order_col: str,
    value_col: str,
    out_col: str = "cum_before",
    bucket_width: int = 256,
) -> DataFrame:
    """Append ``out_col`` = EXCLUSIVE running sum of ``value_col``
    within each ``part_cols`` group ordered by ``order_col`` (the sum
    of all STRICTLY-earlier rows; first row gets 0).

    ``order_col`` must be unique within a group (ties would make "the
    running sum" ill-defined across engines) and numeric, since
    bucketing divides it.
    """
    bucket = (F.col(order_col) / bucket_width).cast("bigint").alias("_psbkt")
    with_bucket = df.withColumn("_psbkt", bucket)

    # phase 1: one sum per (part, bucket)
    bucket_sums = with_bucket.groupBy(*part_cols, "_psbkt").agg(
        F.sum(value_col).alias("_psbktsum")
    )
    # phase 2: exclusive prefix over the bucket frame (tiny: rows/width)
    wb = (
        Window.partitionBy(*part_cols)
        .orderBy("_psbkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bucket_sums.select(
        *part_cols,
        "_psbkt",
        F.coalesce(F.sum("_psbktsum").over(wb), F.lit(0)).alias("_psoff"),
    )
    # phase 3: within-bucket exclusive running sum, parallel per bucket
    ww = (
        Window.partitionBy(*part_cols, "_psbkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        with_bucket.join(offsets, [*part_cols, "_psbkt"])
        .withColumn(
            out_col,
            F.col("_psoff")
            + F.coalesce(F.sum(value_col).over(ww), F.lit(0)),
        )
        .drop("_psbkt", "_psoff")
    )
