"""Two-phase distributed prefix sum: exactness vs the naive one-task
window, bucket-boundary edge cases, and the parallelism claim."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pixcrawler_spark.operators.prefixsum import partitioned_cumsum


def _naive(df, part, order, value):
    w = (
        Window.partitionBy(*part)
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return df.withColumn(
        "cum_before", F.coalesce(F.sum(value).over(w), F.lit(0))
    )


def test_matches_naive_window(spark):
    # ids deliberately sparse + out of order, values include zeros;
    # several groups, group sizes straddle multiple buckets at width 4
    rows = [
        (lang, i * 3 + (7 if lang == "b" else 0), (i * 13) % 9)
        for lang in ("a", "b", "c")
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "lang string, ord long, v long").repartition(8)
    got = {
        (r["lang"], r["ord"]): r["cum_before"]
        for r in partitioned_cumsum(
            df, ["lang"], "ord", "v", bucket_width=4
        ).collect()
    }
    want = {
        (r["lang"], r["ord"]): r["cum_before"]
        for r in _naive(df, ["lang"], "ord", "v").collect()
    }
    assert got == want and len(got) == 150


def test_single_row_groups_and_width_one(spark):
    df = spark.createDataFrame(
        [("x", 5, 42), ("y", 0, 7), ("y", 1, 1)], "lang string, ord long, v long"
    )
    got = sorted(
        (r["lang"], r["ord"], r["cum_before"])
        for r in partitioned_cumsum(
            df, ["lang"], "ord", "v", bucket_width=1
        ).collect()
    )
    assert got == [("x", 5, 0), ("y", 0, 0), ("y", 1, 7)]


def test_window_partitions_are_buckets(spark):
    """The scalability claim: the phase-3 window must partition by
    (part, bucket), never by the group alone — visible in the plan as
    a window whose partition spec includes the bucket column."""
    df = spark.createDataFrame(
        [("a", i, 1) for i in range(100)], "lang string, ord long, v long"
    )
    plan = (
        partitioned_cumsum(df, ["lang"], "ord", "v", bucket_width=10)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "_psbkt" in plan  # bucket column reaches the window specs
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
