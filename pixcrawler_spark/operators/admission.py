"""Per-user tier concurrency admission (reference:
backend/services/crawl_job.py:110-257 — free/hobby/pro concurrent-job
limits enforced by counting a user's active+reserved Celery tasks).

Spark-first shape: the pending-jobs table joins a BROADCAST tier-limit
dim, a per-user window ranks jobs by arrival order, and ``admitted``
is ``rank <= tier_limit`` — the snapshot equivalent of the reference's
"count my running jobs, reject if at limit" check, applied to a whole
job queue at once. Deferred jobs stay queued (the RateLimitExceeded
path becomes a boolean, exactly like politeness stalls in the crawl
round).

Scale: one shuffle on user_id (hash-uniform). Labeling BOTH admit and
defer necessarily ranks every row; when a caller needs only the
admitted slice, filtering ``queue_rank <= <literal max limit>``
(conjoined with the per-tier column bound, as admit() in politeness
does) lets Spark's WindowGroupLimit rule cut map-side so a user with
10^6 queued jobs contributes at most max_limit rows per map task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Reference tier limits (backend/services/crawl_job.py:124-128).
TIER_LIMITS: dict[str, int] = {"free": 1, "hobby": 3, "pro": 10}


def tier_limits_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        sorted(TIER_LIMITS.items()), "tier string, tier_limit int"
    )


def tier_admission(
    jobs: DataFrame,
    tiers: DataFrame,
    user_col: str = "user_id",
    tier_col: str = "tier",
    order_cols: tuple[str, ...] = ("job_id",),
    default_limit: int = 1,
) -> DataFrame:
    """Append (tier_limit, queue_rank, admitted) to a jobs table.

    ``jobs`` needs (user_col, tier_col, *order_cols); ``tiers`` is the
    (tier, tier_limit) dim (broadcast — it is a handful of rows).
    Unknown tiers fall back to ``default_limit`` (the reference treats
    unknown as free)."""
    max_limit = max(TIER_LIMITS.values())
    joined = jobs.join(F.broadcast(tiers), tier_col, "left").withColumn(
        "tier_limit", F.coalesce("tier_limit", F.lit(default_limit))
    )
    w = Window.partitionBy(user_col).orderBy(*[F.asc(c) for c in order_cols])
    return joined.withColumn(
        "queue_rank", F.row_number().over(w)
    ).withColumn(
        "admitted",
        (F.col("queue_rank") <= F.lit(max_limit))
        & (F.col("queue_rank") <= F.col("tier_limit")),
    )
