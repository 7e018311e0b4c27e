"""Per-host PID budget control for the politeness scheduler.

The scheduler stack so far: crawl_hostload_ewma FILTERS the latency
signal, stats_cusum_changepoint DETECTS regime changes; this operator
CLOSES THE LOOP — a discrete PID controller per host turning the
latency error into next-round fetch budgets:

    e_t = target - x_t
    I_t = sum_{j<=t} e_j          (windowed cumulative integral)
    D_t = e_t - e_{t-1}           (lag difference)
    budget_t = clamp(base + Kp e_t + Ki I_t + Kd D_t, lo, hi)

A host running FASTER than target (positive error) earns budget; a
host degrading loses it, with the integral term removing steady-state
offset and the derivative damping oscillation — the textbook discrete
PID (Astrom & Murray, Feedback Systems) on the politeness key.

Scale shape: ONE host-keyed window (ordered by round within host —
the politeness partitioning again, shuffle already paid by the
scheduler); cumsum + lag are both frames over that window; the clamp
is map-side. State for an incremental round-over-round deployment is
(I, prev_e) per host — two scalars, same O(1)-state contract as the
streaming EWMA/CUSUM twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pid_budget"]


def pid_budget(
    obs: DataFrame,
    host_col: str = "domain",
    t_col: str = "round",
    x_col: str = "latency_ms",
    target: float = 200.0,
    base: float = 10.0,
    kp: float = 0.02,
    ki: float = 0.005,
    kd: float = 0.01,
    lo: float = 1.0,
    hi: float = 100.0,
) -> DataFrame:
    """Per-(host, t) PID budget over a latency series.

    Returns (host, t, x, error, integral, derivative, budget) with
    budget = clamp(base + kp*e + ki*I + kd*D, lo, hi) and budget
    floored to an integer fetch count. Deterministic: ties are
    impossible (t is the per-host round index).
    """
    part = Window.partitionBy(host_col)
    w = part.orderBy(t_col)
    e = F.lit(target) - F.col(x_col)
    cur = obs.select(
        F.col(host_col).alias("host"),
        F.col(t_col).alias("t"),
        F.col(x_col).alias("x"),
        e.alias("error"),
        F.sum(e).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("integral"),
        (e - F.lag(e, 1, None).over(w)).alias("_d"),
    )
    raw = (
        F.lit(base)
        + kp * F.col("error")
        + ki * F.col("integral")
        + kd * F.coalesce(F.col("_d"), F.lit(0.0))
    )
    return cur.select(
        "host",
        "t",
        "x",
        "error",
        "integral",
        F.coalesce(F.col("_d"), F.lit(0.0)).alias("derivative"),
        F.floor(
            F.least(F.lit(hi), F.greatest(F.lit(lo), raw))
        ).cast("int").alias("budget"),
    )
