"""Tier admission + smart retry ladder: reference truth tables
(backend/services/crawl_job.py:124-128; builder/_keywords.py:458-473,
538-564) checked directly, beyond the DuckDB oracle gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from pixcrawler_spark.operators import keywords as kw
from pixcrawler_spark.operators.admission import (
    TIER_LIMITS,
    tier_admission,
    tier_limits_df,
)

# The reference's progressive band table (builder/_keywords.py:458-473).
REFERENCE_BANDS = {
    **{r: (1, 2) for r in range(0, 3)},
    **{r: (1, 2, 3) for r in range(3, 5)},
    **{r: (2, 3, 4) for r in range(5, 7)},
    **{r: (3, 4, 5) for r in range(7, 9)},
    **{r: (4, 5, 6) for r in range(9, 11)},
    **{r: (5, 6, 7) for r in range(11, 13)},
    **{r: (6, 7, 8) for r in range(13, 16)},
}


def test_strategy_band_truth_table(spark):
    """For every retry count, the selected strategy must come from the
    reference's band for that count — across many keywords."""
    rows = [(f"kw{k}", r) for k in range(20) for r in range(0, 16)]
    df = spark.createDataFrame(rows, "keyword string, rc int")
    out = df.select(
        "keyword", "rc",
        kw.smart_strategy_id_expr(F.col("keyword"), F.col("rc")).alias("sid"),
    ).collect()
    for r in out:
        assert r["sid"] in REFERENCE_BANDS[r["rc"]], (r["keyword"], r["rc"], r["sid"])
    # higher bands are actually reached (not stuck on one strategy)
    assert len({r["sid"] for r in out}) == 8


def test_alternatives_cap_and_original_first(spark):
    df = spark.createDataFrame(
        [("cats", r) for r in range(0, 20)], "keyword string, rc int"
    )
    rows = df.select(
        "rc",
        kw.smart_alternatives_expr(F.col("keyword"), F.col("rc")).alias("alts"),
    ).collect()
    for r in rows:
        alts = list(r["alts"])
        assert alts[0] == "cats"  # original always first
        # cap: at most 15 generated + the original
        assert len(alts) <= kw.MAX_ALTERNATIVES + 1
        assert len(alts) == len(set(alts))  # deduped
        assert all("cats" in a for a in alts)  # keyword embedded in every term
    # low retry → exactly 3 generated terms unless dedup collapsed some
    r0 = next(list(r["alts"]) for r in rows if r["rc"] == 0)
    assert 2 <= len(r0) <= 4


def test_strategy_term_composition(spark):
    """Strategy terms embed the picked category terms: spot-check that
    strategy 3 output is camera + lighting + style + keyword."""
    df = spark.createDataFrame([("dogs", 1)], "keyword string, rc int")
    term = df.select(
        kw.smart_strategy_term_expr(
            F.col("keyword"), F.col("rc"), F.lit(3)
        ).alias("t")
    ).collect()[0]["t"]
    assert term.endswith(" dogs")
    body = term[: -len(" dogs")]
    cams, lights, styles = (
        kw.SMART_TERMS["camera"], kw.SMART_TERMS["lighting"], kw.SMART_TERMS["style"]
    )
    assert any(body.startswith(c) for c in cams)
    assert any(s == body.rsplit(" ", 1)[-1] or body.endswith(s) for s in styles)
    assert any(l in body for l in lights)


def test_tier_admission_never_exceeds_limit(spark):
    jobs = spark.createDataFrame(
        [
            (j, f"u{j % 7}", ("free", "hobby", "pro")[(j % 7) % 3])
            for j in range(200)
        ],
        "job_id long, user_id string, tier string",
    )
    out = tier_admission(jobs, tier_limits_df(spark))
    per_user = (
        out.where("admitted")
        .groupBy("user_id", "tier")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert per_user
    for r in per_user:
        assert r["n"] <= TIER_LIMITS[r["tier"]], r
    # deferred jobs keep their rank ordering: the admitted set is the
    # arrival-order prefix
    rows = out.collect()
    by_user: dict[str, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r["job_id"])
        admitted_flags = [r["admitted"] for r in rs]
        # prefix property: once deferred, never admitted later
        assert admitted_flags == sorted(admitted_flags, reverse=True)


def test_unknown_tier_defaults_to_one(spark):
    jobs = spark.createDataFrame(
        [(1, "u1", "mystery"), (2, "u1", "mystery")],
        "job_id long, user_id string, tier string",
    )
    out = {r["job_id"]: r for r in
           tier_admission(jobs, tier_limits_df(spark)).collect()}
    assert out[1]["admitted"] and not out[2]["admitted"]
    assert out[1]["tier_limit"] == 1
