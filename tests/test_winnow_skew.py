"""Adversarial-boilerplate probe for the winnowing similarity join —
VERDICT r4 item 7 (mirrors the planted-skew dedup probe pattern,
tests/test_dedup_skew.py).

A template-heavy web corpus shares large boilerplate blocks (headers,
nav, license banners) across a large fraction of documents. Every
k-gram fingerprint selected from a shared 500-char block appears in
EVERY sharing document, so the naive inverted-index self-join puts
m·(m-1)/2 candidate rows on each of the ~2/(w+1)·(500-k+1) boilerplate
fingerprints — quadratic candidate mass that dwarfs the true-pair
signal. Unlike the exact-dup band-join case the mass is spread over
~200 DISTINCT hash keys (md5 is uniform), so the failure mode at scale
is total shuffle/join blowup, not one hot task; the guard under test
is the ``max_df`` join-key cap in
``operators/winnow.winnow_similarity_pairs`` (same stop-shingle
pattern as ``dedup.ngram_jaccard_pairs``).

Assertions:
- capped candidate mass stays LINEAR in corpus size while the uncapped
  negative control carries the quadratic boilerplate mass (>= 50x);
- per-task balance of the capped join (max <= 2x mean, AQE off);
- semantics survive the cap: planted true near-dup pairs are reported,
  boilerplate-only pairs are not (their shared counts die with the
  capped keys while the UNCAPPED overlap denominator keeps their
  scores honest);
- the pairs query on the boilerplate-planted corpus stays under 2x its
  wall-time on an equal-text-volume clean corpus (the judge's bound;
  the planted run does strictly less join work once the cap bites, so
  the headroom absorbs host noise).
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from pixcrawler_spark.operators import winnow

K, W = 8, 4
MAX_DF = 64
THRESHOLD = 0.5

N_UNIQUE = 280  # docs with fully unique text
N_BOILER = 120  # docs sharing one 500-char boilerplate block (30%)
N_NEAR = 15  # planted true near-dup PAIRS (unique text, ~90% shared)

BOILER = " ".join(f"boilertok{j}q{(j * 37) % 997}" for j in range(55))[:500]


def _unique_text(i: int, n_tokens: int = 28) -> str:
    return " ".join(
        f"u{i}t{j}x{(i * 131 + j * 17) % 99991}" for j in range(n_tokens)
    )


def _planted_corpus(spark, boilerplate: bool):
    """Corpus with 30% boilerplate-sharing docs. ``boilerplate=False``
    yields the clean control: SAME doc count and per-doc text length,
    but each 'boilerplate' slot gets a unique filler block instead —
    so any wall-time delta between the two fixtures is join-side key
    skew, not scan volume."""
    rows = []
    doc_id = 0
    for i in range(N_UNIQUE):
        rows.append((doc_id, _unique_text(i)))
        doc_id += 1
    for i in range(N_BOILER):
        block = (
            BOILER
            if boilerplate
            else " ".join(
                f"f{i}b{j}z{(i * 61 + j * 13) % 9973}" for j in range(55)
            )[:500]
        )
        rows.append((doc_id, block + " " + _unique_text(10_000 + i, 12)))
        doc_id += 1
    for p in range(N_NEAR):
        base = _unique_text(20_000 + p, 40)
        rows.append((doc_id, base + f" tailalpha{p}"))
        rows.append((doc_id + 1, base + f" tailbeta{p}"))
        doc_id += 2
    return spark.createDataFrame(rows, "doc_id long, text string")


def _fset(df):
    return (
        winnow.winnow_fingerprints(df, "doc_id", "text", k=K, w=W)
        .select("doc_id", "fp_hash")
        .distinct()
    )


def _candidate_join(fset, max_df):
    """The same inverted-index self-join layout
    winnow_similarity_pairs builds internally, pre-aggregation."""
    joinable = fset
    if max_df is not None:
        keep = (
            fset.groupBy("fp_hash")
            .agg(F.count("*").alias("_df"))
            .where(F.col("_df") <= max_df)
            .select("fp_hash")
        )
        joinable = fset.join(F.broadcast(keep), "fp_hash")
    a = joinable.select(F.col("doc_id").alias("id_a"), "fp_hash")
    b = joinable.select(F.col("doc_id").alias("id_b"), "fp_hash")
    return a.join(b, "fp_hash").where(F.col("id_a") < F.col("id_b"))


@pytest.fixture()
def noaqe(spark):
    """Raw hash-partition balance, as in test_dedup_skew: AQE coalesce
    and fixture-scale auto-broadcast would hide the shuffle layout that
    exists at corpus scale."""
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    spark.conf.set("spark.sql.shuffle.partitions", old_sp)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)


def test_df_cap_removes_quadratic_boilerplate_mass(noaqe):
    spark = noaqe
    fset = _fset(_planted_corpus(spark, boilerplate=True)).persist()
    try:
        n_docs = N_UNIQUE + N_BOILER + 2 * N_NEAR

        capped = _candidate_join(fset, MAX_DF)
        n_capped = capped.count()
        # linear regime: the only surviving candidates are the planted
        # near-dup pairs' shared fingerprints (~2/(w+1) density over
        # ~40 shared tokens each) plus hash-coincidence stragglers
        assert n_capped < 20 * n_docs, (
            f"capped candidate mass {n_capped} is not linear in "
            f"{n_docs} docs — the df cap stopped biting"
        )

        # negative control: uncapped join carries the boilerplate
        # cliques' quadratic mass (~197 fps x 120·119/2 pairs each)
        n_naive = _candidate_join(fset, None).count()
        assert n_naive > 50 * max(n_capped, 1), (
            f"negative control failed — uncapped mass {n_naive} vs "
            f"capped {n_capped}; strengthen the boilerplate fixture"
        )

        # per-task balance of the guarded join
        loads = [
            r["count"]
            for r in capped.select(
                F.spark_partition_id().alias("pid")
            )
            .groupBy("pid")
            .count()
            .collect()
        ]
        assert loads
        mean = sum(loads) / len(loads)
        assert max(loads) <= 2 * mean, (
            f"hot task in capped winnow join: max={max(loads)} "
            f"vs mean={mean:.1f} over {len(loads)} tasks"
        )
    finally:
        fset.unpersist()


def test_semantics_survive_the_cap(spark):
    docs = _planted_corpus(spark, boilerplate=True)
    pairs = winnow.winnow_similarity_pairs(
        docs, "doc_id", "text", k=K, w=W,
        max_df=MAX_DF, threshold=THRESHOLD,
    ).toPandas()
    got = {(int(a), int(b)) for a, b in zip(pairs.id_a, pairs.id_b)}

    near_lo = N_UNIQUE + N_BOILER
    planted = {(near_lo + 2 * p, near_lo + 2 * p + 1) for p in range(N_NEAR)}
    missing = planted - got
    assert not missing, f"planted near-dup pairs lost to the cap: {missing}"

    # no boilerplate-only pair: docs whose ONLY commonality is the
    # shared block must not be reported — their shared fingerprints are
    # all df-capped out of join duty and the uncapped denominator keeps
    # any residue far below threshold
    boiler_ids = set(range(N_UNIQUE, N_UNIQUE + N_BOILER))
    spurious = {
        p for p in got if p[0] in boiler_ids and p[1] in boiler_ids
    }
    assert not spurious, (
        f"{len(spurious)} boilerplate-only pairs reported, e.g. "
        f"{sorted(spurious)[:3]}"
    )


def test_boilerplate_time_under_2x_clean(spark):
    """The judge's bound: the pairs query on the boilerplate-planted
    corpus must stay under 2x its wall-time on the equal-volume clean
    fixture. Warmed run each; the capped plan does strictly LESS join
    work on the planted corpus, so 2x is generous host-noise headroom,
    not a tight perf target."""

    def run(boilerplate: bool) -> float:
        docs = _planted_corpus(spark, boilerplate)
        t0 = time.monotonic()
        winnow.winnow_similarity_pairs(
            docs, "doc_id", "text", k=K, w=W,
            max_df=MAX_DF, threshold=THRESHOLD,
        ).write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    run(False)  # untimed warmup: codegen + shuffle-service init
    clean = min(run(False) for _ in range(2))
    planted = min(run(True) for _ in range(2))
    assert planted < 2 * clean, (
        f"boilerplate corpus {planted:.2f}s vs clean {clean:.2f}s — "
        "over the 2x bound; the df cap is not containing the skew"
    )
