"""Adversarial-boilerplate probe for the bottom-k containment join
(mirrors tests/test_winnow_skew.py and the planted-skew dedup probe).

A template-heavy corpus shares a boilerplate block across a large
fraction of documents. Uncapped, a boiler document's bottom-k probe is
dominated by boilerplate shingle-hashes (md5 order is uniform over the
full set), and every such probe hits every other sharing document —
candidate mass ~ m * k * m for m sharers, quadratic in the template's
reach. The guard under test is the ``max_df`` broadcast-anti cap in
``operators/dedup.containment_bottomk_pairs``: boilerplate hashes
never become probe OR target keys, so candidate mass collapses to the
true-signal joins.

Assertions:
- capped candidate mass is >= 50x below the uncapped negative control;
- semantics survive the cap: planted subset-dup pairs (short doc fully
  contained in a longer one) are reported at containment 1.0 in the
  A->B direction, boilerplate-only pairs are not;
- the pairs computation on the boilerplate corpus stays under 2x its
  wall-time on an equal-volume clean corpus.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from pixcrawler_spark.operators import dedup as dd

K = 16
MAX_DF = 64
N_UNIQUE = 280  # fully unique docs
N_BOILER = 120  # docs sharing one boilerplate block (30%)
N_NEAR = 15  # planted containment PAIRS: short doc subset of long doc

BOILER = " ".join(f"boilertok{j}q{(j * 37) % 997}" for j in range(55))


def _unique_text(tag: str, i: int, n_tokens: int = 28) -> str:
    return " ".join(f"{tag}{i}t{j}x{(i * 131 + j * 17) % 9973}"
                    for j in range(n_tokens))


def _planted_corpus(spark, boilerplate: bool):
    rows = []
    for i in range(N_UNIQUE):
        rows.append((i, _unique_text("u", i)))
    for i in range(N_BOILER):
        tail = _unique_text("b", i, 10)
        body = (BOILER + " " + tail) if boilerplate else _unique_text(
            "c", i, 65
        )
        rows.append((1000 + i, body))
    for i in range(N_NEAR):
        short = _unique_text("n", i, 12)
        long = short + " " + _unique_text("m", i, 30)
        rows.append((2000 + i, short))
        rows.append((3000 + i, long))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _candidate_mass(df, max_df) -> int:
    """Candidate rows of the probe->target join, with/without the cap
    (reimplements the operator's stages so the uncapped negative
    control exists without a production code path for it)."""
    dsh = (
        dd.with_shingles(df, "doc_id", "text", 3)
        .select("doc_id", F.md5("shingle").alias("h"))
        .distinct()
    )
    if max_df is not None:
        hot = (
            dsh.groupBy("h")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_df)
            .select("h")
        )
        dsh = dsh.join(F.broadcast(hot), "h", "left_anti")
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("h")
    probes = (
        dsh.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= K)
        .select("doc_id", "h")
    )
    return (
        probes.alias("p")
        .join(
            dsh.alias("t"),
            (F.col("p.h") == F.col("t.h"))
            & (F.col("p.doc_id") != F.col("t.doc_id")),
        )
        .count()
    )


def test_cap_collapses_boilerplate_candidate_mass(spark):
    df = _planted_corpus(spark, boilerplate=True).persist()
    df.count()
    capped = _candidate_mass(df, MAX_DF)
    uncapped = _candidate_mass(df, None)
    assert uncapped >= 50 * max(capped, 1), (capped, uncapped)
    df.unpersist()


def test_semantics_survive_the_cap(spark):
    df = _planted_corpus(spark, boilerplate=True)
    pairs = dd.containment_bottomk_pairs(
        df, "doc_id", "text", n=3, k=K, max_df=MAX_DF, threshold=0.5
    ).toPandas()
    got = {(r.a_id, r.b_id) for r in pairs.itertuples()}
    # every planted short->long containment is found at 1.0
    for i in range(N_NEAR):
        assert (2000 + i, 3000 + i) in got, i
        row = pairs[(pairs.a_id == 2000 + i) & (pairs.b_id == 3000 + i)]
        assert float(row["containment"].iloc[0]) == 1.0
    # no boilerplate-only pair: two boiler docs share ONLY the capped
    # block, so neither direction may be reported
    boiler_ids = set(range(1000, 1000 + N_BOILER))
    assert not any(
        a in boiler_ids and b in boiler_ids for a, b in got
    )


def test_boilerplate_walltime_bounded(spark):
    def run(boilerplate: bool) -> float:
        df = _planted_corpus(spark, boilerplate)
        t0 = time.monotonic()
        dd.containment_bottomk_pairs(
            df, "doc_id", "text", n=3, k=K, max_df=MAX_DF, threshold=0.5
        ).write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    run(True)  # JIT/codegen warm-up on the same shapes
    clean = run(False)
    dirty = run(True)
    assert dirty < 2.0 * clean + 1.0, (clean, dirty)


def test_decision_form_collapses_cliques(spark):
    """Decision form: exact-dup cliques collapse before the probe
    join, members inherit the representative's decision, and output
    is exactly one row per input doc."""
    rows = []
    # clique of 8 identical docs (ids 0-7)
    clique_text = _unique_text("q", 0, 40)
    for i in range(8):
        rows.append((i, clique_text))
    # short doc 100 contained in long doc 200
    short = _unique_text("s", 1, 12)
    rows.append((100, short))
    rows.append((200, short + " " + _unique_text("l", 1, 30)))
    # an unrelated doc
    rows.append((300, _unique_text("z", 2, 28)))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got = (
        dd.containment_dup_decision(
            df, "doc_id", "text", n=3, k=K, max_df=MAX_DF, threshold=0.5
        )
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(got) == len(rows)  # one decision per input doc
    # clique members all inherit the rep's (id 0) decision: the rep
    # is not contained in any other distinct text
    for i in range(8):
        assert not got.loc[i, "is_subset_dup"], i
    # the planted containment is decided on the short side
    assert got.loc[100, "is_subset_dup"]
    assert got.loc[100, "contained_in"] == 200
    assert not got.loc[200, "is_subset_dup"]
    assert not got.loc[300, "is_subset_dup"]


def test_decision_form_linear_on_dup_heavy_corpus(spark):
    """The decision form's probe join sees only representatives: on a
    corpus where every doc belongs to a 10-replica clique, candidate
    mass equals the collapsed corpus's, not the 10x one."""
    base = [(i, _unique_text("r", i, 30)) for i in range(60)]
    heavy = [
        (i * 100 + r, t) for i, t in base for r in range(10)
    ]  # 600 docs, 60 distinct texts
    df_heavy = spark.createDataFrame(heavy, "doc_id long, text string")
    out = dd.containment_dup_decision(
        df_heavy, "doc_id", "text", n=3, k=K, max_df=MAX_DF,
        threshold=0.5,
    ).toPandas()
    assert len(out) == 600
    # unique texts: nobody is a subset dup; every clique member got
    # its row through the membership join (not the probe join)
    assert not out["is_subset_dup"].any()


def test_fractional_df_cap_survives_replication(spark):
    """An ABSOLUTE max_df silently tightens as replication inflates
    every shingle's df (the factor-30 bench finding); the
    corpus-relative max_df_frac keeps planted subset-dups findable."""
    # 40 base docs, each replicated 12x -> every shingle's df >= 12
    rows = []
    for i in range(40):
        t = _unique_text("f", i, 30)
        for r in range(12):
            rows.append((i * 100 + r, t))
    # one planted subset pair, also replicated 12x: its shingles'
    # df = 24 > absolute cap 8, but << frac cap 0.2 * 504
    short = _unique_text("g", 0, 12)
    long = short + " " + _unique_text("h", 0, 30)
    for r in range(12):
        rows.append((9000 + r, short))
        rows.append((9500 + r, long))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    absolute = dd.containment_bottomk_pairs(
        df, "doc_id", "text", n=3, k=K, max_df=8, threshold=0.5
    ).count()
    fractional = dd.containment_bottomk_pairs(
        df, "doc_id", "text", n=3, k=K, max_df=8, threshold=0.5,
        max_df_frac=0.2,
    ).toPandas()
    # the absolute cap killed everything; the fractional cap finds the
    # planted subset pair (every short replica contained in every long)
    assert absolute == 0
    got = {(r.a_id, r.b_id) for r in fractional.itertuples()}
    assert (9000, 9500) in got or any(
        a in range(9000, 9012) and b in range(9500, 9512)
        for a, b in got
    )
