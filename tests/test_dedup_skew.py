"""Planted-skew dedup: band joins must stay balanced at a realistic
(30-50%) duplicate rate — VERDICT r3 item 3.

A CC-style crawl corpus is duplicate-heavy; identical documents share a
fingerprint, so every band of a 200-copy cluster lands in ONE shuffle
task and the naive band self-join puts 200² candidate rows there. The
guards under test (operators/dedup.py):

- representative collapse (simhash_dup_decision step 1): identical
  fingerprints become one band-join row, so exact-dup clusters — the
  mass of the dup rate — never create a hot bucket at all;
- two-sided salt split (simhash_hamming_pairs salt_threshold):
  over-threshold buckets split into g salt groups per side and the
  join key grows to (band, salt_a, salt_b) — every pair still meets
  exactly once, but no task owns more than ~threshold² rows of any
  bucket;
- band-bucket cap (simhash_hamming_pairs max_bucket): buckets beyond
  the cap (boilerplate-grade) are excluded from join-key duty per-band.

The balance assertion measures candidate rows per shuffle task with AQE
off (so raw hash-partition balance is what's measured, as on a big
cluster where partitions far exceed AQE's coalesce targets): max task
load must be <= 2x the mean. A negative control shows the naive path
violates that bound on the same corpus — the test has teeth.
"""

import pytest
from pyspark.sql import functions as F

from pixcrawler_spark.operators import dedup

DIMS = 64
N_BANDS = 4
MAX_BUCKET = 64
SALT_THRESHOLD = 4


# cluster layout (Zipf-ish sizes, like real crawl duplicates: one mega
# template page dominates): ids 0-2999 unique, 3000-4199 one cluster of
# 1200 exact copies, 4200-4999 four clusters of 200 exact copies,
# 5000-5179 three clusters of 60 near variants.  ~39% duplicates.
MEGA_LO, MEGA_N = 3000, 1200
MID_LO, MID_N, MID_K = 4200, 200, 4
NEAR_LO = 5000


def _planted_corpus(spark):
    rows = []
    doc_id = 0
    for i in range(3000):
        text = " ".join(f"u{i}t{j}x{(i * 31 + j * 7) % 9973}" for j in range(30))
        rows.append((doc_id, text))
        doc_id += 1
    mega = " ".join(f"megatok{j}v{j % 997}" for j in range(40))
    for _ in range(MEGA_N):
        rows.append((doc_id, mega))
        doc_id += 1
    for c in range(MID_K):
        base = " ".join(f"c{c}tok{j}v{(c * 13 + j) % 997}" for j in range(40))
        for _ in range(MID_N):
            rows.append((doc_id, base))
            doc_id += 1
    for c in range(3):
        base = " ".join(f"n{c}tok{j}w{(c * 17 + j) % 991}" for j in range(60))
        for v in range(60):
            rows.append((doc_id, base + f" variant{v}"))
            doc_id += 1
    return spark.createDataFrame(rows, "doc_id long, text string")


def _cand_rows_per_task(fps, id_col, max_bucket, salt_threshold):
    """Candidate rows per shuffle task of the banded self-join —
    the same layout simhash_hamming_pairs builds internally."""
    band_len = DIMS // N_BANDS
    stack_expr = ", ".join(
        f"{b}, substring(simhash, {b * band_len + 1}, {band_len})"
        for b in range(N_BANDS)
    )
    long = fps.select(
        F.col(id_col),
        F.expr(f"stack({N_BANDS}, {stack_expr}) as (band_idx, band_val)"),
    )
    keys = ["band_idx", "band_val"]
    if max_bucket is not None:
        hot = (
            long.groupBy("band_idx", "band_val")
            .count()
            .where(F.col("count") > max_bucket)
            .select("band_idx", "band_val")
        )
        long = long.join(F.broadcast(hot), ["band_idx", "band_val"], "left_anti")
    if salt_threshold is not None:
        big = (
            long.groupBy("band_idx", "band_val")
            .count()
            .where(F.col("count") > salt_threshold)
            .select(
                "band_idx", "band_val",
                F.ceil(F.col("count") / salt_threshold).cast("int").alias("_g"),
            )
        )
        long = (
            long.join(F.broadcast(big), ["band_idx", "band_val"], "left")
            .withColumn("_g", F.coalesce(F.col("_g"), F.lit(1)))
        )
        own = F.pmod(F.xxhash64(F.col(id_col)), F.col("_g")).cast("int")
        rep = F.explode(F.sequence(F.lit(0), F.col("_g") - 1))
        a = long.select(
            F.col(id_col).alias("id_a"), "band_idx", "band_val",
            own.alias("salt_a"), rep.alias("salt_b"),
        )
        b = long.select(
            F.col(id_col).alias("id_b"), "band_idx", "band_val",
            rep.alias("salt_a"), own.alias("salt_b"),
        )
        keys = keys + ["salt_a", "salt_b"]
    else:
        a = long.select(F.col(id_col).alias("id_a"), "band_idx", "band_val")
        b = long.select(F.col(id_col).alias("id_b"), "band_idx", "band_val")
    cand = a.join(b, keys).where(F.col("id_a") < F.col("id_b"))
    per = (
        cand.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    )
    return [r["count"] for r in per]


@pytest.fixture()
def noaqe(spark):
    """Measure raw hash-partition balance: AQE's small-scale partition
    coalescing would blur per-task numbers that at cluster scale are
    real tasks, and the handful of test shuffle partitions would let
    hot buckets average out — production runs hundreds of partitions,
    so one hot bucket owns (most of) a task. 32 partitions restores
    that regime at fixture scale."""
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    # at fixture scale Spark would broadcast the whole band frame and
    # the join would never shuffle — at corpus scale it cannot; force
    # the sort-merge path whose balance is the property under test
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    spark.conf.set("spark.sql.shuffle.partitions", old_sp)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)


def test_banded_join_balanced_at_planted_skew(noaqe):
    spark = noaqe
    docs = _planted_corpus(spark)
    fps = dedup.simhash_fingerprints(docs, "doc_id", "text", dims=DIMS).persist()

    # guarded path: representative collapse + bucket cap
    reps = (
        fps.groupBy("simhash")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "simhash")
    )
    loads = _cand_rows_per_task(reps, "doc_id", MAX_BUCKET, SALT_THRESHOLD)
    assert loads, "guarded join produced no candidates at all"
    mean = sum(loads) / len(loads)
    assert max(loads) <= 2 * mean, (
        f"hot task: max={max(loads)} vs mean={mean:.1f} over {len(loads)} tasks"
    )

    # negative control: naive banding over raw fingerprints concentrates
    # the exact-dup clusters' quadratic candidates in few tasks
    naive = _cand_rows_per_task(fps, "doc_id", None, None)
    naive_mean = sum(naive) / len(naive)
    assert max(naive) > 2 * naive_mean, (
        "negative control failed - planted corpus no longer skews the "
        f"naive join (max={max(naive)}, mean={naive_mean:.1f}); "
        "strengthen the fixture"
    )


def test_dup_decision_semantics_at_planted_skew(spark):
    docs = _planted_corpus(spark)
    fps = dedup.simhash_fingerprints(docs, "doc_id", "text", dims=DIMS)
    dec = dedup.simhash_dup_decision(
        fps, "doc_id", dims=DIMS, n_bands=N_BANDS, max_bucket=MAX_BUCKET
    ).toPandas().set_index("doc_id").sort_index()

    # every exact-copy cluster collapses to its min id
    clusters = [(MEGA_LO, MEGA_N)] + [
        (MID_LO + c * MID_N, MID_N) for c in range(MID_K)
    ]
    for lo, n in clusters:
        canon = {int(dec.loc[i, "canonical_id"]) for i in range(lo, lo + n)}
        assert len(canon) == 1, f"cluster at {lo} fragmented: {canon}"
        assert not dec.loc[lo, "is_dup"]
        assert dec.loc[lo + 1 : lo + n - 1, "is_dup"].all()

    # output is linear: one decision row per (shingle-bearing) doc
    assert len(dec) == docs.count()

    # near-variant clusters: members whose fingerprints landed within
    # max_hamming of the cluster head must be marked dups of it
    near_ids = dec.loc[NEAR_LO:].index
    assert dec.loc[near_ids, "is_dup"].sum() > 0, (
        "no near-dup variant was caught; fixture fingerprints drifted"
    )


def test_salted_join_preserves_pairs(spark):
    """The two-sided salt split is an execution-layout change ONLY:
    output pairs must be identical with and without it."""
    docs = _planted_corpus(spark).where(
        # small slice keeps the quadratic unsalted baseline cheap
        (F.col("doc_id") < 500)
        | ((F.col("doc_id") >= NEAR_LO) & (F.col("doc_id") < NEAR_LO + 120))
    )
    fps = dedup.simhash_fingerprints(docs, "doc_id", "text", dims=DIMS).persist()
    plain = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dedup.simhash_hamming_pairs(
            fps, "doc_id", dims=DIMS, n_bands=N_BANDS
        ).collect()
    }
    salted = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dedup.simhash_hamming_pairs(
            fps, "doc_id", dims=DIMS, n_bands=N_BANDS, salt_threshold=3
        ).collect()
    }
    assert plain, "fixture slice produced no near pairs"
    assert salted == plain
