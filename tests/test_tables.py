"""TableStore unit tests: snapshot manifest semantics, tagged
crash-recovery rollback, parquet-footer counts, driver-side local
appends, and bucketed catalog tables (incl. re-registration from the
manifest, the cross-session resume path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pixcrawler_spark.sources.tables import TableStore


def _urls(spark, lo, hi, r):
    return spark.range(lo, hi).select(
        F.concat(F.lit("https://d.example/p/"), F.col("id")).alias("url"),
        F.lit(r).cast("int").alias("r"),
    )


def test_snapshot_append_and_count(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "s1"))
    store.append("t", _urls(spark, 0, 100, 1))
    store.append("t", _urls(spark, 100, 150, 2))
    assert store.read("t").count() == 150
    assert store.count("t") == 150  # footer count, no Spark job


def test_drop_tagged_rollback(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "s2"))
    store.append("t", _urls(spark, 0, 10, 1), tag="round-1")
    store.append("t", _urls(spark, 10, 30, 2), tag="round-2")
    assert store.count("t") == 30
    assert store.drop_tagged("t", {"round-2"}) == 1
    assert store.count("t") == 10
    # idempotent
    assert store.drop_tagged("t", {"round-2"}) == 0


def test_append_local_roundtrip(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "s3"))
    schema = StructType(
        [
            StructField("round", IntegerType(), False),
            StructField("n", LongType(), False),
            StructField("name", StringType(), False),
        ]
    )
    store.append_local("m", [(1, 10, "a"), (2, 20, "b")], schema)
    rows = {(r["round"], r["n"], r["name"]) for r in store.read("m").collect()}
    assert rows == {(1, 10, "a"), (2, 20, "b")}


def test_bucketed_overwrite_append_read(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "s4"))
    store.overwrite("seen", _urls(spark, 0, 200, 1), bucket=(("url",), 8))
    store.append("seen", _urls(spark, 200, 260, 2), bucket=(("url",), 8))
    assert store.read("seen").count() == 260
    assert store.count("seen") == 260
    # in a join the scan must use bucketing (no exchange on this side)
    probe = _urls(spark, 0, 5, 0).select("url")
    j = store.read("seen").join(probe.hint("merge"), "url", "left_semi")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan


def test_bucketed_reregistration_after_catalog_loss(spark, tmp_path):
    """Cross-session resume: the in-memory catalog dies with the
    session; the store must re-register the external bucketed table
    from its manifest and keep both reads and appends working."""
    store = TableStore(spark, str(tmp_path / "s5"))
    store.overwrite("seen", _urls(spark, 0, 100, 1), bucket=(("url",), 8))
    gen_name = store._cat_name("seen", 1)
    spark.sql(f"DROP TABLE {gen_name}")  # simulate a fresh session
    assert store.read("seen").count() == 100
    store.append("seen", _urls(spark, 100, 120, 2), bucket=(("url",), 8))
    assert store.read("seen").count() == 120


def test_bucketed_overwrite_while_reading_old_generation(spark, tmp_path):
    """Frontier-style self-overwrite: writing generation g+1 from a
    plan that reads generation g."""
    store = TableStore(spark, str(tmp_path / "s6"))
    store.overwrite("f", _urls(spark, 0, 100, 1), bucket=(("url",), 8))
    cur = store.read("f").where(F.col("r") == 1).withColumn(
        "r", F.lit(2).cast("int")
    )
    store.overwrite("f", cur, bucket=(("url",), 8))
    out = store.read("f")
    assert out.count() == 100
    assert out.where(F.col("r") == 2).count() == 100


def test_rollback_unsupported_for_bucketed(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "s7"))
    store.overwrite("seen", _urls(spark, 0, 10, 1), bucket=(("url",), 4))
    with pytest.raises(ValueError):
        store.rollback_to("seen", "whatever")


def test_incremental_bloom_update_and_staleness(spark, tmp_path):
    """Sharded IncrementalBloom: delta updates advance the covered
    round and rewrite only touched shards; a stale master (wrong
    round) triggers a rebuild; probes never produce false negatives
    (sharded path ≡ exact anti-join)."""
    import os

    from pixcrawler_spark.operators.seen import (
        IncrementalBloom,
        anti_join_seen,
    )

    store = TableStore(spark, str(tmp_path / "b1"))
    bloom = IncrementalBloom(store, n_shards=4)
    seen_r1 = _urls(spark, 0, 500, 1).select("url")
    h1 = bloom.ensure(seen_r1, covers_round=1)
    assert store.get_blob(IncrementalBloom.BLOB)[1]["round"] == 1
    assert h1.n_shards == 4 and len(h1.shard_paths) == 4
    assert all(os.path.exists(p) for p in h1.shard_paths.values())

    # round 2 delta
    delta_r2 = _urls(spark, 500, 700, 2).select("url")
    bloom.update(delta_r2, covers_round=2)
    meta = store.get_blob(IncrementalBloom.BLOB)[1]
    assert meta["round"] == 2

    # the updated shards must have no false negatives over r1 ∪ r2:
    # sharded-bloom anti-join ≡ exact anti-join (path equivalence)
    seen_all = seen_r1.union(delta_r2)
    h2 = bloom.ensure(seen_all, covers_round=2)  # cache hit, no rebuild
    assert h2.m_shard == h1.m_shard
    cands = _urls(spark, 0, 1000, 0).select("url")
    got = {
        r["url"]
        for r in anti_join_seen(
            cands, seen_all, use_bloom=True, prebuilt=h2
        ).collect()
    }
    want = {r["url"] for r in cands.join(seen_all, "url", "left_anti").collect()}
    assert got == want

    # staleness: asking for a different covered round rebuilds
    bloom.ensure(seen_r1, covers_round=1)
    assert store.get_blob(IncrementalBloom.BLOB)[1]["round"] == 1


def test_sharded_bloom_update_touches_only_delta_shards(spark, tmp_path):
    from pixcrawler_spark.operators.seen import IncrementalBloom

    store = TableStore(spark, str(tmp_path / "b2"))
    bloom = IncrementalBloom(store, n_shards=8)
    bloom.ensure(_urls(spark, 0, 2000, 1).select("url"), covers_round=1)
    before = dict(store.get_blob(IncrementalBloom.BLOB)[1]["shards"])
    # a 3-url delta hashes into at most 3 shards → >= 5 paths unchanged
    bloom.update(_urls(spark, 9000, 9003, 2).select("url"), covers_round=2)
    after = dict(store.get_blob(IncrementalBloom.BLOB)[1]["shards"])
    unchanged = sum(before[j] == after[j] for j in before)
    assert unchanged >= 5
    assert after != before


def test_read_at_time_travel_nondestructive(spark, tmp_path):
    import pytest

    store = TableStore(spark, str(tmp_path / "tt"))
    store.append("t", _urls(spark, 0, 10, 1), tag="round-1")
    snap1 = store.snapshots("t")[-1]
    store.append("t", _urls(spark, 10, 30, 2), tag="round-2")
    snap2 = store.snapshots("t")[-1]
    # as-of reads see exactly the committed prefix…
    assert store.read_at("t", snap1).count() == 10
    assert store.read_at("t", snap2).count() == 30
    # …and do not modify current state (unlike rollback_to)
    assert store.read("t").count() == 30
    assert store.snapshots("t") == [snap1, snap2]
    with pytest.raises(KeyError):
        store.read_at("t", "nope")
