"""Table maintenance: snapshot expiration (fold) + orphan removal.

The Iceberg ``expire_snapshots``/``rewrite_data_files`` and
``remove_orphan_files`` analogs for the parquet TableStore — the
metadata-growth story of a 10^5-round crawl (one snapshot per table per
round). Maintenance runs OUTSIDE the timed round path, like Iceberg's
scheduled maintenance jobs.
"""

import os

import pytest

from pixcrawler_spark.sources.tables import TableStore


def _append_rounds(spark, store, table, n, start=1):
    for i in range(start, start + n):
        df = spark.createDataFrame([(i, f"u{i}")], "round int, url string")
        store.append(table, df, tag=f"r{i}")


def _rows(store, table):
    return sorted(
        (r["round"], r["url"]) for r in store.read(table).collect()
    )


def test_expire_folds_old_snapshots_preserving_rows(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "m1"))
    _append_rounds(spark, store, "results", 6)
    before = _rows(store, "results")
    assert len(store.snapshots("results")) == 6

    folded = store.expire_snapshots("results", keep_last=2)
    assert folded == 4
    snaps = store.snapshots("results")
    assert len(snaps) == 3  # fold + the 2 newest
    assert _rows(store, "results") == before  # content identical

    # the newest snapshots keep their ids and tags: crash recovery
    # (drop_tagged of the current round) still works after maintenance
    assert store.drop_tagged("results", {"r6"}) == 1
    assert _rows(store, "results") == before[:-1]

    # time travel to a surviving snapshot sees fold + itself
    assert sorted(
        (r["round"], r["url"])
        for r in store.read_at("results", snaps[1]).collect()
    ) == before[:5]

    # idempotent-ish: nothing left worth folding at the same horizon
    assert store.expire_snapshots("results", keep_last=2) == 0


def test_expire_noop_and_bucketed_rejected(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "m2"))
    _append_rounds(spark, store, "log", 2)
    assert store.expire_snapshots("log", keep_last=2) == 0  # nothing older
    assert store.expire_snapshots("log", keep_last=1) == 0  # 1 old < 2

    df = spark.createDataFrame([(1, "u")], "round int, url string")
    store.overwrite("seen", df, bucket=(("url",), 4))
    with pytest.raises(ValueError):
        store.expire_snapshots("seen", keep_last=1)
    with pytest.raises(ValueError):
        store.expire_snapshots("log", keep_last=-1)


def test_remove_orphans_deletes_only_uncommitted_dirs(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "m3"))
    _append_rounds(spark, store, "results", 3)
    before = _rows(store, "results")

    # a write that crashed between stage and commit leaks a data dir
    df = spark.createDataFrame([(99, "orphan")], "round int, url string")
    store.stage_overwrite("results", df)  # token dropped = crash
    data_root = os.path.join(str(tmp_path / "m3"), "results", "data")
    assert len(os.listdir(data_root)) == 4

    assert store.remove_orphans("results") == 1
    assert len(os.listdir(data_root)) == 3
    assert _rows(store, "results") == before
    assert store.remove_orphans("results") == 0  # idempotent


def test_expire_then_orphan_cycle_matches_fresh_reader(spark, tmp_path):
    """A maintenance cycle mid-crawl must be invisible to a reader in a
    separate store handle (fresh manifest read), like an Iceberg reader
    picking up the post-maintenance snapshot list."""
    root = str(tmp_path / "m4")
    store = TableStore(spark, root)
    _append_rounds(spark, store, "round_log", 8)
    before = _rows(store, "round_log")
    store.expire_snapshots("round_log", keep_last=3)
    store.remove_orphans("round_log")
    fresh = TableStore(spark, root)
    assert _rows(fresh, "round_log") == before
    assert len(fresh.snapshots("round_log")) == 4
