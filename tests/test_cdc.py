"""Incremental (CDC) scan: TableStore.read_changes — the Iceberg
incremental-append-scan analog. The O(delta) feed for per-round
incremental consumers: the scan reads exactly the snapshot dirs
committed after the anchor, never the whole table."""

import pytest

from pixcrawler_spark.sources.tables import TableStore


def _append(spark, store, table, i):
    df = spark.createDataFrame([(i, f"u{i}")], "round int, url string")
    return store.append(table, df, tag=f"r{i}")


def test_read_changes_window_and_stamps(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "cdc1"))
    snaps = [_append(spark, store, "t", i) for i in range(1, 5)]

    # since=snap1 -> rows of snaps 2-4, each stamped with its commit
    rows = store.read_changes("t", since=snaps[0]).collect()
    assert sorted(r["round"] for r in rows) == [2, 3, 4]
    assert all(r["_change_type"] == "insert" for r in rows)
    by_round = {r["round"]: r["_commit_snapshot"] for r in rows}
    assert by_round == {2: snaps[1], 3: snaps[2], 4: snaps[3]}

    # bounded window: (snap1, snap3]
    rows = store.read_changes("t", since=snaps[0], until=snaps[2]).collect()
    assert sorted(r["round"] for r in rows) == [2, 3]

    # from the beginning == full table content
    rows = store.read_changes("t").collect()
    assert sorted(r["round"] for r in rows) == [1, 2, 3, 4]


def test_read_changes_empty_delta_and_errors(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "cdc2"))
    snaps = [_append(spark, store, "t", i) for i in range(1, 3)]

    # caught-up consumer: empty frame, schema preserved + CDC columns
    delta = store.read_changes("t", since=snaps[-1])
    assert delta.count() == 0
    assert delta.columns == ["round", "url", "_commit_snapshot",
                             "_change_type"]

    with pytest.raises(KeyError):
        store.read_changes("t", since="snap-nope")
    with pytest.raises(ValueError):
        store.read_changes("t", since=snaps[1], until=snaps[0])


def test_read_changes_after_expiration_fold(spark, tmp_path):
    """Expired history cannot anchor an incremental read (the honest
    Iceberg behavior) — but the fold snapshot and everything after it
    still can."""
    store = TableStore(spark, str(tmp_path / "cdc3"))
    snaps = [_append(spark, store, "t", i) for i in range(1, 6)]
    store.expire_snapshots("t", keep_last=2)
    live = store.snapshots("t")

    with pytest.raises(KeyError):
        store.read_changes("t", since=snaps[0])

    # anchored at the fold: exactly the kept tail
    rows = store.read_changes("t", since=live[0]).collect()
    assert sorted(r["round"] for r in rows) == [4, 5]


def test_read_changes_scan_is_delta_sized(spark, tmp_path):
    """The plan reads ONLY the delta snapshot dirs — the point of the
    operator at 100 TB: per-round consumers pay O(delta), not
    O(table)."""
    store = TableStore(spark, str(tmp_path / "cdc4"))
    snaps = [_append(spark, store, "t", i) for i in range(1, 5)]
    plan = (
        store.read_changes("t", since=snaps[2])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert snaps[3] in plan
    for old in snaps[:3]:
        assert old not in plan


def test_read_changes_feeds_incremental_dedup(spark, tmp_path):
    """Composition: the CDC feed is the natural delta source for
    incremental_minhash_pairs — a cursor-driven consumer (last-seen
    snapshot) reads exactly each round's new documents, and the union
    of its per-round pairs equals the batch recompute, without the
    producer ever handing it an explicit delta frame."""
    from pyspark.sql import functions as F

    from pixcrawler_spark.operators import dedup
    from pixcrawler_spark.sources.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    batch = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_estimated_pairs(
            d, "doc_id", "text", num_hashes=8, band_size=2, min_est=0.5
        ).collect()
    }
    assert batch

    store = TableStore(spark, str(tmp_path / "docs"))
    sigstore = TableStore(spark, str(tmp_path / "sigs"))
    cursor = None
    got: set = set()
    for rnd in range(3):
        store.append("docs", d.where(F.col("doc_id") % 3 == rnd))
        delta = store.read_changes("docs", since=cursor).drop(
            "_commit_snapshot", "_change_type"
        )
        cursor = store.snapshots("docs")[-1]
        delta_sigs = dedup.minhash_signatures(
            delta, "doc_id", "text", num_hashes=8
        )
        corpus_sigs = (
            sigstore.read("sigs") if sigstore.exists("sigs")
            else spark.createDataFrame([], delta_sigs.schema)
        )
        rows = {
            (r["id_a"], r["id_b"])
            for r in dedup.incremental_minhash_pairs(
                delta_sigs, corpus_sigs, "doc_id",
                num_hashes=8, band_size=2, min_est=0.5,
            ).collect()
        }
        assert not (rows & got)
        got |= rows
        sigstore.append("sigs", delta_sigs)
    assert got == batch
