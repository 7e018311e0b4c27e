"""Crawl-engine correctness vs the pandas oracle: fetch decisions,
crawl ordering, final URL-seen set, byte-identical extracted text,
resume-from-checkpoint equivalence, bloom/salted-path equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pixcrawler_spark.fixtures import FixtureSpec, generate_pages, seed_urls, write_fixtures
from pixcrawler_spark.plans.crawl import CrawlConfig, CrawlEngine
from pixcrawler_spark.sources.tables import TableStore
from tests.oracle import CrawlOracle

ROWS = 2000
SEED = 42


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("crawlfix")
    write_fixtures(str(d), rows=ROWS, seed=SEED)
    return str(d)


@pytest.fixture(scope="module")
def seeds(fixture_dir):
    return seed_urls(generate_pages(FixtureSpec(rows=ROWS, seed=SEED)), k=6)


def _mk_engine(spark, fixture_dir, tmp_path, seeds, **overrides) -> CrawlEngine:
    kwargs = dict(seeds=seeds, max_depth=2, max_rounds=3, round_len_s=2.0)
    kwargs.update(overrides)
    cfg = CrawlConfig(**kwargs)
    store = TableStore(spark, str(tmp_path / "store"))
    return CrawlEngine(
        spark, f"{fixture_dir}/pages.parquet", f"{fixture_dir}/robots.parquet",
        store, cfg,
    )


def _mk_oracle(fixture_dir, seeds) -> CrawlOracle:
    o = CrawlOracle(
        pages_path=f"{fixture_dir}/pages.parquet",
        robots_path=f"{fixture_dir}/robots.parquet",
        seeds=seeds, max_depth=2, max_rounds=3, round_len_s=2.0,
    )
    o.run()
    return o


@pytest.fixture(scope="module")
def oracle(fixture_dir, seeds):
    return _mk_oracle(fixture_dir, seeds)


@pytest.fixture(scope="module")
def engine_run(spark, fixture_dir, tmp_path_factory, seeds):
    eng = _mk_engine(
        spark, fixture_dir, tmp_path_factory.mktemp("store_base"), seeds
    )
    summaries = eng.run()
    return eng, summaries


def _seen_set(eng: CrawlEngine) -> set[tuple]:
    return {
        (r["url"], r["completed_round"])
        for r in eng.store.read("seen").collect()
    }


def _decisions(eng: CrawlEngine) -> dict[str, tuple]:
    return {
        r["url"]: (r["fetch_decision"], r["depth"], r["round"])
        for r in eng.store.read("results").collect()
    }


def test_seen_set_matches_oracle(engine_run, oracle):
    eng, _ = engine_run
    assert _seen_set(eng) == {(u, r) for u, r in oracle.seen.items()}


def test_decisions_match_oracle(engine_run, oracle):
    eng, _ = engine_run
    got = _decisions(eng)
    want = {
        res.url: (res.fetch_decision, res.depth, res.round)
        for res in oracle.results
    }
    assert got == want


def test_crawl_ordering_matches_oracle(engine_run, oracle):
    eng, _ = engine_run
    got = {
        (r["round"], r["domain"], r["rank_in_round"], r["url"])
        for r in eng.crawl_order().collect()
    }
    assert got == oracle.ordering()


def test_extracted_text_byte_identical(engine_run, spark, fixture_dir):
    """input_hint invariant: extracted text == pages.text per url."""
    eng, _ = engine_run
    res = eng.results_with_text().where(F.col("fetch_decision") == "fetched")
    pages = spark.read.parquet(f"{fixture_dir}/pages.parquet").select(
        "url", F.col("text").alias("expected_text")
    )
    diff = (
        res.join(pages, "url")
        .where(~F.col("text").eqNullSafe(F.col("expected_text")))
        .count()
    )
    assert diff == 0
    assert res.count() > 0


def test_politeness_never_exceeds_capacity(engine_run, spark, fixture_dir):
    eng, _ = engine_run
    res = eng.store.read("results").where(F.col("fetch_decision") != "robots_denied")
    robots = spark.read.parquet(f"{fixture_dir}/robots.parquet")
    per_round = res.groupBy("round", "domain").agg(F.count(F.lit(1)).alias("n"))
    joined = per_round.join(robots, "domain", "left").withColumn(
        "cap",
        F.least(
            F.coalesce("max_per_round", F.lit(10)),
            F.floor(2.0 / F.coalesce("crawl_delay_s", F.lit(0.5))).cast("int"),
        ),
    )
    # crawl_delay 0 domains: cap = max_per_round
    joined = joined.withColumn(
        "cap",
        F.when(F.coalesce("crawl_delay_s", F.lit(0.5)) <= 0.0,
               F.coalesce("max_per_round", F.lit(10))).otherwise(F.col("cap")),
    )
    assert joined.where(F.col("n") > F.col("cap")).count() == 0


def test_metrics_recorded(engine_run):
    eng, summaries = engine_run
    m = eng.store.read("metrics")
    assert m.count() >= len(summaries)
    assert m.where(F.col("urls_per_sec") < 0).count() == 0
    total_processed = sum(s["n_processed"] for s in summaries)
    assert total_processed == eng.store.read("results").count()


def test_resume_equivalence(spark, fixture_dir, tmp_path_factory, seeds, engine_run):
    """Run 2 rounds, stop, resume for round 3 → identical state to the
    uninterrupted 3-round run (FIXTURES.md §4)."""
    store_dir = tmp_path_factory.mktemp("store_resume")
    eng2 = _mk_engine(spark, fixture_dir, store_dir, seeds, max_rounds=2)
    eng2.run()
    eng3 = _mk_engine(spark, fixture_dir, store_dir, seeds, max_rounds=3)
    eng3.run(resume=True)
    base, _ = engine_run
    assert _seen_set(eng3) == _seen_set(base)
    assert _decisions(eng3) == _decisions(base)


def test_bloom_path_equivalent(spark, fixture_dir, tmp_path_factory, seeds, engine_run):
    eng_b = _mk_engine(
        spark, fixture_dir, tmp_path_factory.mktemp("store_bloom"), seeds,
        use_bloom=True,
    )
    eng_b.run()
    base, _ = engine_run
    assert _seen_set(eng_b) == _seen_set(base)
    assert _decisions(eng_b) == _decisions(base)


def test_salted_admission_equivalent(spark, fixture_dir, tmp_path_factory, seeds, engine_run):
    eng_s = _mk_engine(
        spark, fixture_dir, tmp_path_factory.mktemp("store_salt"), seeds,
        salt_buckets=8,
    )
    eng_s.run()
    base, _ = engine_run
    assert _seen_set(eng_s) == _seen_set(base)
    assert _decisions(eng_s) == _decisions(base)


def test_crash_before_frontier_commit_recovers(
    spark, fixture_dir, tmp_path_factory, seeds, engine_run, monkeypatch
):
    """Commit-order contract: results/seen may land before the crash,
    but the frontier (the round's commit point) did not — re-entry must
    roll the partials back and replay round 2 to a state identical to
    the uninterrupted run."""
    base, _ = engine_run
    store_dir = tmp_path_factory.mktemp("store_crash1")
    eng = _mk_engine(spark, fixture_dir, store_dir, seeds, max_rounds=1)
    eng.run()

    eng2 = _mk_engine(spark, fixture_dir, store_dir, seeds, max_rounds=3)
    orig = eng2.store.commit_staged

    def boom(token):
        if token["table"] == "frontier_added":
            raise RuntimeError("simulated crash before frontier commit")
        return orig(token)

    monkeypatch.setattr(eng2.store, "commit_staged", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        eng2.run_round(2)
    monkeypatch.undo()
    # the partial state is real: round-2 results and seen rows landed
    assert int(eng2.store.column_max("seen", "completed_round")) == 2
    assert (
        eng2.store.read("results").where(F.col("round") == 2).count() > 0
    )

    eng3 = _mk_engine(spark, fixture_dir, store_dir, seeds, max_rounds=3)
    eng3.run(resume=True)
    assert _seen_set(eng3) == _seen_set(base)
    assert _decisions(eng3) == _decisions(base)


def test_crash_after_frontier_commit_finalizes(
    spark, fixture_dir, tmp_path_factory, seeds, engine_run, monkeypatch
):
    """Crash between the frontier commit point and the metrics commit:
    results/seen/frontier are complete by the commit order — re-entry
    must only finalize the metrics row from the committed round_log,
    not replay the round."""
    base, _ = engine_run
    store_dir = tmp_path_factory.mktemp("store_crash2")
    eng = _mk_engine(spark, fixture_dir, store_dir, seeds, max_rounds=1)
    eng.run()

    eng2 = _mk_engine(spark, fixture_dir, store_dir, seeds, max_rounds=3)

    def boom(*a, **k):
        raise RuntimeError("simulated crash before metrics commit")

    monkeypatch.setattr(eng2, "_commit_metrics", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        eng2.run_round(2)
    monkeypatch.undo()
    assert int(eng2.store.table_meta("frontier_added")["round"]) == 2
    assert eng2.current_round() == 1  # metrics lost in the crash

    eng3 = _mk_engine(spark, fixture_dir, store_dir, seeds, max_rounds=3)
    summaries = eng3.run(resume=True)
    # round 2 was finalized (wall-clock unrecoverable → 0), round 3 ran
    assert [s["round"] for s in summaries] == [2, 3]
    assert summaries[0]["wall_seconds"] == 0.0
    m = eng3.store.read("metrics")
    assert m.where(F.col("round") == 2).count() > 0
    assert _seen_set(eng3) == _seen_set(base)
    assert _decisions(eng3) == _decisions(base)


def test_pause_cancel_resume(spark, fixture_dir, tmp_path_factory, seeds, engine_run):
    """Workflow control (job_orchestrator.py:427-527 analog): pause
    stops at the round boundary and resume_control continues to a
    state identical to the uninterrupted run; cancel blocks the loop."""
    base, _ = engine_run
    store_dir = tmp_path_factory.mktemp("store_ctrl")
    eng = _mk_engine(spark, fixture_dir, store_dir, seeds, max_rounds=1)
    eng.run()
    eng.pause()
    eng2 = _mk_engine(spark, fixture_dir, store_dir, seeds, max_rounds=3)
    assert eng2.run(resume=True) == []  # paused → no rounds run
    eng2.cancel()
    assert eng2.run(resume=True) == []
    eng2.resume_control()
    eng2.run(resume=True)
    assert _seen_set(eng2) == _seen_set(base)
    assert _decisions(eng2) == _decisions(base)


def test_recover_from_round(spark, fixture_dir, tmp_path_factory, seeds, engine_run):
    """recover_workflow(from_step) analog: roll back rounds >= N and
    re-run — deterministic replay reaches the uninterrupted state."""
    base, _ = engine_run
    for from_round in (3, 2):
        store_dir = tmp_path_factory.mktemp(f"store_rec{from_round}")
        eng = _mk_engine(spark, fixture_dir, store_dir, seeds, max_rounds=3)
        eng.run()
        eng.recover_from_round(from_round)
        assert eng.current_round() == from_round - 1
        assert eng.control()["recovery_attempts"] == 1
        eng.run(resume=True)
        assert _seen_set(eng) == _seen_set(base), from_round
        assert _decisions(eng) == _decisions(base), from_round


def test_recovery_attempts_capped(spark, fixture_dir, tmp_path_factory, seeds):
    store_dir = tmp_path_factory.mktemp("store_cap")
    eng = _mk_engine(spark, fixture_dir, store_dir, seeds, max_rounds=1)
    eng.run()
    for _ in range(eng.MAX_RECOVERY_ATTEMPTS):
        eng.recover_from_round(1)
        eng.run(resume=True)
    with pytest.raises(ValueError, match="cannot be recovered"):
        eng.recover_from_round(1)


def test_compaction_equivalent(spark, fixture_dir, tmp_path_factory, seeds, engine_run):
    """Merge-on-read invariant: compacting after every round (base
    rewritten, deltas truncated) produces state identical to the
    default amortized schedule and to the oracle-checked baseline."""
    base, _ = engine_run
    eng_c = _mk_engine(
        spark, fixture_dir, tmp_path_factory.mktemp("store_compact"), seeds,
        compact_every=1,
    )
    eng_c.run()
    assert _seen_set(eng_c) == _seen_set(base)
    assert _decisions(eng_c) == _decisions(base)
    # after the final round's compaction the deltas are empty and the
    # base alone IS the logical frontier
    assert eng_c.store.read("frontier_added").count() == 0
    assert eng_c.store.read("frontier_removed").count() == 0
    n_logical = eng_c.logical_frontier().count()
    assert n_logical == eng_c.store.read("frontier").count()
    # and matches the uncompacted engine's logical view
    assert n_logical == base.logical_frontier().count()


def test_compaction_fires_on_tombstone_ratio(
    spark, fixture_dir, tmp_path_factory, seeds, engine_run
):
    """The ratio policy: with a tiny threshold every round crosses it
    (each round tombstones a politeness-bounded slice of the base), so
    compaction fires each round and deltas stay empty; with the
    trigger disabled it never fires. State is identical either way —
    compaction is logically invisible."""
    base, base_summaries = engine_run
    eager = _mk_engine(
        spark, fixture_dir, tmp_path_factory.mktemp("store_ratio"), seeds,
        compact_ratio=0.001, compact_every=0,
    )
    eager_summaries = eager.run()
    assert all(s.get("compacted") for s in eager_summaries)
    assert all("tombstone_ratio" in s for s in eager_summaries)
    assert eager.store.read("frontier_removed").count() == 0
    assert _seen_set(eager) == _seen_set(base)
    assert _decisions(eager) == _decisions(base)

    never = _mk_engine(
        spark, fixture_dir, tmp_path_factory.mktemp("store_never"), seeds,
        compact_ratio=0.0, compact_every=0,
    )
    never_summaries = never.run()
    assert not any(s.get("compacted") for s in never_summaries)
    # tombstones accumulate monotonically when nothing compacts
    ratios = [s["tombstone_ratio"] for s in never_summaries]
    assert ratios == sorted(ratios) and ratios[-1] > 0
    assert never.store.read("frontier_removed").count() > 0
    assert _seen_set(never) == _seen_set(base)
    assert _decisions(never) == _decisions(base)


def test_config_validation():
    with pytest.raises(ValueError):
        CrawlConfig(seeds=[]).validate()
    with pytest.raises(ValueError):
        CrawlConfig(seeds=["x"], engines=("nope",)).validate()


def test_retry_ladder_matches_oracle(spark, fixture_dir, tmp_path_factory, seeds):
    """fetch_failed urls re-enqueue with rotated engine until
    max_retries, then land in results — vs the oracle."""
    eng_r = _mk_engine(
        spark, fixture_dir, tmp_path_factory.mktemp("store_retry"), seeds,
        max_retries=2, max_rounds=4,
    )
    eng_r.run()
    o = CrawlOracle(
        pages_path=f"{fixture_dir}/pages.parquet",
        robots_path=f"{fixture_dir}/robots.parquet",
        seeds=seeds, max_depth=2, max_rounds=4, round_len_s=2.0, max_retries=2,
    )
    o.run()
    assert _seen_set(eng_r) == {(u, r) for u, r in o.seen.items()}
    assert _decisions(eng_r) == {
        res.url: (res.fetch_decision, res.depth, res.round) for res in o.results
    }


def test_multi_round_soak_invariants(spark, tmp_path):
    """Six full rounds over a 100k-page fixture with real discovery:
    the Mercator invariants must hold at every exit — frontier and
    seen disjoint, no duplicate frontier urls, every decided url in
    results exactly once, seen ≡ results. (An 8-round run at 1M pages
    passes the same assertions; this is the suite-sized version.)"""
    import os

    from pixcrawler_spark.fixtures import write_fixtures
    from pixcrawler_spark.plans.crawl import CrawlConfig, CrawlEngine
    from pixcrawler_spark.sources.tables import TableStore

    fx = str(tmp_path / "fx")
    write_fixtures(fx, rows=100_000, seed=7)
    pages = spark.read.parquet(os.path.join(fx, "pages.parquet"))
    robots = spark.read.parquet(os.path.join(fx, "robots.parquet"))
    store = TableStore(spark, str(tmp_path / "store"))
    static_store = TableStore(spark, str(tmp_path / "static"))
    cfg = CrawlConfig(seeds=["placeholder"], max_depth=3, max_rounds=6)
    eng = CrawlEngine(spark, pages, robots, store, cfg,
                      static_store=static_store)
    eng.ensure_pages_ext()
    seeds = pages.select("url").limit(10_000)
    store.overwrite("frontier", eng.frontier_from(seeds),
                    bucket=(("url",), 16), meta={"round": 0})
    store.overwrite(
        "seen",
        spark.createDataFrame([], "url string, completed_round int"),
        bucket=(("url",), 16),
    )
    eng._set_control(status="running", recovery_attempts=0)
    summaries = eng.run(resume=True)
    assert len(summaries) >= 4, summaries
    assert sum(s["n_discovered_new"] for s in summaries) > 0

    frontier = eng.logical_frontier(len(summaries) + 1)
    seen = store.read("seen")
    results = store.read("results")
    nf, ns, nr = frontier.count(), seen.count(), results.count()
    assert frontier.join(seen.select("url"), "url", "inner").count() == 0
    assert nf == frontier.select("url").distinct().count()
    assert nr == results.select("url").distinct().count()
    assert ns == nr


def test_sketch_telemetry_registers(
    spark, fixture_dir, tmp_path_factory, seeds, engine_run
):
    """cfg.sketch_telemetry=True commits per-round HLL registers next
    to the metrics row; the folded estimate tracks the exact distinct
    decided-url count per fetch decision. Default runs (engine_run)
    must not create the table at all."""
    eng_base, _ = engine_run
    assert not eng_base.store.exists("sketch_registers")

    eng = _mk_engine(
        spark,
        fixture_dir,
        tmp_path_factory.mktemp("store_sketch"),
        seeds,
        sketch_telemetry=True,
    )
    eng.run()
    assert eng.store.exists("sketch_registers")
    regs = eng.store.read("sketch_registers")
    n_rounds = regs.select("round").distinct().count()
    assert n_rounds >= 2  # one commit per executed round
    est = {
        r["fetch_decision"]: r["hll_distinct"]
        for r in eng.distinct_url_estimates().collect()
    }
    exact = {
        r["fetch_decision"]: r["c"]
        for r in eng.store.read("results")
        .groupBy("fetch_decision")
        .agg(F.countDistinct("url").alias("c"))
        .collect()
    }
    # results only holds final (non-retry) decisions; every decision
    # recorded there must have a register group with a sane estimate
    for decision, c in exact.items():
        assert decision in est, (decision, est)
        if c >= 20:
            assert abs(est[decision] - c) / c < 0.25, (decision, est[decision], c)
    # the decisions log can contain more outcomes (retries) than
    # results — estimates must exist and be positive for all groups
    assert all(v > 0 for v in est.values())


def test_sketch_register_compaction(
    spark, fixture_dir, tmp_path_factory, seeds
):
    """Folding old rounds' registers into a baseline is lossless for
    the estimates (max-merge associativity) and shrinks the table."""
    eng = _mk_engine(
        spark,
        fixture_dir,
        tmp_path_factory.mktemp("store_sketch_compact"),
        seeds,
        sketch_telemetry=True,
    )
    eng.run()
    before = {
        r["fetch_decision"]: r["hll_distinct"]
        for r in eng.distinct_url_estimates().collect()
    }
    n_before = eng.store.count("sketch_registers")
    max_round = eng.store.read("sketch_registers").agg(
        F.max("round")
    ).collect()[0][0]
    eng.compact_sketch_registers(upto_round=max_round - 1)
    after = {
        r["fetch_decision"]: r["hll_distinct"]
        for r in eng.distinct_url_estimates().collect()
    }
    n_after = eng.store.count("sketch_registers")
    assert after == before  # bit-identical estimates
    assert n_after <= n_before
    rounds = {
        r["round"]
        for r in eng.store.read("sketch_registers").select("round").distinct().collect()
    }
    assert rounds <= {max_round - 1, max_round}
