"""The crawl round loop: frontier → seen anti-join → robots → politeness
→ priority admission → fetch join → extraction → append + expand.

This is the Spark trace of the reference's whole lifecycle
(SURVEY.md §3.1 step list): the driver loop replaces the poll/retry
loops (builder/_generator.py:311-325), the fetch join replaces HTTP
GETs (builder/_search_engines.py:115-223), the politeness operator
replaces executor sleeps, and TableStore snapshots replace the
progress cache (builder/progress.py) — resume re-reads the last
committed round exactly.

DETERMINISM CONTRACT (SURVEY §7 hard-parts 1 & 3): crawl order is
defined by (round, domain, priority_rank) where priority_rank ranks
(depth asc, score desc, url asc) per domain — never wall-clock. The
engine assigned to a candidate is engines[depth % len(engines)]
(the reference's ALTERNATING retry strategy, builder/_generator.py:
237-260, keyed on depth instead of unseeded randomness); its score is
the engine's config score. Identical (pages, robots, config) ⇒
identical results, ordering, and seen set — the pytest oracle
(tests/oracle.py) re-implements these semantics in straight-line
pandas and must match exactly.

SCALE NOTES (10^10-URL frontier):
- every join key is url or domain; url-keyed shuffles are
  hash-uniform. The domain-keyed priority window is the skew point
  (Zipf hosts), so admission uses SALTED TWO-PHASE top-k when
  ``salt_buckets > 1``: rank within (domain, salt) first — capacity
  is <= max_per_round, so at most salt*capacity rows per domain
  survive to the exact per-domain re-rank. Hot domains never
  concentrate on one task.
- the seen set is consulted via bloom pre-filter + exact confirm
  (operators/seen.py) when ``use_bloom`` — no false drops possible.
- each round commits frontier/seen/results snapshots (TableStore →
  Iceberg in production), so lineage never grows across rounds and a
  crash resumes from the last commit.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

_TRACE = os.environ.get("PIXCRAWLER_TRACE", "") == "1"

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from pixcrawler_spark.functions.text import map_in_pandas_extract
from pixcrawler_spark.operators import politeness as pol
from pixcrawler_spark.operators.seen import anti_join_seen
from pixcrawler_spark.schemas import FRONTIER_SCHEMA, SEEN_SCHEMA
from pixcrawler_spark.sources.tables import TableStore

ENGINE_SCORES = {"google": 1.0, "bing": 0.8, "baidu": 0.6}


@dataclass
class CrawlConfig:
    """The crawl "query" (reference CONFIG_SCHEMA, builder/_config.py:31-94,
    plus the frontier extensions from FIXTURES.md §3)."""

    seeds: list[str]
    max_depth: int = 3
    max_rounds: int = 5
    round_len_s: float = 10.0
    engines: tuple[str, ...] = ("google", "bing", "baidu")
    use_bloom: bool = False
    salt_buckets: int = 1
    seed: int = 42
    # Retry ladder (reference: Retry.retry_download + ALTERNATING
    # engine strategy, builder/_generator.py:237-341): a fetch_failed
    # url with retry_count < max_retries is re-enqueued for the next
    # round with retry_count+1 and engine rotated to
    # engines[(depth + retry_count) % n], instead of being recorded;
    # only the exhausted attempt lands in results/seen. 0 = no retries.
    max_retries: int = 0
    # Materialize extraction ONCE into a compact pages_ext table
    # (url, warc_ts, text, outlinks) instead of re-running the Arrow
    # UDF on raw html every round. Extraction is deterministic per
    # page, so per-round extraction repeats work AND — measured — the
    # fetch join then shuffles ~1 KB of html per row through local
    # disk, which is the one resource cores don't scale (this
    # sandbox's single virtio disk; spinning-rust-adjacent on real
    # clusters too). With pages_ext the round loop is pure JVM: only
    # ~300 B of text/outlinks move, and the Python stage runs exactly
    # once per corpus. This is the standard WARC→columnar prep step.
    precompute_extraction: bool = True

    def validate(self) -> None:
        if not self.seeds:
            raise ValueError("seeds must be non-empty")
        if self.max_depth < 0 or self.max_rounds < 1:
            raise ValueError("max_depth >= 0 and max_rounds >= 1 required")
        unknown = [e for e in self.engines if e not in ENGINE_SCORES]
        if unknown:
            raise ValueError(f"unknown engines: {unknown}")


def _engine_expr(depth_col, engines: tuple[str, ...]):
    e = F.lit(engines[0])
    for i, name in enumerate(engines):
        e = F.when(depth_col % len(engines) == i, name).otherwise(e)
    return e


def _score_expr(engine_col):
    e = F.lit(0.0)
    for name, s in ENGINE_SCORES.items():
        e = F.when(engine_col == name, F.lit(s)).otherwise(e)
    return e


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        pages_path: str | DataFrame,
        robots_path: str | DataFrame,
        store: TableStore,
        config: CrawlConfig,
    ):
        config.validate()
        self.spark = spark
        self.config = config
        self.store = store
        self.pages = (
            pages_path
            if isinstance(pages_path, DataFrame)
            else spark.read.parquet(pages_path)
        )
        self.robots = (
            robots_path
            if isinstance(robots_path, DataFrame)
            else spark.read.parquet(robots_path)
        )

    # -- state ---------------------------------------------------------------
    def frontier_from(self, urls_df: DataFrame) -> DataFrame:
        """Build a depth-0 frontier from any DataFrame with a url column
        (used by run() for config seeds and by the bench harness to seed
        the whole corpus without a driver-side list)."""
        cfg = self.config
        depth = F.lit(0)
        engine = _engine_expr(depth, cfg.engines)
        return urls_df.select(
            "url",
            pol.domain_expr("url").alias("domain"),
            depth.cast("int").alias("depth"),
            engine.alias("engine"),
            _score_expr(engine).alias("score"),
            F.lit(0).cast("int").alias("retry_count"),
            F.lit(0).cast("int").alias("discovered_round"),
        )

    def _seed_frontier(self) -> DataFrame:
        return self.frontier_from(
            self.spark.createDataFrame([(u,) for u in self.config.seeds], "url string")
        )

    def extracted_pages(self) -> DataFrame:
        """Pages with text/outlinks extracted (Arrow-batched UDF) and
        html dropped: (url, warc_ts, text, outlinks, html_absent)."""
        ext = map_in_pandas_extract(self.pages.select("url", "warc_ts", "html"))
        return ext.select(
            "url",
            "warc_ts",
            F.col("extracted_text").alias("text"),
            "outlinks",
            F.col("html").isNull().alias("html_absent"),
        )

    def ensure_pages_ext(self) -> DataFrame:
        """Materialize the one-time extraction table (idempotent)."""
        if not self.store.exists("pages_ext"):
            self.store.overwrite("pages_ext", self.extracted_pages())
        return self.store.read("pages_ext")

    def current_round(self) -> int:
        if not self.store.exists("metrics"):
            return 0
        row = self.store.read("metrics").agg(F.max("round").alias("r")).collect()[0]
        return int(row["r"] or 0)

    # -- one micro-round ------------------------------------------------------
    def plan_round(self, round_no: int) -> dict:
        """Build (lazily) the round's DataFrames without committing:
        {'results': all decided rows, 'stalled': deferred frontier rows,
        'frontier': the input frontier}. Used by run_round (which
        commits) and by the compute-only bench path."""
        cfg = self.config
        frontier = self.store.read("frontier", FRONTIER_SCHEMA)
        seen = self.store.read("seen", SEEN_SCHEMA)

        # 1. per-url dedup of candidates (duplicate discoveries keep the
        #    best (depth, score, url) row — deterministic)
        wdup = Window.partitionBy("url").orderBy(
            F.asc("depth"),
            F.desc("score"),
            F.asc("engine"),
            F.asc("discovered_round"),
            F.desc("retry_count"),  # prefer the further-along retry row
        )
        candidates = (
            frontier.withColumn("_rn", F.row_number().over(wdup))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

        # 2. seen-set anti-join (bloom-accelerated when configured)
        unseen = anti_join_seen(candidates, seen, use_bloom=cfg.use_bloom)

        # 3. robots + politeness params (broadcast join). NOTE: branches
        # below (denied / admitted / stalled) re-derive from this plan;
        # measured at 100k rows, recomputation beats persist() by ~2x
        # (MEMORY_AND_DISK serialization costs more than the narrow
        # recompute), so no caching here.
        ruled = pol.with_robots_decision(unseen, self.robots)

        denied = ruled.where(F.col("robots_denied"))
        allowed = ruled.where(~F.col("robots_denied"))

        # 4. priority admission (salted two-phase when configured)
        if cfg.salt_buckets > 1:
            salt = F.pmod(F.xxhash64("url"), F.lit(cfg.salt_buckets))
            w1 = Window.partitionBy("domain", salt.alias("_salt")).orderBy(
                F.asc("depth"), F.desc("score"), F.asc("url")
            )
            # phase 1: cut each (domain, salt) shard to its capacity —
            # at most salt_buckets * capacity rows per domain survive
            pre = allowed.withColumn("_prern", F.row_number().over(w1)).where(
                F.col("_prern") <= pol.capacity_expr(cfg.round_len_s)
            )
            survivors = pre.drop("_prern")
            ranked_top = pol.admit(survivors, cfg.round_len_s)
            # rows cut in phase 1 are stalled by definition (rank > capacity)
            stalled_phase1 = allowed.join(
                survivors.select("url"), "url", "left_anti"
            ).withColumn("admitted", F.lit(False))
            admitted = ranked_top.where(F.col("admitted"))
            stalled = ranked_top.where(~F.col("admitted")).unionByName(
                stalled_phase1, allowMissingColumns=True
            )
        else:
            ranked = pol.admit(allowed, cfg.round_len_s)
            admitted = ranked.where(F.col("admitted"))
            stalled = ranked.where(~F.col("admitted"))

        # 5. fetch = join extracted pages on url; decision CASE. The
        # results table is a pure DECISION LOG: text/outlinks stay
        # normalized in pages_ext (joined on demand via
        # results_with_text), so the fetch join moves only ~60 B/row —
        # Catalyst prunes text/outlinks out of the scan entirely.
        pext = (
            self.ensure_pages_ext()
            if cfg.precompute_extraction
            else self.extracted_pages()
        )
        pages = pext.select(
            "url",
            "warc_ts",
            "html_absent",
            F.lit(True).alias("_page_exists"),
        )
        fetched_join = admitted.join(pages, "url", "left")
        decision = (
            F.when(F.col("_page_exists").isNull(), "not_found")
            .when(F.col("html_absent"), "fetch_failed")
            .otherwise("fetched")
        )
        decided = fetched_join.withColumn("fetch_decision", decision)

        # retry ladder: transient failures below budget re-enqueue
        # instead of being recorded (CrawlConfig.max_retries)
        retryable_pred = (F.col("fetch_decision") == "fetch_failed") & (
            F.col("retry_count") < F.lit(cfg.max_retries)
        )
        retryable = decided.where(retryable_pred)
        decided = decided.where(~retryable_pred)
        next_retry = F.col("retry_count") + 1
        retry_engine = _engine_expr(F.col("depth") + next_retry, cfg.engines)
        retry_frontier = retryable.select(
            "url",
            "domain",
            "depth",
            retry_engine.alias("engine"),
            _score_expr(retry_engine).alias("score"),
            next_retry.cast("int").alias("retry_count"),
            F.lit(round_no).cast("int").alias("discovered_round"),
        )

        results = decided.select(
            "url",
            "domain",
            "warc_ts",
            "fetch_decision",
            "depth",
            F.lit(round_no).cast("int").alias("round"),
            F.spark_partition_id().alias("partition_id"),
        )
        denied_results = denied.select(
            "url",
            "domain",
            F.lit(None).cast("timestamp").alias("warc_ts"),
            F.lit("robots_denied").alias("fetch_decision"),
            "depth",
            F.lit(round_no).cast("int").alias("round"),
            F.spark_partition_id().alias("partition_id"),
        )
        all_results = results.unionByName(denied_results)
        return {
            "results": all_results,
            "stalled": stalled,
            "retry": retry_frontier,
            "frontier": frontier,
        }

    def run_round(self, round_no: int) -> dict:
        cfg = self.config
        t0 = time.monotonic()
        _last = [t0]

        def _trace(label: str) -> None:
            if _TRACE:
                now = time.monotonic()
                print(
                    f"  [round {round_no}] {label}: +{now - _last[0]:.2f}s",
                    flush=True,
                )
                _last[0] = now

        plan = self.plan_round(round_no)
        n_frontier = plan["frontier"].count()
        _trace("frontier count")
        stalled = plan["stalled"]
        self.store.append("results", plan["results"])
        _trace("results append (main pipeline)")

        # read back the committed snapshot — cuts lineage, one scan reused
        # by metrics + expansion below
        round_results = self.store.read("results").where(F.col("round") == round_no)

        # 7. seen += processed urls (admitted + denied)
        self.store.append(
            "seen",
            round_results.select(
                "url", F.lit(round_no).cast("int").alias("completed_round")
            ),
        )
        _trace("seen append")

        # 8. next frontier = stalled ∪ discovered outlinks. Outlinks
        # live in pages_ext; the fetched set per round is politeness-
        # bounded (small), so AQE turns this into a broadcast join —
        # pages_ext streams through its scan, nothing wide shuffles.
        next_depth = F.col("depth") + 1
        fetched_urls = round_results.where(
            (F.col("fetch_decision") == "fetched")
            & (F.col("depth") < cfg.max_depth)
        ).select("url", "depth")
        links = (
            self.ensure_pages_ext()
            if cfg.precompute_extraction
            else self.extracted_pages()
        ).select("url", "outlinks")
        discovered = (
            links.join(fetched_urls, "url")
            .select(
                next_depth.cast("int").alias("depth"),
                F.explode("outlinks").alias("url"),
            )
        )
        engine = _engine_expr(F.col("depth"), cfg.engines)
        discovered_frontier = discovered.select(
            "url",
            pol.domain_expr("url").alias("domain"),
            "depth",
            engine.alias("engine"),
            _score_expr(engine).alias("score"),
            F.lit(0).cast("int").alias("retry_count"),
            F.lit(round_no).cast("int").alias("discovered_round"),
        )
        stalled_frontier = stalled.select(
            "url", "domain", "depth", "engine", "score", "retry_count",
            "discovered_round",
        )
        self.store.overwrite(
            "frontier",
            stalled_frontier.unionByName(discovered_frontier).unionByName(
                plan["retry"]
            ),
        )
        _trace("frontier overwrite")

        # 9. metrics (per-partition + per-round)
        wall = time.monotonic() - t0
        per_part = (
            round_results.groupBy("partition_id")
            .agg(
                F.count(F.lit(1)).alias("n_processed"),
                F.sum(
                    F.when(F.col("fetch_decision") == "robots_denied", 1).otherwise(0)
                ).alias("n_robots_denied"),
                F.sum(
                    F.when(F.col("fetch_decision") == "fetched", 1).otherwise(0)
                ).alias("n_fetched"),
            )
            .collect()
        )
        _trace("metrics collect")
        n_processed = sum(r["n_processed"] for r in per_part)
        n_denied = sum(r["n_robots_denied"] for r in per_part)
        n_fetched_total = sum(r["n_fetched"] for r in per_part)
        n_stalled = (
            self.store.read("frontier", FRONTIER_SCHEMA)
            .where(F.col("discovered_round") < round_no)
            .count()
        )
        _trace("stalled count (committed frontier)")
        n_unseen = n_processed + n_stalled
        metrics_rows = [
            (
                round_no,
                int(r["partition_id"]),
                int(n_frontier),
                int(n_frontier - n_unseen),
                int(n_stalled),
                int(r["n_robots_denied"]),
                int(r["n_fetched"]),
                float(wall),
                float(r["n_processed"] / wall if wall > 0 else 0.0),
            )
            for r in per_part
        ] or [(round_no, -1, int(n_frontier), int(n_frontier - n_unseen), int(n_stalled), 0, 0, float(wall), 0.0)]
        from pixcrawler_spark.schemas import METRICS_SCHEMA

        self.store.append(
            "metrics", self.spark.createDataFrame(metrics_rows, METRICS_SCHEMA)
        )
        return {
            "round": round_no,
            "n_frontier": n_frontier,
            "n_seen_skipped": int(n_frontier - n_unseen),
            "n_processed": int(n_processed),
            "n_robots_denied": int(n_denied),
            "n_fetched": int(n_fetched_total),
            "n_stalled": int(n_stalled),
            "wall_seconds": round(wall, 3),
            "urls_per_sec": round(n_processed / wall, 1) if wall > 0 else 0.0,
        }

    # -- full crawl ------------------------------------------------------------
    def run(self, resume: bool = False) -> list[dict]:
        """Run rounds until the frontier drains or max_rounds is hit.
        ``resume=True`` continues from the last committed round — the
        checkpoint-equivalence contract (FIXTURES.md §4)."""
        if not resume:
            for t in ("frontier", "seen", "results", "metrics"):
                self.store.drop(t)
            self.store.overwrite("frontier", self._seed_frontier())
            start = 1
        else:
            start = self.current_round() + 1
        summaries = []
        for r in range(start, self.config.max_rounds + 1):
            if self.store.read("frontier", FRONTIER_SCHEMA).limit(1).count() == 0:
                break
            summaries.append(self.run_round(r))
        return summaries

    # -- outputs ---------------------------------------------------------------
    def results_with_text(self) -> DataFrame:
        """Denormalized results view: decision log joined back to
        pages_ext for text/outlinks of fetched rows (the old wide
        results shape, computed on demand instead of stored twice)."""
        res = self.store.read("results")
        pext = (
            self.ensure_pages_ext()
            if self.config.precompute_extraction
            else self.extracted_pages()
        ).select("url", "text", "outlinks")
        joined = res.join(pext, "url", "left")
        is_fetched = F.col("fetch_decision") == "fetched"
        return joined.select(
            "url",
            "domain",
            "warc_ts",
            F.when(is_fetched, F.col("text")).alias("text"),
            F.when(is_fetched, F.col("outlinks")).alias("outlinks"),
            "fetch_decision",
            "depth",
            "round",
            "partition_id",
        )

    def crawl_order(self) -> DataFrame:
        """The ordering contract: (round, domain, priority_rank, url) of
        processed (non-denied) urls, re-derived from results ranks."""
        res = self.store.read("results").where(
            F.col("fetch_decision") != "robots_denied"
        )
        w = Window.partitionBy("round", "domain").orderBy(
            F.asc("depth"), F.asc("url")
        )
        return res.select(
            "round", "domain", F.row_number().over(w).alias("rank_in_round"), "url"
        )
