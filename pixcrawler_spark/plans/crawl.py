"""The crawl round loop: frontier → robots → priority admission →
fetch join → decision log → frontier/seen maintenance.

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

ARCHITECTURE (v3 — Mercator invariant + MERGE-ON-READ frontier):

The LOGICAL frontier keeps the invariant **unique urls, disjoint from
the seen set** (the reference's progress-cache skip,
builder/progress.py:84-96, enforced at enqueue time instead of per
round), but is stored as three url-bucketed tables instead of one
rewritten blob:

    logical = merge_best(base ANTI removed, added)

- ``frontier`` (base): immutable between compactions;
- ``frontier_removed``: append-only (url, round) tombstones for every
  decided url (the Iceberg delete-file analog);
- ``frontier_added``: the accumulated discovery/retry rows since the
  last compaction — rewritten each round, but it is delta-sized.

``merge_best`` distributes over per-url anti-joins, so folding each
round's delta into ``added`` and tombstoning decided urls is EXACTLY
equivalent to the v2 full rewrite (the pytest oracle + goldens pin
this). All three tables share the url bucket layout, so the logical
view is exchange-free: bucketed SMJ anti + co-bucketed full-outer
merge, no shuffle.

A round is then:

1. DECIDE (the hot path, one linear plan, materialized once as
   ``round_log``): scan the logical frontier (politeness columns are
   denormalized at enqueue time — no per-round robots join; see
   FRONTIER_SCHEMA) → either record ``robots_denied`` from the stored
   flag, or rank by priority per domain and admit up to the politeness
   capacity → join admitted against the (bucketed) pages table on url
   → fetch-decision CASE. Rows the rank cuts are *politeness stalls*:
   they are simply not in the log and stay in the frontier untouched.
2. MAINTAIN (deltas only, CONCURRENT Spark jobs): results/seen/
   tombstone appends = scans of the committed log; ``added`` is
   rewritten as merge_best(added ANTI log, deduped seen-filtered
   politeness-stamped discoveries + retry re-enqueues); per-partition
   metrics + the logical-count telemetry. NO full-frontier write, NO
   full-frontier shuffle — only scans (which parallelize) and
   delta-sized writes.
3. COMPACT (every ``compact_every`` rounds, idempotent): base :=
   materialized logical; tombstones/added truncate. A crash anywhere
   inside compaction leaves the logical view unchanged (merging an
   already-compacted base with stale deltas is a no-op by
   construction).

SCALE NOTES (10^10-URL frontier):
- **No wide shuffle of any static table.** ``seen``, ``pages_ext``
  and ``frontier`` are stored bucketed by url (TableStore → Iceberg
  ``bucket(N, url)`` in production), so the fetch join, the discovery
  anti-joins and the remainder anti-join only shuffle the per-round
  delta (politeness-bounded), never the big side.
- **Skew-proof admission.** The per-domain priority window ranks a
  Zipf-skewed key; the admission filter carries a *literal* global
  capacity bound alongside the per-domain capacity column, which lets
  Spark's WindowGroupLimit rule run a map-side partial top-K per
  domain BEFORE the exchange — the hottest domain contributes at most
  K rows per map task to the shuffle instead of its full row count.
  (``bench/profile_round.py`` measured the unsalted window serializing
  18% of the corpus into one task without this.) The salted two-phase
  variant (``salt_buckets > 1``) covers unbounded-capacity scenarios.
- The discovery seen-probe can be bloom-accelerated (operators/
  seen.py) when ``use_bloom`` — an INCREMENTAL persistent bitmap
  (delta-only updates per round, staleness-safe rebuild); false drops
  impossible by construction (probe → exact confirm join).
- Each round commits round_log/results/seen/frontier/metrics
  (TableStore → Iceberg in production). COMMIT ORDER makes a crashed
  round idempotent: round_log (stamped with its round) → results/seen
  appends (computed concurrently with the frontier's data write) →
  the frontier manifest flip (STAGED during the concurrent phase,
  committed strictly last — the round's single commit point) →
  metrics. Re-entry after a crash therefore sees exactly one of two
  states: the frontier not yet advanced (roll back any partial
  results/seen commits and re-run the deterministic decide plan), or
  the frontier advanced (results/seen are complete by construction;
  only metrics needs finalizing from the committed log). See
  ``_recover``.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

_TRACE = os.environ.get("PIXCRAWLER_TRACE", "") == "1"

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from pixcrawler_spark.functions.text import map_in_pandas_extract
from pixcrawler_spark.operators import politeness as pol
from pixcrawler_spark.operators.seen import anti_join_seen
from pixcrawler_spark.schemas import FRONTIER_SCHEMA, REMOVED_SCHEMA, SEEN_SCHEMA
from pixcrawler_spark.sources.tables import TableStore

ENGINE_SCORES = {"google": 1.0, "bing": 0.8, "baidu": 0.6}

# priority/dedup ordering used everywhere a "best" frontier row is
# chosen: (depth asc, score desc, engine asc, discovered_round asc,
# retry_count desc) — the further-along retry row wins ties
def _best_order():
    return [
        F.asc("depth"),
        F.desc("score"),
        F.asc("engine"),
        F.asc("discovered_round"),
        F.desc("retry_count"),
    ]


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
    # Per-round HLL registers of decided urls per fetch decision
    # (operators/sketches.py, fast xxhash64 path), committed next to
    # the metrics row. OFF by default: the golden/oracle surface is
    # byte-identical with the flag off; ON adds one ≤512×decisions-row
    # agg over the already-evaluated round log and a driver-side
    # append. Registers merge by max(rho) at read time, so
    # ``distinct_url_estimates()`` answers "how many DISTINCT urls has
    # this crawl decided per outcome" over any round range without
    # rescanning results — the telemetry the reference keeps as exact
    # Python sets (builder/progress.py), with fixed-size state.
    sketch_telemetry: bool = False
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
    # page; this is the standard WARC→columnar prep step, and it keeps
    # the steady-state round loop pure JVM.
    precompute_extraction: bool = True
    # url-hash bucket count for the seen/pages_ext/frontier tables
    # (Iceberg bucket(N, url) in production). Set ≈ total cores.
    n_buckets: int = 32
    # MERGE-ON-READ frontier: every round appends tombstones for
    # decided urls and rewrites only the small `frontier_added` table;
    # the immutable base is re-materialized (compacted) when the
    # accumulated tombstones exceed ``compact_ratio`` of the base —
    # the Iceberg delete-file/compaction pattern, triggered by the
    # quantity that actually degrades reads (tombstone anti-join
    # traffic scales with |removed|, not with wall-clock rounds).
    # Counters chain through commit metadata, so the policy costs no
    # extra Spark jobs. ``compact_every`` remains as an optional
    # periodic override (0 = off); ratio 0 disables the ratio trigger.
    compact_ratio: float = 0.25
    compact_every: int = 0
    # Resolve redirect aliases to their chain-terminal url BEFORE any
    # url enters the frontier (seeds and discovered outlinks), so the
    # seen set and politeness budgets are charged to the page actually
    # fetched and an alias is never crawled separately from its
    # target. Requires a redirects DataFrame (src, dst) passed to the
    # engine; cycle members (redirect loops — crawler traps) are
    # dropped at the door. Pointer doubling: log2(chain) equi-joins
    # per round over the enqueue-time DELTA only
    # (operators/redirects.py). OFF by default: the golden/oracle
    # surface is byte-identical with the flag off.
    resolve_redirects: bool = False
    # Resolve RELATIVE outlinks (../x, ./y, /abs, //host/p, ?q=2)
    # against the linking page's url before they enter the frontier —
    # RFC 3986 §5 as a zero-shuffle expression tree
    # (operators/urlresolve.py). Without it every relative form of a
    # page is a distinct frontier row that can never match the pages
    # table. Absolute hrefs pass through verbatim, so a corpus of
    # absolute links discovers the same set under either setting; OFF
    # by default to keep the flag-off plan shape untouched.
    resolve_relative: bool = False

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
        static_store: TableStore | None = None,
        redirects: DataFrame | None = None,
    ):
        config.validate()
        self.spark = spark
        self.config = config
        self.store = store
        # pages_ext is immutable per corpus; an optional separate store
        # lets benchmarks/multiple crawls share one materialization
        self.static_store = static_store or store
        self._bucket = (("url",), config.n_buckets)
        self._cap_bound: int | None = None
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
        self.redirects = redirects
        self._alias_map_df: DataFrame | None = None
        if config.resolve_redirects and redirects is None:
            raise ValueError(
                "resolve_redirects=True requires a redirects DataFrame"
            )

    def _alias_map(self) -> DataFrame:
        """Resolve the (static) redirect map ONCE per crawl: pointer
        doubling runs over the alias universe a single time, and every
        round pays only one equi-join of its enqueue delta against the
        persisted (alias → terminal, is_cycle) map — never the log-hop
        join cascade per round."""
        if self._alias_map_df is None:
            from pixcrawler_spark.operators.redirects import (
                resolve_redirects,
            )

            aliases = self.redirects.select(
                F.col("src").alias("url")
            ).dropDuplicates(["url"])
            res = resolve_redirects(aliases, self.redirects)
            m = res.select("url", "final_url", "is_cycle").persist()
            m.count()  # materialize, then release doubling internals
            cached = getattr(res, "_doubling_cached", None)
            if cached is not None:
                cached.unpersist()
            self._alias_map_df = m
        return self._alias_map_df

    def _resolve_aliases(self, rows: DataFrame) -> DataFrame:
        """Map every url in ``rows`` to its redirect-chain terminal,
        dropping cycle members (crawler traps). No-op unless
        cfg.resolve_redirects. Runs over the enqueue-time delta only —
        never the accumulated frontier — and before domain stamping,
        because the TERMINAL's host is the one whose politeness budget
        the fetch spends."""
        if not self.config.resolve_redirects:
            return rows
        m = self._alias_map()
        other = [c for c in rows.columns if c != "url"]
        joined = rows.join(m, "url", "left")
        return joined.where(
            F.col("is_cycle").isNull() | ~F.col("is_cycle")
        ).select(
            F.coalesce("final_url", F.col("url")).alias("url"), *other
        )

    # -- state ---------------------------------------------------------------
    def frontier_from(self, urls_df: DataFrame) -> DataFrame:
        """Build a depth-0 frontier from any DataFrame with a url column
        (used by run() for config seeds and by the bench harness to seed
        the whole corpus without a driver-side list). Drops duplicate
        urls (frontier invariant; redirect aliases collapse to their
        terminal first when cfg.resolve_redirects, so two seed aliases
        of one page yield one frontier row)."""
        cfg = self.config
        depth = F.lit(0)
        engine = _engine_expr(depth, cfg.engines)
        rows = self._resolve_aliases(
            urls_df.select("url").dropDuplicates(["url"])
        ).dropDuplicates(["url"]).select(
            "url",
            pol.domain_expr("url").alias("domain"),
            depth.cast("int").alias("depth"),
            engine.alias("engine"),
            _score_expr(engine).alias("score"),
            F.lit(0).cast("int").alias("retry_count"),
            F.lit(0).cast("int").alias("discovered_round"),
        )
        return self._with_politeness(rows)

    def _with_politeness(self, rows: DataFrame) -> DataFrame:
        """Enqueue-time robots/politeness stamp (see FRONTIER_SCHEMA
        note): joined per delta, never per full frontier."""
        return pol.with_robots_decision(rows, self.robots).select(
            *[f.name for f in FRONTIER_SCHEMA.fields]
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
        """Materialize the one-time extraction table, bucketed by url so
        every later fetch/expansion join scans it exchange-free
        (idempotent)."""
        if not self.static_store.exists("pages_ext"):
            self.static_store.overwrite(
                "pages_ext", self.extracted_pages(), bucket=self._bucket
            )
        return self.static_store.read("pages_ext")

    # -- merge-on-read frontier view ------------------------------------------
    FRONTIER_TABLES = ("frontier", "frontier_added", "frontier_removed")

    def logical_frontier(self, as_of_round: int | None = None) -> DataFrame:
        """The live frontier: merge_best(base ANTI removed, added).

        ``as_of_round`` filters tombstones to ``round < as_of_round``,
        which makes the view IMMUNE to a concurrent (or crashed)
        round-N tombstone append — the same guard trick the seen reads
        use (completed_round < N). All three tables are url-bucketed:
        the anti-join and the full-outer merge are co-partitioned SMJs
        with no exchange."""
        base = self.store.read("frontier", FRONTIER_SCHEMA)
        has_removed = self.store.exists("frontier_removed")
        has_added = self.store.exists("frontier_added")
        if not has_removed and not has_added:
            return base
        removed = self.store.read("frontier_removed", REMOVED_SCHEMA)
        if as_of_round is not None:
            removed = removed.where(F.col("round") < as_of_round)
        live = base.join(
            removed.select("url").hint("merge"), "url", "left_anti"
        )
        if not has_added:
            return live
        added = self.store.read("frontier_added", FRONTIER_SCHEMA)
        return self._merge_best(live, added)

    def current_round(self) -> int:
        if not self.store.exists("metrics"):
            return 0
        row = self.store.read("metrics").agg(F.max("round").alias("r")).collect()[0]
        return int(row["r"] or 0)

    def _capacity_bound(self) -> int:
        """Literal global upper bound on per-domain capacity, computed
        once per crawl from the robots table (+ the unknown-domain
        default). Conjoining ``rank <= BOUND`` (literal) with the exact
        ``rank <= capacity`` (column) lets WindowGroupLimit cut the
        window map-side — the skew story of the admission operator."""
        if self._cap_bound is None:
            row = (
                self.robots.select(
                    pol.capacity_expr(self.config.round_len_s).alias("cap")
                )
                .agg(F.max("cap").alias("m"))
                .collect()[0]
            )
            default_cap = pol.DEFAULT_MAX_PER_ROUND
            if pol.DEFAULT_CRAWL_DELAY_S > 0:
                default_cap = min(
                    default_cap,
                    int(self.config.round_len_s // pol.DEFAULT_CRAWL_DELAY_S),
                )
            self._cap_bound = max(int(row["m"] or 0), default_cap, 1)
        return self._cap_bound

    # -- one micro-round ------------------------------------------------------
    def decide_plan(self, round_no: int) -> DataFrame:
        """The round's decision log as ONE lazily-built DataFrame:
        every row of the frontier that gets decided this round —
        robots_denied ∪ admitted (fetched / fetch_failed / not_found)
        — with a ``will_retry`` marker for transient failures below
        the retry budget. Politeness-stalled rows are absent by
        design (they stay in the frontier).

        No robots join here: politeness columns are denormalized into
        the frontier at enqueue time (FRONTIER_SCHEMA note), so the
        plan is linear except the denied/admitted split, whose shared
        prefix is the logical-frontier view (bucketed scans +
        exchange-free SMJs; cheap to run twice — scans parallelize,
        nothing shuffles)."""
        cfg = self.config
        ruled = self.logical_frontier(round_no)

        denied = ruled.where(F.col("robots_denied"))
        allowed = ruled.where(~F.col("robots_denied"))

        # priority admission: exact per-domain top-capacity
        if cfg.salt_buckets > 1:
            # two-phase salted top-k (unbounded-capacity safe): phase 1
            # cuts each (domain, salt) shard to capacity — at most
            # salt*capacity rows per domain reach the exact re-rank
            salt = F.pmod(F.xxhash64("url"), F.lit(cfg.salt_buckets))
            w1 = Window.partitionBy("domain", salt.alias("_salt")).orderBy(
                F.asc("depth"), F.desc("score"), F.asc("url")
            )
            survivors = (
                allowed.withColumn("_prern", F.row_number().over(w1))
                .where(F.col("_prern") <= pol.capacity_expr(cfg.round_len_s))
                .drop("_prern")
            )
            admitted = (
                pol.admit(survivors, cfg.round_len_s)
                .where(F.col("admitted"))
                .drop("priority_rank", "admitted")
            )
        else:
            w = Window.partitionBy("domain").orderBy(
                F.asc("depth"), F.desc("score"), F.asc("url")
            )
            bound = self._capacity_bound()
            admitted = (
                allowed.withColumn("_rank", F.row_number().over(w))
                .where(
                    (F.col("_rank") <= F.lit(bound))  # literal → WindowGroupLimit
                    & (F.col("_rank") <= pol.capacity_expr(cfg.round_len_s))
                )
                .drop("_rank")
            )

        # fetch = join admitted against the bucketed pages table on url
        # (only the admitted delta shuffles); decision CASE replaces
        # classify_http_error (builder/_exceptions.py:216-240)
        pext = (
            self.ensure_pages_ext()
            if cfg.precompute_extraction
            else self.extracted_pages()
        )
        pages = pext.select(
            "url", "warc_ts", "html_absent", F.lit(True).alias("_page_exists")
        )
        fetched = admitted.join(pages, "url", "left")
        decision = (
            F.when(F.col("_page_exists").isNull(), "not_found")
            .when(F.col("html_absent"), "fetch_failed")
            .otherwise("fetched")
        )
        decided = fetched.withColumn("fetch_decision", decision)

        log_cols = [
            "url",
            "domain",
            "depth",
            "engine",
            "score",
            "retry_count",
            "discovered_round",
            # politeness stamp carried through so retry re-enqueues
            # need no robots re-join
            "robots_denied",
            "crawl_delay_s",
            "max_per_round",
            "warc_ts",
            "fetch_decision",
            "will_retry",
            F.lit(round_no).cast("int").alias("round"),
            F.spark_partition_id().alias("partition_id"),
        ]
        decided_log = decided.withColumn(
            "will_retry",
            (F.col("fetch_decision") == "fetch_failed")
            & (F.col("retry_count") < F.lit(cfg.max_retries)),
        ).select(*log_cols)
        denied_log = (
            denied.withColumn("warc_ts", F.lit(None).cast("timestamp"))
            .withColumn("fetch_decision", F.lit("robots_denied"))
            .withColumn("will_retry", F.lit(False))
            .select(*log_cols)
        )
        return decided_log.unionByName(denied_log)

    def plan_round(self, round_no: int) -> dict:
        """Compatibility view over decide_plan: {'results': recorded
        decisions, 'retry': re-enqueued frontier rows, 'frontier': the
        input frontier}."""
        log = self.decide_plan(round_no)
        return {
            "results": log.where(~F.col("will_retry")).select(
                "url", "domain", "warc_ts", "fetch_decision", "depth",
                "discovered_round", "round", "partition_id",
            ),
            "retry": self._retry_frontier(log, round_no),
            "frontier": self.logical_frontier(round_no),
        }

    def _retry_frontier(self, log: DataFrame, round_no: int) -> DataFrame:
        cfg = self.config
        next_retry = F.col("retry_count") + 1
        retry_engine = _engine_expr(F.col("depth") + next_retry, cfg.engines)
        return log.where(F.col("will_retry")).select(
            "url",
            "domain",
            "depth",
            retry_engine.alias("engine"),
            _score_expr(retry_engine).alias("score"),
            next_retry.cast("int").alias("retry_count"),
            F.lit(round_no).cast("int").alias("discovered_round"),
            "robots_denied",
            "crawl_delay_s",
            "max_per_round",
        )

    def _discovered_frontier(self, log: DataFrame, round_no: int) -> DataFrame:
        """Outlinks of this round's fetched pages as frontier rows
        (pre-dedup). The expansion join hits the bucketed pages table,
        so only the fetched delta shuffles."""
        cfg = self.config
        fetched_urls = log.where(
            (F.col("fetch_decision") == "fetched")
            & (F.col("depth") < cfg.max_depth)
            & (~F.col("will_retry"))
        ).select("url", "depth")
        links = (
            self.ensure_pages_ext()
            if cfg.precompute_extraction
            else self.extracted_pages()
        ).select("url", "outlinks")
        next_depth = (F.col("depth") + 1).cast("int")
        # merge hint: the fetched set grows with the politeness budget —
        # a driver-built broadcast would serialize with round size; SMJ
        # scans bucketed pages_ext exchange-free, fetched urls shuffle
        if cfg.resolve_relative:
            from pixcrawler_spark.operators.urlresolve import (
                resolve_reference,
            )

            # keep the linking page's url through the explode so each
            # href resolves against its own base — still a narrow map
            discovered = (
                links.join(fetched_urls.hint("merge"), "url")
                .select(
                    next_depth.alias("depth"),
                    F.col("url").alias("base_url"),
                    F.explode("outlinks").alias("href"),
                )
                .select(
                    "depth",
                    resolve_reference(
                        F.col("base_url"), F.col("href")
                    ).alias("url"),
                )
            )
        else:
            discovered = links.join(fetched_urls.hint("merge"), "url").select(
                next_depth.alias("depth"), F.explode("outlinks").alias("url")
            )
        # alias collapse BEFORE the seen join/dedup: an outlink to a
        # redirect alias is a discovery of its terminal (no-op unless
        # cfg.resolve_redirects)
        discovered = self._resolve_aliases(discovered)
        engine = _engine_expr(F.col("depth"), cfg.engines)
        # politeness stamp happens later, on the deduped seen-filtered
        # delta (run_round.job_frontier) — the smallest possible set
        return discovered.select(
            "url",
            pol.domain_expr("url").alias("domain"),
            "depth",
            engine.alias("engine"),
            _score_expr(engine).alias("score"),
            F.lit(0).cast("int").alias("retry_count"),
            F.lit(round_no).cast("int").alias("discovered_round"),
        )

    @staticmethod
    def _merge_best(remainder: DataFrame, delta: DataFrame) -> DataFrame:
        """Full-outer merge of two unique-url frontier sets keeping the
        best row per url by _best_order(). The remainder side is the
        bucketed frontier scan (no exchange); only the delta shuffles.
        Implemented as a struct min — (depth, -score, engine,
        discovered_round, -retry_count) is totally ordered."""
        def keyed(df: DataFrame, side: str) -> DataFrame:
            return df.select(
                "url",
                F.struct(
                    F.col("depth"),
                    (-F.col("score")).alias("_negscore"),
                    F.col("engine"),
                    F.col("discovered_round"),
                    (-F.col("retry_count")).alias("_negretry"),
                    F.col("domain"),
                    F.col("score"),
                    F.col("retry_count"),
                    F.col("robots_denied"),
                    F.col("crawl_delay_s"),
                    F.col("max_per_round"),
                ).alias(f"_k_{side}"),
            )

        merged = keyed(remainder, "a").join(keyed(delta, "b"), "url", "full_outer")
        best = F.least(F.col("_k_a"), F.col("_k_b"))  # least ignores nulls
        return merged.select(
            "url",
            best["domain"].alias("domain"),
            best["depth"].alias("depth"),
            best["engine"].alias("engine"),
            best["score"].alias("score"),
            best["retry_count"].alias("retry_count"),
            best["discovered_round"].alias("discovered_round"),
            best["robots_denied"].alias("robots_denied"),
            best["crawl_delay_s"].alias("crawl_delay_s"),
            best["max_per_round"].alias("max_per_round"),
        )

    def _delta_expr(self, log: DataFrame, round_no: int) -> DataFrame:
        """Raw (pre-dedup) frontier delta of a round: discovered
        outlinks ∪ retry re-enqueues. Deterministic given the committed
        log, so recovery can recompute it."""
        return self._discovered_frontier(log, round_no).unionByName(
            self._retry_frontier(log, round_no).drop(
                "robots_denied", "crawl_delay_s", "max_per_round"
            )
        )

    def _recover(self, round_no: int) -> dict | None:
        """Idempotent re-entry for round N (see module docstring commit
        order). Returns a reconstructed summary when the round's commit
        point already passed (only metrics was lost in the crash), else
        rolls back partial commits and returns None so the round runs
        normally. Rollback pieces:

        - tagged round-N results/metrics snapshots → dropped (manifest);
        - bucketed seen rows from a half-committed append → detected
          driver-side via parquet footer stats (max completed_round ≥ N,
          no scan) and removed by a filter-rewrite — the parquet
          stand-in for Iceberg's ``DELETE WHERE completed_round >= N``
          (metadata-level there; a one-off table rewrite here, paid only
          on actual crash recovery);
        - a bloom blob advanced past N-1 is harmless: extra bits only
          send more rows to the exact confirm join (probe is a
          prefilter, never an authority);
        - half-committed round-N tombstones in ``frontier_removed``
          are rewritten out (they are ALSO harmless to correctness —
          every logical_frontier read is as_of-guarded — but the
          rewrite keeps replay appends from accumulating duplicates).
        """
        fmeta = self._frontier_commit_meta()
        if int(fmeta.get("round", -1)) >= round_no:
            return self._finalize_metrics(round_no)
        self.store.drop_tagged("results", {f"round-{round_no}"})
        self.store.drop_tagged("metrics", {f"round-{round_no}"})
        if self.store.exists("sketch_registers"):
            self.store.drop_tagged("sketch_registers", {f"round-{round_no}"})
        if self.store.exists("seen"):
            mx = self.store.column_max("seen", "completed_round")
            if mx is not None and int(mx) >= round_no:
                clean = self.store.read("seen", SEEN_SCHEMA).where(
                    F.col("completed_round") < round_no
                )
                self.store.overwrite("seen", clean, bucket=self._bucket)
        if self.store.exists("frontier_removed"):
            mx = self.store.column_max("frontier_removed", "round")
            if mx is not None and int(mx) >= round_no:
                clean = self.store.read(
                    "frontier_removed", REMOVED_SCHEMA
                ).where(F.col("round") < round_no)
                self.store.overwrite(
                    "frontier_removed", clean, bucket=self._bucket
                )
        return None

    def _frontier_commit_meta(self) -> dict:
        """The round's commit point is the ``frontier_added`` flip
        (fresh crawls / post-compaction states stamp the base and the
        truncated added identically; whichever is newer wins)."""
        metas = []
        for t in ("frontier_added", "frontier"):
            if self.store.exists(t):
                metas.append(int(self.store.table_meta(t).get("round", -1)))
        return {"round": max(metas)} if metas else {}

    def _finalize_metrics(self, round_no: int) -> dict:
        """Round N crashed after its frontier commit point: results,
        seen and tombstones are complete by the commit order; recompute
        the metrics row from the committed round_log. The input
        frontier size was stamped into the added-table commit meta.
        Wall-clock of the crashed attempt is unrecoverable → 0."""
        lmeta = self.store.table_meta("round_log")
        if int(lmeta.get("round", -1)) != round_no:
            raise RuntimeError(
                f"recovery invariant violated: frontier advanced to round "
                f"{round_no} but round_log meta says {lmeta.get('round')}"
            )
        n_frontier = int(
            self.store.table_meta("frontier_added").get("n_frontier", 0)
        )
        log = self.store.read("round_log")
        per_part = self._metrics_agg(log)
        n_disc_raw = int(self._delta_expr(log, round_no).count())
        n_disc_new = self._count_disc_new(log, round_no)
        return self._commit_metrics(
            round_no, per_part, n_frontier, n_disc_raw, n_disc_new,
            wall=0.0, log=log,
        )

    def _count_disc_new(self, log: DataFrame, round_no: int) -> int:
        """Discovery-dedup telemetry: rows of the round's deduped,
        seen-filtered delta whose url was NOT already awaiting in the
        frontier (same quantity the v2 design derived from footer
        counts; computed directly now that nothing rewrites the whole
        frontier)."""
        delta_new = self._delta_new(log, round_no)
        remainder_urls = self.logical_frontier(round_no).select("url").join(
            log.select("url").hint("merge"), "url", "left_anti"
        )
        return int(
            delta_new.join(
                remainder_urls.hint("merge"), "url", "left_anti"
            ).count()
        )

    @staticmethod
    def _metrics_agg(log: DataFrame) -> list:
        return (
            log.groupBy("partition_id")
            .agg(
                F.count(F.lit(1)).alias("n_processed"),
                F.sum(
                    F.when(
                        F.col("fetch_decision") == "robots_denied", 1
                    ).otherwise(0)
                ).alias("n_robots_denied"),
                F.sum(
                    F.when(
                        (F.col("fetch_decision") == "fetched")
                        & (~F.col("will_retry")),
                        1,
                    ).otherwise(0)
                ).alias("n_fetched"),
                F.sum(F.when(F.col("will_retry"), 1).otherwise(0)).alias(
                    "n_retrying"
                ),
            )
            .collect()
        )

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

        # crash recovery (no-op on a clean run; see _recover)
        recovered = self._recover(round_no)
        if recovered is not None:
            return recovered

        # 1. DECIDE — the one heavy job of the round, over the
        # merge-on-read logical frontier.
        self.store.overwrite(
            "round_log",
            self.decide_plan(round_no),
            meta={"round": round_no},
        )
        log = self.store.read("round_log")
        _trace("decide (round_log commit)")

        # 2-3. MAINTAIN — independent scans of the committed log,
        # submitted as CONCURRENT Spark jobs (threads share the
        # SparkSession; the scheduler interleaves their tasks). All
        # concurrent reads are guarded against the concurrent writers
        # by round predicates (seen: completed_round < N; tombstones:
        # round < N via logical_frontier's as_of) or by overwrite
        # generations, so evaluation order cannot change results.
        recorded = log.where(~F.col("will_retry"))
        # resolve reads before any concurrent write
        logical_pre = self.logical_frontier(round_no)
        added_prev = (
            self.store.read("frontier_added", FRONTIER_SCHEMA)
            if self.store.exists("frontier_added")
            else self.spark.createDataFrame([], FRONTIER_SCHEMA)
        )
        seen_prev = self.store.read("seen", SEEN_SCHEMA).where(
            F.col("completed_round") < round_no
        )
        # incremental seen-bloom: load (or rebuild if stale) the bitmap
        # covering rounds <= round_no-1 BEFORE the concurrent jobs —
        # job_seen advances the stored blob to round_no in parallel
        bloom_prebuilt = None
        if cfg.use_bloom:
            from pixcrawler_spark.operators.seen import IncrementalBloom

            self._bloom = getattr(self, "_bloom", None) or IncrementalBloom(
                self.store
            )
            bloom_prebuilt = self._bloom.ensure(
                seen_prev.select("url"), covers_round=round_no - 1
            )

        def job_results() -> None:
            self.store.append(
                "results",
                recorded.select(
                    "url", "domain", "warc_ts", "fetch_decision", "depth",
                    "discovered_round", "round", "partition_id",
                ),
                tag=f"round-{round_no}",
            )

        def job_seen() -> None:
            self.store.append(
                "seen",
                recorded.select(
                    "url", F.lit(round_no).cast("int").alias("completed_round")
                ),
                bucket=self._bucket,
            )
            if cfg.use_bloom:
                # delta-only bitmap update (the full-rebuild path is
                # only the stale-recovery fallback in ensure())
                self._bloom.update(
                    recorded.select("url"), covers_round=round_no
                )

        # discovery delta: ONE evaluation serves everything — the
        # RANKED pre-dedup delta is persisted (populated when the
        # added-rewrite job runs), so the raw-count and new-count
        # telemetry jobs read the cache instead of re-running the
        # expansion join + window
        wdup = Window.partitionBy("url").orderBy(*_best_order())
        delta_ranked = (
            self._delta_expr(log, round_no)
            .withColumn("_rn", F.row_number().over(wdup))
            .persist()
        )
        delta_new = self._delta_new(
            log, round_no, seen_prev=seen_prev,
            use_bloom=cfg.use_bloom, prebuilt=bloom_prebuilt,
            delta_ranked=delta_ranked,
        )

        # input logical-frontier size: chained arithmetically through
        # the commit metadata (n_next = n - decided + new); fresh and
        # just-compacted states are base-only, where the parquet
        # footer count is exact and free
        prev_meta = (
            self.store.table_meta("frontier_added")
            if self.store.exists("frontier_added")
            else {}
        )
        if "n_frontier_next" in prev_meta:
            n_frontier = int(prev_meta["n_frontier_next"])
            n_base = int(prev_meta.get("n_base", n_frontier))
            n_tomb_prev = int(prev_meta.get("n_tombstones", 0))
        else:
            # fresh or just-compacted: the base alone IS the logical
            # frontier and carries zero tombstones
            n_frontier = self.store.count("frontier")
            n_base = n_frontier
            n_tomb_prev = 0

        def job_removed() -> None:
            # tombstone every decided url (retries included — their
            # re-enqueued row re-enters through `added`); the
            # Iceberg delete-file analog, delta-sized append
            self.store.append(
                "frontier_removed",
                log.select(
                    "url", F.lit(round_no).cast("int").alias("round")
                ),
                bucket=self._bucket,
            )

        def job_added_stage() -> dict:
            # rewrite ONLY the delta-sized added table:
            # merge_best(added ANTI log, politeness-stamped delta_new).
            # merge_best distributes over per-url anti-joins, so this
            # plus the tombstones is exactly the v2 full rewrite.
            added_live = added_prev.join(
                log.select("url").hint("merge"), "url", "left_anti"
            )
            added_next = self._merge_best(
                added_live, self._with_politeness(delta_new)
            )
            # STAGED: the data write runs now (concurrently), but the
            # manifest flip — the round's commit point — happens only
            # after the results/seen/tombstone commits have landed.
            return self.store.stage_overwrite(
                "frontier_added", added_next, bucket=self._bucket,
                meta={"round": round_no},
            )

        def job_disc_new() -> int:
            # dedup telemetry: deduped discoveries whose url was not
            # already awaiting in the frontier (reads the as_of-guarded
            # pre-round view, immune to the concurrent commits; the
            # persisted delta_new makes this a cached-side anti-join)
            remainder_urls = logical_pre.select("url").join(
                log.select("url").hint("merge"), "url", "left_anti"
            )
            return int(
                delta_new.join(
                    remainder_urls.hint("merge"), "url", "left_anti"
                ).count()
            )

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=6) as pool:
            f_results = pool.submit(job_results)
            f_seen = pool.submit(job_seen)
            f_removed = pool.submit(job_removed)
            f_added = pool.submit(job_added_stage)
            f_metrics = pool.submit(self._metrics_agg, log)
            added_token = f_added.result()
            # the two telemetry counts read the cache the added job
            # just populated (submitted after it to avoid a duplicate
            # materialization race)
            f_disc_new = pool.submit(job_disc_new)
            f_disc_raw = pool.submit(delta_ranked.count)
            f_results.result()
            f_seen.result()
            f_removed.result()
            per_part = f_metrics.result()
            n_disc_new = f_disc_new.result()
            n_disc_raw = int(f_disc_raw.result())
        n_decided_tmp = sum(r["n_processed"] for r in per_part)
        # commit point: everything the new frontier state supersedes is
        # durable — flip the added table (one atomic rename); stamp the
        # input size + the arithmetic chain for the next round and for
        # metrics finalization after a crash
        added_token["manifest"]["meta"]["n_frontier"] = n_frontier
        added_token["manifest"]["meta"]["n_frontier_next"] = (
            n_frontier - n_decided_tmp + n_disc_new
        )
        # compaction-policy counters (chained, no Spark jobs): every
        # decided url appended one tombstone this round
        n_tombstones = n_tomb_prev + n_decided_tmp
        added_token["manifest"]["meta"]["n_base"] = n_base
        added_token["manifest"]["meta"]["n_tombstones"] = n_tombstones
        self.store.commit_staged(added_token)
        delta_ranked.unpersist(blocking=False)
        _trace("maintain (concurrent delta jobs + ordered added commit)")

        # 4. per-round summary + metrics table commit
        wall = time.monotonic() - t0
        tombstone_ratio = n_tombstones / n_base if n_base > 0 else 0.0
        summary = self._commit_metrics(
            round_no, per_part, n_frontier, n_disc_raw, n_disc_new, wall,
            log=log,
        )
        summary["tombstone_ratio"] = round(tombstone_ratio, 4)
        # 5. compaction (idempotent; outside the recovery-critical
        # path — a crash mid-compaction changes nothing the logical
        # view can observe). Primary trigger: accumulated tombstones
        # vs base size — read degradation tracks |removed|, not
        # wall-clock rounds. compact_every is a periodic override.
        do_compact = (
            cfg.compact_ratio > 0 and tombstone_ratio >= cfg.compact_ratio
        ) or (cfg.compact_every > 0 and round_no % cfg.compact_every == 0)
        if do_compact:
            self.compact_frontier(round_no)
            summary["compacted"] = True
            _trace(f"compact (tombstone_ratio={tombstone_ratio:.3f})")
        return summary

    def _delta_new(
        self,
        log: DataFrame,
        round_no: int,
        seen_prev: DataFrame | None = None,
        use_bloom: bool = False,
        prebuilt=None,
        delta_ranked: DataFrame | None = None,
    ) -> DataFrame:
        """The round's deduped, seen-filtered, not-just-decided
        discovery delta (lazy expression). ``delta_ranked`` lets the
        caller pass a pre-built (possibly persisted) raw delta already
        carrying the per-url dedup rank ``_rn``."""
        if seen_prev is None:
            seen_prev = self.store.read("seen", SEEN_SCHEMA).where(
                F.col("completed_round") < round_no
            )
        if delta_ranked is None:
            wdup = Window.partitionBy("url").orderBy(*_best_order())
            delta_ranked = self._delta_expr(log, round_no).withColumn(
                "_rn", F.row_number().over(wdup)
            )
        recorded_urls = log.where(~F.col("will_retry")).select("url")
        delta_best = delta_ranked.where(F.col("_rn") == 1).drop("_rn")
        return anti_join_seen(
            delta_best, seen_prev, use_bloom=use_bloom, prebuilt=prebuilt
        ).join(recorded_urls.hint("merge"), "url", "left_anti")

    def compact_frontier(self, round_no: int) -> None:
        """Materialize the logical frontier into a fresh base and
        truncate the delta tables — the amortized full write (Iceberg
        compaction analog). Idempotent at every crash point: merging an
        already-compacted base with stale tombstones/added rows is a
        no-op (anti-join misses, merge_best dedups)."""
        logical = self.logical_frontier(round_no + 1)
        self.store.overwrite(
            "frontier", logical, bucket=self._bucket, meta={"round": round_no}
        )
        empty = self.spark.createDataFrame([], FRONTIER_SCHEMA)
        self.store.overwrite(
            "frontier_added", empty, bucket=self._bucket,
            meta={"round": round_no},
        )
        empty_removed = self.spark.createDataFrame([], REMOVED_SCHEMA)
        self.store.overwrite(
            "frontier_removed", empty_removed, bucket=self._bucket
        )

    def _commit_sketch_registers(self, round_no: int, log: DataFrame) -> None:
        """HLL registers of this round's decided urls per fetch
        decision (cfg.sketch_telemetry). One small agg over the
        already-evaluated round log — ≤ 512 × decisions rows — then a
        driver-side pyarrow append tagged like the metrics row, so
        crash recovery rolls both back together."""
        from pixcrawler_spark.operators import sketches as sk
        from pixcrawler_spark.schemas import SKETCH_REGISTERS_SCHEMA

        regs = sk.hll_registers(
            log, ["fetch_decision"], F.col("url"), fast=True
        ).collect()
        rows = [
            (round_no, r["fetch_decision"], int(r["bucket"]), int(r["rho"]))
            for r in regs
        ]
        if rows:
            self.store.append_local(
                "sketch_registers",
                rows,
                SKETCH_REGISTERS_SCHEMA,
                tag=f"round-{round_no}",
            )

    def distinct_url_estimates(self) -> DataFrame:
        """Cumulative DISTINCT decided urls per fetch decision across
        all rounds, folded from the stored registers (max-merge) —
        never rescans results. Requires cfg.sketch_telemetry runs."""
        from pixcrawler_spark.operators import sketches as sk
        from pixcrawler_spark.schemas import SKETCH_REGISTERS_SCHEMA

        regs = self.store.read("sketch_registers", SKETCH_REGISTERS_SCHEMA)
        merged = regs.groupBy("fetch_decision", "bucket").agg(
            F.max("rho").alias("rho")
        )
        return sk.hll_estimate(merged, ["fetch_decision"])

    def compact_sketch_registers(self, upto_round: int) -> None:
        """Fold all register rows with round <= upto_round into one
        baseline row set stamped round=upto_round (max-merge is
        associative, so folded-then-merged estimates are IDENTICAL to
        unfolded — asserted in tests). Bounds the table at
        512 x decisions x (baseline + recent rounds) instead of
        growing per round forever; like the snapshot-expiration
        maintenance pass, run it only for rounds OLDER than the crash-
        recovery horizon (the current round's tagged rows must stay
        individually droppable)."""
        from pixcrawler_spark.schemas import SKETCH_REGISTERS_SCHEMA

        regs = self.store.read("sketch_registers", SKETCH_REGISTERS_SCHEMA)
        old = regs.where(F.col("round") <= upto_round)
        folded = old.groupBy("fetch_decision", "bucket").agg(
            F.max("rho").alias("rho")
        ).select(
            F.lit(upto_round).cast("int").alias("round"),
            "fetch_decision",
            "bucket",
            "rho",
        )
        keep = regs.where(F.col("round") > upto_round)
        self.store.overwrite(
            "sketch_registers", folded.unionByName(keep)
        )

    def _commit_metrics(
        self,
        round_no: int,
        per_part: list,
        n_frontier: int,
        n_disc_raw: int,
        n_disc_new: int,
        wall: float,
        log: DataFrame | None = None,
    ) -> dict:
        n_decided = sum(r["n_processed"] for r in per_part)
        n_denied = sum(r["n_robots_denied"] for r in per_part)
        n_fetched_total = sum(r["n_fetched"] for r in per_part)
        n_retrying = int(sum(r["n_retrying"] for r in per_part))
        n_processed = n_decided - n_retrying
        n_stalled = n_frontier - n_decided  # politeness deferrals
        # discovery dedup hit-rate: fraction of discovered rows dropped
        # as duplicate / already-seen / just-decided
        dedup_hit = (
            1.0 - (n_disc_new / n_disc_raw) if n_disc_raw > 0 else 0.0
        )
        from pixcrawler_spark.schemas import METRICS_SCHEMA

        metrics_rows = [
            (
                round_no,
                int(r["partition_id"]),
                int(n_frontier),
                0,  # seen-skips are impossible by the frontier invariant
                int(n_stalled),
                int(r["n_robots_denied"]),
                int(r["n_fetched"]),
                n_disc_raw,
                n_disc_new,
                float(dedup_hit),
                float(wall),
                float(r["n_processed"] / wall if wall > 0 else 0.0),
            )
            for r in per_part
        ] or [
            (
                round_no, -1, int(n_frontier), 0, int(n_stalled), 0, 0,
                n_disc_raw, n_disc_new, float(dedup_hit), float(wall), 0.0,
            )
        ]
        # tiny telemetry commit: pyarrow write on the driver, no Spark job
        self.store.append_local(
            "metrics", metrics_rows, METRICS_SCHEMA, tag=f"round-{round_no}"
        )
        if log is not None and self.config.sketch_telemetry:
            self._commit_sketch_registers(round_no, log)
        return {
            "round": round_no,
            "n_frontier": n_frontier,
            "n_seen_skipped": 0,
            "n_processed": int(n_processed),
            "n_decided": int(n_decided),
            "n_robots_denied": int(n_denied),
            "n_fetched": int(n_fetched_total),
            "n_retrying": n_retrying,
            "n_stalled": int(n_stalled),
            "n_discovered_raw": n_disc_raw,
            "n_discovered_new": n_disc_new,
            "dedup_hit_rate": round(dedup_hit, 4),
            "wall_seconds": round(wall, 3),
            # headline rate = DECIDED urls/sec (politeness-stalled rows
            # are untouched work, not throughput); the frontier-scan
            # rate is reported under its honest name
            "decided_per_sec": round(n_decided / wall, 1) if wall > 0 else 0.0,
            "frontier_scan_per_sec": (
                round(n_frontier / wall, 1) if wall > 0 else 0.0
            ),
        }

    # -- workflow control (reference: backend/services/job_orchestrator.py
    # :427-527 — pause/cancel/recover-from-step; here workflow = crawl,
    # step = round, state = a tiny atomic control blob) -----------------------
    CONTROL_BLOB = "crawl_control"
    MAX_RECOVERY_ATTEMPTS = 3

    def control(self) -> dict:
        blob = self.store.get_blob(self.CONTROL_BLOB)
        if blob is None:
            return {
                "status": "running",
                "recovery_attempts": 0,
                "max_recovery_attempts": self.MAX_RECOVERY_ATTEMPTS,
            }
        return blob[1]

    def _set_control(self, **updates) -> dict:
        c = dict(self.control(), **updates)
        self.store.put_blob(self.CONTROL_BLOB, b"", c)
        return c

    def pause(self) -> dict:
        """Stop the round loop at the next round boundary; state stays
        resumable (job_orchestrator.pause_workflow analog)."""
        return self._set_control(status="paused")

    def cancel(self) -> dict:
        """Permanently stop the crawl; run() refuses until a recover
        or resume_control (cancel_workflow analog)."""
        return self._set_control(status="cancelled")

    def resume_control(self) -> dict:
        return self._set_control(status="running")

    def recover_from_round(self, from_round: int) -> dict:
        """Roll the crawl back so rounds >= ``from_round`` re-run
        (recover_workflow's reset-tasks-from-step, re-expressed over
        the deterministic round state):

        - round->=from_round results/metrics snapshots dropped (tags);
        - seen rewritten to completed_round < from_round;
        - the frontier of round from_round-1 is RECONSTRUCTED: rows
          discovered by rolled-back rounds leave, and every url those
          rounds decided returns (state re-derived from the decision
          log via the determinism contract: engine = engines[depth %
          n], politeness re-stamped). Exact re-execution equivalence
          holds for max_retries=0 configs (tested); with a retry
          ladder, in-flight retry state that postdates from_round is
          re-derived from scratch (retry_count resets — the ladder
          restarts for those urls).

        Attempts are capped (can_recover gate, max_recovery_attempts).
        Commit order mirrors run_round: frontier flips LAST.
        """
        c = self.control()
        if c["recovery_attempts"] >= c["max_recovery_attempts"]:
            raise ValueError(
                f"workflow cannot be recovered (attempts: "
                f"{c['recovery_attempts']}/{c['max_recovery_attempts']})"
            )
        cur = self.current_round()
        # a crashed recovery may already have dropped round >= N
        # metrics; its re-run legitimately asks for from_round = cur+1
        max_from = cur + 1 if c.get("status") == "recovering" else cur
        if not 1 <= from_round <= max_from:
            raise ValueError(
                f"from_round must be in [1, {max_from}], got {from_round}"
            )

        cfg = self.config
        res = self.store.read("results")
        # restore ONLY urls whose discovery predates the rollback
        # point: urls discovered by rolled-back rounds re-enter the
        # frontier through the replayed rounds' own expansion joins
        # (restoring them here would let them compete for admission
        # earlier than they originally could)
        dropped = res.where(
            (F.col("round") >= from_round)
            & (F.col("discovered_round") <= from_round - 1)
        )
        engine = _engine_expr(F.col("depth"), cfg.engines)
        restore = dropped.select(
            "url",
            "domain",
            "depth",
            engine.alias("engine"),
            _score_expr(engine).alias("score"),
            F.lit(0).cast("int").alias("retry_count"),
            "discovered_round",
        ).dropDuplicates(["url"])
        # the as_of view ignores tombstones from rolled-back rounds, so
        # base rows they removed come back for free; rows discovered by
        # rolled-back rounds leave via the discovered_round filter
        frontier_keep = self.logical_frontier(from_round).where(
            F.col("discovered_round") <= from_round - 1
        )
        next_frontier = self._merge_best(
            frontier_keep, self._with_politeness(restore)
        )
        # recovery is itself re-runnable: guard with a control status
        # (run() refuses while "recovering"), commit the rebuilt base
        # FIRST (it contains everything, so every later step is
        # idempotent against it), then truncate the deltas and roll
        # back the round-scoped tables
        self._set_control(status="recovering")
        self.store.overwrite(
            "frontier", next_frontier, bucket=self._bucket,
            meta={"round": from_round - 1},
        )
        empty = self.spark.createDataFrame([], FRONTIER_SCHEMA)
        self.store.overwrite(
            "frontier_added", empty, bucket=self._bucket,
            meta={"round": from_round - 1},
        )
        empty_removed = self.spark.createDataFrame([], REMOVED_SCHEMA)
        self.store.overwrite(
            "frontier_removed", empty_removed, bucket=self._bucket
        )
        tags = {f"round-{r}" for r in range(from_round, cur + 1)}
        self.store.drop_tagged("results", tags)
        self.store.drop_tagged("metrics", tags)
        if self.store.exists("sketch_registers"):
            self.store.drop_tagged("sketch_registers", tags)
        clean_seen = self.store.read("seen", SEEN_SCHEMA).where(
            F.col("completed_round") < from_round
        )
        self.store.overwrite("seen", clean_seen, bucket=self._bucket)
        return self._set_control(
            status="running", recovery_attempts=c["recovery_attempts"] + 1
        )

    # -- full crawl ------------------------------------------------------------
    def run(self, resume: bool = False) -> list[dict]:
        """Run rounds until the frontier drains, max_rounds is hit, or
        the control blob says pause/cancel (checked at every round
        boundary). ``resume=True`` continues from the last committed
        round — the checkpoint-equivalence contract (FIXTURES.md §4)."""
        if not resume:
            for t in (
                "frontier", "frontier_added", "frontier_removed",
                "seen", "results", "metrics", "round_log",
            ):
                self.store.drop(t)
            self._set_control(status="running", recovery_attempts=0)
            self.store.overwrite(
                "frontier", self._seed_frontier(), bucket=self._bucket,
                meta={"round": 0},
            )
            start = 1
        else:
            start = self.current_round() + 1
        summaries = []
        for r in range(start, self.config.max_rounds + 1):
            if self.control()["status"] != "running":
                break
            if self.logical_frontier(r).limit(1).count() == 0:
                break
            summaries.append(self.run_round(r))
        return summaries

    # -- outputs ---------------------------------------------------------------
    def results_with_text(self) -> DataFrame:
        """Denormalized results view: decision log joined back to
        pages_ext for text/outlinks of fetched rows (the results table
        is a pure decision log; text stays normalized in pages_ext)."""
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
