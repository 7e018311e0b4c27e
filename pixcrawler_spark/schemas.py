"""Explicit StructType schemas for every engine table.

The reference declares all schemas (JSON Schema for configs at
builder/_config.py:31-94, SQLAlchemy DDL, Pydantic settings); nothing
is inferred. We follow the same rule: every table the engine reads or
writes has an explicit schema here — schema inference is never used.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Input table (BASELINE.json input_hint): Common-Crawl-style pages.
# ---------------------------------------------------------------------------
PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

# Per-domain politeness rules (robots.txt analog; synthesized fixture —
# the reference never consults robots, SURVEY.md §2.9).
ROBOTS_SCHEMA = StructType(
    [
        StructField("domain", StringType(), False),
        StructField("disallow_prefixes", ArrayType(StringType()), True),
        StructField("crawl_delay_s", DoubleType(), False),
        StructField("max_per_round", IntegerType(), False),
    ]
)

# The frontier: the central work table (reference analog: the
# (category, keyword, engine, variation, offset, retry) work tuple,
# backend/services/crawl_job.py:482-513). Politeness columns
# (robots_denied, crawl_delay_s, max_per_round) are DENORMALIZED into
# the frontier at enqueue time: at 10^10-URL scale the robots table is
# ~10^8 rows — joinable against the per-round discovery delta, but a
# per-round join against the whole frontier would either broadcast an
# unbroadcastable build side or re-shuffle the frontier. Real crawler
# frontiers (Mercator/Heritrix queues) carry their politeness key the
# same way; a robots refresh is a periodic frontier migration job.
FRONTIER_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("domain", StringType(), False),
        StructField("depth", IntegerType(), False),
        StructField("engine", StringType(), False),
        StructField("score", DoubleType(), False),
        StructField("retry_count", IntegerType(), False),
        StructField("discovered_round", IntegerType(), False),
        StructField("robots_denied", BooleanType(), False),
        StructField("crawl_delay_s", DoubleType(), False),
        StructField("max_per_round", IntegerType(), False),
    ]
)

# Fetch results appended per round (reference analog: Image ORM row,
# backend/database/models.py:425-540), lineage-stamped per north rule.
# Pure DECISION LOG: text/outlinks stay normalized in pages_ext and are
# joined on demand (CrawlEngine.results_with_text) — storing them here
# would double the corpus and drag wide columns through every round's
# fetch join.
RESULTS_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("domain", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("fetch_decision", StringType(), False),
        StructField("depth", IntegerType(), False),
        # discovery lineage: the round that first enqueued this url —
        # recover_from_round uses it to rebuild the frontier exactly
        # (urls discovered by rolled-back rounds are re-discovered on
        # replay, not restored)
        StructField("discovered_round", IntegerType(), False),
        StructField("round", IntegerType(), False),
        StructField("partition_id", IntegerType(), False),
    ]
)

# The extracted-pages table (WARC→columnar prep; one-time Arrow UDF pass).
PAGES_EXT_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("text", StringType(), True),
        StructField("outlinks", ArrayType(StringType()), True),
        StructField("html_absent", BooleanType(), False),
    ]
)

# Frontier tombstones (merge-on-read frontier: urls decided since the
# last compaction; anti-joined against the immutable base at read
# time — the Iceberg delete-file analog).
REMOVED_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("round", IntegerType(), False),
    ]
)

# URL-seen checkpoint (reference analog: ProgressCache JSON,
# builder/progress.py:37-154).
SEEN_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("completed_round", IntegerType(), False),
    ]
)

# Per-round / per-partition metrics (north rule: URLs/sec, dedup
# hit-rate, politeness stalls; reference analog: EngineStats,
# builder/_engine.py:83-110).
METRICS_SCHEMA = StructType(
    [
        StructField("round", IntegerType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("n_candidates", LongType(), False),
        StructField("n_seen_skipped", LongType(), False),
        StructField("n_politeness_stalled", LongType(), False),
        StructField("n_robots_denied", LongType(), False),
        StructField("n_fetched", LongType(), False),
        # discovery dedup telemetry (north rule "dedup hit-rate"):
        # raw discovered outlinks+retries vs rows that actually entered
        # the frontier after dedup + seen-filter (per round; collected
        # via Observation during the merge job — no extra Spark job)
        StructField("n_discovered_raw", LongType(), False),
        StructField("n_discovered_new", LongType(), False),
        StructField("dedup_hit_rate", DoubleType(), False),
        StructField("wall_seconds", DoubleType(), False),
        StructField("urls_per_sec", DoubleType(), False),
    ]
)

# Crawl-config "query" (reference CONFIG_SCHEMA, builder/_config.py:31-94).
CONFIG_CATEGORIES_SCHEMA = StructType(
    [
        StructField("category", StringType(), False),
        StructField("keywords", ArrayType(StringType()), True),
    ]
)

# Documents / embeddings (training-data pipeline tables in testdata).
DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)

EMBEDDINGS_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(DoubleType()), True),
        StructField("label", IntegerType(), True),
    ]
)

# Multimodal media table (binary payload + typed metadata; decode is
# stubbed in-sandbox — see operators/multimodal.py).
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("meta", MapType(StringType(), StringType()), True),
        StructField("is_valid", BooleanType(), True),
    ]
)


# Per-round HyperLogLog registers of decided urls, grouped by fetch
# decision (plans/crawl.py sketch telemetry, cfg.sketch_telemetry).
# Registers are STORED rather than estimates so rounds merge by
# max(rho) at read time — cumulative distinct counts across any round
# range without rescanning results.
SKETCH_REGISTERS_SCHEMA = StructType(
    [
        StructField("round", IntegerType(), False),
        StructField("fetch_decision", StringType(), False),
        StructField("bucket", LongType(), False),
        StructField("rho", IntegerType(), False),
    ]
)
