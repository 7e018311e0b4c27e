"""Structured Streaming surface: incremental page ingest + live metrics.

The reference's "real-time" layer is SSE polling callbacks
(backend/services/crawl_job.py:997-1154) — not a real stream. The
engine's batch round loop stays the core (SURVEY §2.9), but a
continuously-arriving page corpus (WARC drops landing in object
storage) is a genuine streaming source at 100 TB, so we expose:

- ``stream_pages``: file-source readStream over the pages layout with
  the explicit PAGES_SCHEMA (new parquet files = new micro-batch; on a
  cluster this is the S3/HDFS drop folder);
- ``frontier_candidates_stream``: per-batch projection of new urls
  into frontier-shaped rows (the incremental seed feed);
- ``windowed_lang_metrics``: event-time windowed counts with a
  watermark on warc_ts — late pages beyond the watermark are dropped
  exactly like late task results in the reference's completion dedup
  (crawl_job.py:615-646);
- ``run_available_now``: drains everything currently in the source and
  stops — deterministic for tests, and the idiomatic backfill trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pixcrawler_spark.operators.politeness import domain_expr
from pixcrawler_spark.schemas import PAGES_SCHEMA


def stream_pages(spark: SparkSession, pages_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(pages_dir)
    )


def frontier_candidates_stream(pages: DataFrame) -> DataFrame:
    """New pages → frontier candidate rows (depth 0, engine google)."""
    return pages.select(
        "url",
        domain_expr("url").alias("domain"),
        F.lit(0).cast("int").alias("depth"),
        F.lit("google").alias("engine"),
        F.lit(1.0).alias("score"),
        F.lit(0).cast("int").alias("retry_count"),
        F.lit(0).cast("int").alias("discovered_round"),
    )


def windowed_lang_metrics(
    pages: DataFrame, watermark: str = "1 hour", window: str = "1 day"
) -> DataFrame:
    """Event-time windowed page counts per lang with late-data bound."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.when(F.col("html").isNull(), 1).otherwise(0)).alias("n_null_html"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
            "n_null_html",
        )
    )


def windowed_hll_registers(
    pages: DataFrame, watermark: str = "1 hour", window: str = "1 day"
) -> DataFrame:
    """Streaming distinct-url telemetry WITHOUT exact-distinct state.

    Maintains per-window HyperLogLog registers (operators/sketches.py)
    as a single watermarked stateful aggregation: state per window is
    at most m=512 (bucket, max-rho) rows no matter how many urls the
    window saw — vs ``dropDuplicates`` whose state grows with every
    distinct url. The estimate itself is folded at READ time
    (``sketches.hll_estimate`` over the sink, grouped by window),
    keeping the stream to one aggregation as Structured Streaming
    requires, and because registers are max-merged the streaming
    result is IDENTICAL to the batch registers over the same data
    (asserted in tests/test_streaming.py).
    """
    from pixcrawler_spark.operators import sketches as sk

    return (
        pages.withWatermark("warc_ts", watermark)
        .select(
            F.window("warc_ts", window).alias("w"),
            sk.hll_bucket(F.col("url")).alias("bucket"),
            sk.hll_rho(F.col("url")).alias("rho"),
        )
        .groupBy("w", "bucket")
        .agg(F.max("rho").alias("rho"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "bucket",
            "rho",
        )
    )


def windowed_cms_counters(
    pages: DataFrame, watermark: str = "1 hour", window: str = "1 day"
) -> DataFrame:
    """Streaming heavy-hitter state: per-window count-min counters over
    the politeness domain key. Like the HLL registers above, this is
    ONE watermarked stateful aggregation with bounded state — at most
    d×w (= 256) counter rows per window regardless of url volume — and
    SUM-merged counters are identical to the batch build over the same
    data (parity asserted in tests/test_streaming.py). Feeds the
    skew-salting decision continuously instead of per-batch."""
    from pixcrawler_spark.operators import sketches as sk

    key = domain_expr("url")
    rows = F.explode(
        F.array(
            *[
                F.struct(F.lit(j).alias("j"), sk.cms_bucket(key, j))
                for j in range(sk.CMS_DEPTH)
            ]
        )
    ).alias("e")
    return (
        pages.withWatermark("warc_ts", watermark)
        .select(F.window("warc_ts", window).alias("w"), rows)
        .select("w", F.col("e.j").alias("j"), F.col("e.bucket").alias("bucket"))
        .groupBy("w", "j", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "j",
            "bucket",
            "cnt",
        )
    )


def windowed_value_histogram(
    pages: DataFrame,
    value: "F.Column",
    key: "F.Column",
    watermark: str = "1 hour",
    window: str = "1 day",
) -> DataFrame:
    """Streaming quantile telemetry: per-window fixed-bin value
    histograms per key (operators/sketches.py hist_* — the same
    binning the batch sketch_histogram_quantiles query uses).

    Like the HLL/CMS register streams above, this is ONE watermarked
    stateful aggregation with bounded state — at most HIST_BINS (=256)
    counter rows per (window, key) regardless of volume — and
    SUM-merged bins are identical to the batch build over the same
    data (parity asserted in tests/test_streaming.py). This is the
    continuous feed for the latency-adaptive politeness delay
    (queries/frontiersched.crawl_adaptive_delay): quantiles fold at
    READ time via ``sketches.hist_quantiles`` over the sink, and two
    windows' histograms ADD where exact percentiles cannot merge."""
    from pixcrawler_spark.operators import sketches as sk

    return (
        pages.withWatermark("warc_ts", watermark)
        .select(
            F.window("warc_ts", window).alias("w"),
            key.alias("key"),
            sk.hist_bin(value).alias("bin"),
        )
        .groupBy("w", "key", "bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "key",
            "bin",
            "c",
        )
    )


def sessionized_domain_metrics(
    pages: DataFrame, watermark: str = "1 hour", gap: str = "30 minutes"
) -> DataFrame:
    """Per-domain SESSION windows over page arrivals: a session is a
    burst of fetches from one domain separated by less than ``gap``
    (crawl bursts, recrawl sweeps, hotlink storms) — the dynamic-width
    counterpart to the fixed tumbling windows above.

    Structured Streaming's ``session_window`` merges per-key state as
    events arrive (start = first event, end = last event + gap) and
    the watermark bounds that state, so sessions close and emit
    exactly once per key; state size is O(open sessions), never
    O(events). The batch parity test recomputes sessions with a
    DIFFERENT algorithm (lag + gap-split + cumulative session ids),
    so agreement certifies the semantics, not a shared code path.
    """
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(
            F.session_window("warc_ts", gap).alias("w"),
            domain_expr("url").alias("domain"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.min("warc_ts").alias("first_ts"),
            F.max("warc_ts").alias("last_ts"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "domain",
            "n_pages",
            "first_ts",
            "last_ts",
        )
    )


def stream_unseen_urls(pages: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming URL-seen set: stateful ``dropDuplicates`` on url with
    a watermark bound on state (the streaming analog of the batch
    engine's seen anti-join — a url seen in any earlier micro-batch
    within the watermark horizon is suppressed)."""
    return pages.withWatermark("warc_ts", watermark).dropDuplicates(["url"])


# ---------------------------------------------------------------------------
# Custom stateful operator: per-domain politeness token bucket
# ---------------------------------------------------------------------------
# State per domain: tokens admitted so far. Each micro-batch admits at
# most (capacity - used) candidate urls per domain, ordered by
# (depth, url) — the streaming realization of the batch engine's
# window-ranked admission (operators/politeness.py), with state that
# persists ACROSS batches via applyInPandasWithState. Timed-out state
# resets the bucket (a crawl-delay refill).

TOKEN_BUCKET_OUTPUT_SCHEMA = (
    "domain string, url string, depth int, admitted boolean"
)
TOKEN_BUCKET_STATE_SCHEMA = "used int"


def _token_bucket_fn(capacity: int):
    import pandas as pd  # local import: executors only

    def fn(key, pdf_iter, state):
        (domain,) = key
        used = state.get[0] if state.exists else 0
        # Accumulate the group's chunks BEFORE sorting: Arrow may split
        # one domain's micro-batch rows across several chunks, and
        # chunk-local sorting would admit by arrival order instead of
        # priority. Per-domain rows are politeness-bounded (≤ a few
        # hundred candidates reach one domain's bucket per batch), so
        # the concat is small by construction.
        chunks = [pdf for pdf in pdf_iter]
        pdf = pd.concat(chunks) if chunks else pd.DataFrame(
            columns=["domain", "url", "depth"]
        )
        # same priority order as the batch engine's admit() window:
        # depth asc, score desc (when present), url asc
        if "score" in pdf.columns:
            pdf = pdf.sort_values(
                ["depth", "score", "url"], ascending=[True, False, True]
            )
        else:
            pdf = pdf.sort_values(["depth", "url"])
        out = []
        for _, row in pdf.iterrows():
            admit = used < capacity
            if admit:
                used += 1
            out.append((domain, row["url"], int(row["depth"]), admit))
        state.update((used,))
        yield pd.DataFrame(
            out, columns=["domain", "url", "depth", "admitted"]
        )

    return fn


def politeness_bucket_stream(
    candidates: DataFrame, capacity: int = 10
) -> DataFrame:
    """Streaming per-domain token-bucket admission: at most ``capacity``
    urls admitted per domain across the stream's lifetime.
    candidates: (url, domain, depth). A production bucket refills via
    an event-time timeout (EventTimeTimeout + watermark) — kept
    timeout-free here so bounded drains (availableNow) terminate
    without spinning state-cleanup batches."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return candidates.groupBy("domain").applyInPandasWithState(
        _token_bucket_fn(capacity),
        outputStructType=TOKEN_BUCKET_OUTPUT_SCHEMA,
        stateStructType=TOKEN_BUCKET_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now(
    df: DataFrame, out_dir: str, checkpoint_dir: str, output_mode: str = "append"
) -> None:
    """Drain the source with the available-now trigger and block until
    done (bounded, deterministic — the backfill/test path)."""
    q = (
        df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# ---------------------------------------------------------------------------
# Custom stateful operator: per-host EWMA latency (streaming twin of
# queries/roundeleven.py crawl_hostload_ewma)
# ---------------------------------------------------------------------------
# State per host: (ewma, n). Each micro-batch folds its observations in
# (ts, event_id) order through the textbook recursion
# ewma <- a*x + (1-a)*ewma, which the batch query computes closed-form
# — tests/test_streaming_ewma.py asserts the two agree after a
# multi-restart drain (state survives checkpoint recovery). Bounded
# state: 2 scalars per host, no timeline retention — the O(1)-state
# monitor shape every per-key streaming aggregate here follows.

EWMA_OUTPUT_SCHEMA = "domain string, n_obs long, ewma_ms double"
EWMA_STATE_SCHEMA = "ewma double, n long"


def _ewma_fn(alpha: float):
    import pandas as pd  # local import: executors only

    def fn(key, pdf_iter, state):
        (domain,) = key
        if state.exists:
            ewma, n = state.get
        else:
            ewma, n = 0.0, 0
        chunks = [pdf for pdf in pdf_iter]
        pdf = pd.concat(chunks) if chunks else pd.DataFrame(
            columns=["domain", "latency_ms", "ts", "event_id"]
        )
        # fold in event order — Arrow chunking must not reorder the
        # recursion (same concat-before-sort rule as the token bucket)
        pdf = pdf.sort_values(["ts", "event_id"])
        for x in pdf["latency_ms"]:
            ewma = float(x) if n == 0 else alpha * float(x) + (1 - alpha) * ewma
            n += 1
        state.update((float(ewma), int(n)))
        yield pd.DataFrame(
            [(domain, n, ewma)], columns=["domain", "n_obs", "ewma_ms"]
        )

    return fn


def hostload_ewma_stream(
    observations: DataFrame, alpha: float = 0.5
) -> DataFrame:
    """Streaming per-host EWMA latency: one (domain, n_obs, ewma_ms)
    row emitted per host per micro-batch; the last row per host is the
    live forecast. observations: (domain, latency_ms, ts, event_id).
    No timeout: latency state is 2 scalars per host and a stale host's
    forecast should persist until new observations arrive."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return observations.groupBy("domain").applyInPandasWithState(
        _ewma_fn(alpha),
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Custom stateful operator: per-host CUSUM degradation monitor
# ---------------------------------------------------------------------------
# The batch query (stats_cusum_changepoint) estimates (mu, sigma) from
# the series itself — a two-pass design. The streaming monitor is the
# TRUE sequential form: (target, slack, threshold) are fixed control
# parameters (from a calibration window or the batch query's output),
# and state is one scalar per host. tests/test_streaming_ewma.py
# asserts parity with the textbook recursion across micro-batches.

CUSUM_OUTPUT_SCHEMA = (
    "domain string, n_obs long, s double, alarmed boolean"
)
CUSUM_STATE_SCHEMA = "s double, n long"


def _cusum_fn(target: float, slack: float, threshold: float):
    import pandas as pd  # local import: executors only

    def fn(key, pdf_iter, state):
        (domain,) = key
        if state.exists:
            s, n = state.get
        else:
            s, n = 0.0, 0
        chunks = [pdf for pdf in pdf_iter]
        pdf = pd.concat(chunks) if chunks else pd.DataFrame(
            columns=["domain", "latency_ms", "ts", "event_id"]
        )
        pdf = pdf.sort_values(["ts", "event_id"])
        alarmed = False
        for x in pdf["latency_ms"]:
            s = max(0.0, s + float(x) - target - slack)
            alarmed = alarmed or s > threshold
            n += 1
        state.update((float(s), int(n)))
        yield pd.DataFrame(
            [(domain, n, s, alarmed)],
            columns=["domain", "n_obs", "s", "alarmed"],
        )

    return fn


def hostload_cusum_stream(
    observations: DataFrame,
    target: float,
    slack: float,
    threshold: float,
) -> DataFrame:
    """Streaming per-host CUSUM: S <- max(0, S + x - target - slack),
    alarm when S crosses ``threshold`` within a batch. One scalar of
    state per host; (target, slack, threshold) are fixed control
    parameters — calibrate them from the batch
    ``stats_cusum_changepoint`` output or a warm-up window.
    observations: (domain, latency_ms, ts, event_id)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return observations.groupBy("domain").applyInPandasWithState(
        _cusum_fn(target, slack, threshold),
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Custom stateful operator: per-host PID budget controller
# ---------------------------------------------------------------------------
# Completes the streaming scheduler trio: EWMA (filter) -> CUSUM
# (detect) -> PID (control). State per host: (integral, prev_error) —
# the O(1) state the batch operator (operators/control.py) documents
# for incremental deployment. Emits the post-batch budget per host.

PID_OUTPUT_SCHEMA = (
    "domain string, n_obs long, error double, integral double, "
    "budget int"
)
PID_STATE_SCHEMA = "integral double, prev_e double, n long"


def _pid_fn(target, base, kp, ki, kd, lo, hi):
    import pandas as pd  # local import: executors only

    def fn(key, pdf_iter, state):
        (domain,) = key
        if state.exists:
            integral, prev_e, n = state.get
        else:
            integral, prev_e, n = 0.0, None, 0
        chunks = [pdf for pdf in pdf_iter]
        pdf = pd.concat(chunks) if chunks else pd.DataFrame(
            columns=["domain", "latency_ms", "ts", "event_id"]
        )
        pdf = pdf.sort_values(["ts", "event_id"])
        e, budget = prev_e if prev_e is not None else 0.0, int(base)
        for x in pdf["latency_ms"]:
            e = target - float(x)
            integral += e
            d = 0.0 if prev_e is None else e - prev_e
            prev_e = e
            raw = base + kp * e + ki * integral + kd * d
            budget = int(min(hi, max(lo, raw)) // 1)
            n += 1
        state.update(
            (float(integral), float(prev_e if prev_e is not None else 0.0),
             int(n))
        )
        yield pd.DataFrame(
            [(domain, n, e, integral, budget)],
            columns=["domain", "n_obs", "error", "integral", "budget"],
        )

    return fn


def hostload_pid_stream(
    observations: DataFrame,
    target: float = 200.0,
    base: float = 10.0,
    kp: float = 0.02,
    ki: float = 0.005,
    kd: float = 0.01,
    lo: float = 1.0,
    hi: float = 100.0,
) -> DataFrame:
    """Streaming per-host PID: the last emitted budget per host is the
    next round's fetch allowance. observations: (domain, latency_ms,
    ts, event_id)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return observations.groupBy("domain").applyInPandasWithState(
        _pid_fn(target, base, kp, ki, kd, lo, hi),
        outputStructType=PID_OUTPUT_SCHEMA,
        stateStructType=PID_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
