"""Cardinality / frequency sketches as pure Catalyst expression plans.

Telemetry a 10^10-url frontier needs every round but must never pay an
exact-distinct shuffle for:

- **HyperLogLog** (Flajolet et al. 2007): per-group distinct-url counts
  in 512 fixed registers. The register update (``max`` per bucket) is
  associative + commutative, so Spark computes it map-side as a partial
  aggregate: the shuffle moves at most ``groups x 512`` tiny rows no
  matter how many urls were scanned. Replaces ``COUNT(DISTINCT url)``
  telemetry (dedup hit-rate, per-partition seen growth) that would
  otherwise shuffle every url.
- **Count-min sketch** (Cormode & Muthukrishnan 2005): heavy-hitter
  detection over the politeness/salting key. ``d x w`` counters built
  by a map-side SUM partial agg; the estimate (min over d rows) is read
  per *candidate* key, not per row. This is the cheap feed for the
  skew-salting decision in plans/crawl.py (which keys need salting).
- **K-minimum-values** (Bar-Yossef et al. 2002): bottom-k signatures
  for union / intersection cardinality across crawl rounds ("how many
  NEW urls did round N contribute") without materializing either set.
  Bottom-k via ``ORDER BY hash LIMIT k`` = Spark TakeOrdered: each
  partition keeps only its local k, the driver merges k rows.

Everything is deterministic in INTEGER space (the float divisions at
the end are single operations on exact integers), so the DuckDB
oracles in queries/roundfive.py reproduce estimates bit-for-bit — a
sketch family whose *estimates* have an exact cross-engine oracle.

Portable 60-bit hash, identical in both engines (same trick as the
MinHash family, operators/dedup.py): the first 15 hex chars of md5
parsed as an integer. 60 bits keeps every intermediate inside a signed
BIGINT (shifted register sums reach 2^60 < 2^63).

Reference analog: the reference tracks dedup hit-rates and per-keyword
progress by exact Python set sizes (validator/integrity.py,
progress.py) — viable at 10^4 images, not at 10^10 urls.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# portable 60-bit hash
# --------------------------------------------------------------------------

HASH_BITS = 60


def h60(col: Column | str) -> Column:
    """First 60 bits of md5 as a non-negative BIGINT (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def sql_h60(expr: str) -> str:
    """DuckDB equivalent of :func:`h60` over a SQL expression."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def h60_fast(col: Column | str) -> Column:
    """60-bit hash via xxhash64 — the PRODUCTION path.

    The md5-string :func:`h60` exists for cross-engine oracle parity;
    per-row it costs a binary cast + md5 + hex substring + string->int
    conv. xxhash64 is a JVM intrinsic over the raw value (no string
    round-trip) — measured 6.5x faster on the register build at 6M
    rows (PLANS.md "HLL"). Masking to 60 bits keeps every downstream
    shift/sum bound identical to the portable path.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(c).bitwiseAND(F.lit((1 << HASH_BITS) - 1))


# --------------------------------------------------------------------------
# HyperLogLog
# --------------------------------------------------------------------------
# p=9 -> m=512 registers, standard error 1.04/sqrt(512) ~= 4.6%.
HLL_P = 9
HLL_M = 1 << HLL_P
HLL_REM_BITS = HASH_BITS - HLL_P  # 51
HLL_REM_MOD = 1 << HLL_REM_BITS
HLL_RHO_MAX = HLL_REM_BITS + 1  # rem == 0 -> rho = 52
# alpha_m for m >= 128 (Flajolet et al. 2007, fig. 3). Embedded as the
# same literal in the oracle so both engines use the identical double.
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def hll_bucket(key: Column, fast: bool = False) -> Column:
    """Register index: top p bits of the hash, via integer shift —
    float division would lose precision above 2^53 on a 60-bit hash."""
    hv = h60_fast(key) if fast else h60(key)
    return F.shiftright(hv, HLL_REM_BITS)


def hll_rho(key: Column, fast: bool = False) -> Column:
    """Leading-zero run length + 1 of the 51-bit remainder.
    rho = 52 - bitlength(rem); bin() gives the minimal binary string."""
    hv = h60_fast(key) if fast else h60(key)
    rem = hv % F.lit(HLL_REM_MOD)
    return F.when(rem == 0, F.lit(HLL_RHO_MAX)).otherwise(
        F.lit(HLL_RHO_MAX) - F.length(F.bin(rem))
    )


def hll_registers(
    df: DataFrame, group_cols: list[str], key: Column, fast: bool = False
) -> DataFrame:
    """Per-group HLL registers: (group, bucket, rho=max leading-run).

    ``max(rho)`` is the whole state update — associative, so Catalyst
    plans it as partial_max (map-side) + final_max: the only shuffled
    rows are the <= m register rows per group. The same shape works as
    a Structured Streaming stateful aggregation (ONE agg, bounded
    state) — see streaming/ingest.py windowed_hll_registers.
    """
    return (
        df.select(
            *group_cols,
            hll_bucket(key, fast=fast).alias("bucket"),
            hll_rho(key, fast=fast).alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Fold registers into the HLL estimate, in exact integer space.

    Z = sum(2^-rho) is computed as an integer sum of 2^(52-rho)
    (each term <= 2^51, <= 512 terms -> fits BIGINT exactly), plus
    2^52 per absent register — so the float division at the end is a
    single operation on exact integers and the oracle matches exactly,
    with no float-summation-order dependence.
    """
    scale = F.lit(1 << HLL_RHO_MAX)  # 2^52
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("present"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RHO_MAX} - rho)"))
        .cast("bigint")
        .alias("zsum_scaled"),
    )
    zeros = F.lit(HLL_M) - F.col("present")
    z_total = F.col("zsum_scaled") + zeros.cast("bigint") * (1 << HLL_RHO_MAX)
    e_raw = (
        F.lit(HLL_ALPHA)
        * F.lit(float(HLL_M))
        * F.lit(float(HLL_M))
        * scale.cast("double")
        / z_total.cast("double")
    )
    # linear-counting correction for the small range
    e = F.when(
        (e_raw <= F.lit(2.5 * HLL_M)) & (zeros > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros.cast("double")),
    ).otherwise(e_raw)
    return agg.select(*group_cols, F.round(e, 2).alias("hll_distinct"))


def sql_hll(table_expr: str, group_cols: list[str], key_expr: str) -> str:
    """DuckDB oracle mirroring hll_registers + hll_estimate exactly."""
    g = ", ".join(group_cols)
    return f"""
    WITH hv AS (
      SELECT {g}, {sql_h60(key_expr)} AS hv FROM {table_expr}
    ),
    br AS (
      SELECT {g}, hv // {HLL_REM_MOD} AS bucket,
             CASE WHEN hv % {HLL_REM_MOD} = 0 THEN {HLL_RHO_MAX}
                  ELSE {HLL_RHO_MAX} - length(bin(hv % {HLL_REM_MOD}))
             END AS rho
      FROM hv
    ),
    reg AS (
      SELECT {g}, bucket, MAX(rho) AS rho FROM br GROUP BY {g}, bucket
    ),
    agg AS (
      SELECT {g}, COUNT(*) AS present,
             SUM((1::BIGINT << ({HLL_RHO_MAX} - rho)))::BIGINT AS zsum_scaled
      FROM reg GROUP BY {g}
    ),
    -- literals cast to DOUBLE explicitly: DuckDB parses plain decimal
    -- literals as DECIMAL, whose multiplication overflows at 2^52
    folded AS (
      SELECT {g}, present,
             CAST({HLL_ALPHA!r} AS DOUBLE) * {HLL_M} * {HLL_M}
               * CAST({float(1 << HLL_RHO_MAX)!r} AS DOUBLE)
               / (zsum_scaled + ({HLL_M} - present)::BIGINT
                  * {1 << HLL_RHO_MAX})::DOUBLE AS e_raw
      FROM agg
    )
    SELECT {g},
           ROUND(
             CASE WHEN e_raw <= {2.5 * HLL_M!r}::DOUBLE
                       AND ({HLL_M} - present) > 0
                  THEN {HLL_M}::DOUBLE
                       * ln({HLL_M}::DOUBLE / ({HLL_M} - present)::DOUBLE)
                  ELSE e_raw
             END, 2) AS hll_distinct
    FROM folded
    """


# --------------------------------------------------------------------------
# Count-min sketch
# --------------------------------------------------------------------------
CMS_DEPTH = 4
CMS_WIDTH = 64  # deliberately narrow vs 150 keys so collisions (and the
                # overestimate-only guarantee) are actually exercised


def cms_bucket(key: Column, j: int) -> Column:
    """Row j's bucket for ``key`` — salted portable hash mod width."""
    salted = F.concat(F.lit(f"cms{j}:"), key)
    return (h60(salted) % F.lit(CMS_WIDTH)).alias("bucket")


def sql_cms_bucket(key_expr: str, j: str | int) -> str:
    salted = f"'cms{{}}:' || {key_expr}".format(j) if isinstance(j, int) else (
        f"'cms' || {j} || ':' || {key_expr}"
    )
    return f"{sql_h60(salted)} % {CMS_WIDTH}"


def cms_counters(df: DataFrame, key: Column) -> DataFrame:
    """The d x w counter table: one SUM-combinable groupBy.

    Each input row contributes to d=(4) buckets via an exploded
    array-of-structs (no shuffle growth: partial SUM collapses each
    partition to <= d*w rows before the exchange).
    """
    rows = F.explode(
        F.array(
            *[
                F.struct(F.lit(j).alias("j"), cms_bucket(key, j))
                for j in range(CMS_DEPTH)
            ]
        )
    ).alias("e")
    return (
        df.select(rows)
        .select(F.col("e.j").alias("j"), F.col("e.bucket").alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cms_estimate(counters: DataFrame, keys: DataFrame, key_col: str) -> DataFrame:
    """min-over-rows estimate per candidate key.

    ``keys`` is the (small) candidate set — heavy-hitter candidates,
    not the raw stream — so the probe join is candidates x d rows
    against the d x w counter dim (broadcastable: <= 256 rows).
    """
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("j"), cms_bucket(F.col(key_col), j))
                    for j in range(CMS_DEPTH)
                ]
            )
        ).alias("e"),
    ).select(key_col, F.col("e.j").alias("j"), F.col("e.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(counters), ["j", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


# --------------------------------------------------------------------------
# K-minimum-values (bottom-k) cardinality
# --------------------------------------------------------------------------
KMV_K = 256


def kmv_bottomk(df: DataFrame, key: Column) -> DataFrame:
    """Bottom-k distinct hashes of ``key`` -> k-row frame (hv column).

    ORDER BY + LIMIT k is Spark's TakeOrderedAndProject: per-partition
    top-k then a k-row driver merge — never a full sort, never a
    full shuffle. Distinct first so duplicate keys can't crowd the k.
    """
    return (
        df.select(h60(key).alias("hv")).distinct().orderBy("hv").limit(KMV_K)
    )


def kmv_estimate_col(kth_hv: Column) -> Column:
    """(k-1) / u_k with u_k = hv_k / 2^60 — one float div on exact ints."""
    return (
        F.lit(float(KMV_K - 1))
        * F.lit(float(1 << HASH_BITS))
        / kth_hv.cast("double")
    )


# --------------------------------------------------------------------------
# Mergeable fixed-bin histogram (quantile telemetry)
# --------------------------------------------------------------------------
# The same partial-agg shape as CMS: per-group bin counts SUM-combine
# across partitions, rounds, and streaming windows, where exact
# percentiles cannot merge. Quantiles read as the upper edge of the
# first bin whose cumulative count crosses the rank — error bounded by
# one bin width. Extracted from queries/roundfive.py's
# sketch_histogram_quantiles so the streaming windowed build
# (streaming/ingest.windowed_value_histogram) shares the exact binning.
HIST_BINS = 256
HIST_MAX = 512.0
HIST_W = HIST_MAX / HIST_BINS


def hist_bin(value: Column, bins: int = HIST_BINS, vmax: float = HIST_MAX) -> Column:
    """Clamped fixed-width bin index for ``value`` (>= 0)."""
    w = vmax / bins
    return F.least(F.floor(value / F.lit(w)).cast("bigint"), F.lit(bins - 1))


def hist_counts(
    df: DataFrame,
    group_cols: list[str],
    value: Column,
    bins: int = HIST_BINS,
    vmax: float = HIST_MAX,
) -> DataFrame:
    """Per-group bin-count registers: ONE SUM-combinable groupBy whose
    exchange carries <= groups x bins rows regardless of input size."""
    return (
        df.select(*group_cols, hist_bin(value, bins, vmax).alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


def hist_quantiles(
    registers: DataFrame,
    group_cols: list[str],
    ps: tuple[float, ...] = (0.50, 0.95, 0.99),
    bins: int = HIST_BINS,
    vmax: float = HIST_MAX,
) -> DataFrame:
    """Fold registers (group_cols, bin, c) to per-group quantile
    estimates — runs over the tiny register frame only (the window
    partitions <= groups x bins rows), never the raw stream."""
    from pyspark.sql import Window

    w = vmax / bins
    wt = Window.partitionBy(*group_cols)
    wc = wt.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = registers.select(
        *group_cols,
        "bin",
        F.sum("c").over(wc).alias("cc"),
        F.sum("c").over(wt).alias("n"),
    )

    def q(p: float) -> Column:
        return F.round(
            F.min(
                F.when(
                    F.col("cc") >= F.lit(p) * F.col("n"),
                    (F.col("bin") + 1) * F.lit(w),
                )
            ),
            4,
        )

    return cum.groupBy(*group_cols).agg(
        F.max("n").cast("bigint").alias("n"),
        *[
            q(p).alias(f"p{int(round(p * 100))}_est")
            for p in ps
        ],
    )
