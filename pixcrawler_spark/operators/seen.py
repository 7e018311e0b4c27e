"""URL-seen set: exact anti-join with a partitioned-bloom pre-filter.

The core frontier operation (reference: progress-cache skip,
builder/progress.py:84-96). Two paths, equivalent by construction:

- **exact**: ``candidates LEFT ANTI JOIN seen ON url`` — the
  correctness oracle. One shuffle on url (hash-uniform, no skew).
- **bloom-accelerated**: bit positions are computed JVM-side
  (``xxhash64(url, seed_i) mod m`` — whole-stage codegen), partition
  blooms are built in an Arrow-batched pandas UDF, OR-merged on the
  driver, and broadcast. Probing is a vectorized numpy bitset lookup.
  Candidates the bloom says "definitely unseen" skip the join
  entirely; only "maybe seen" rows (true positives + FP rate ~1%) go
  through the exact confirm anti-join — a bloom false positive can
  therefore never drop a should-fetch URL (SURVEY §7 hard-part 2).

At 10^10-URL scale the bloom cuts the anti-join's build side traffic
by the unseen fraction; m is sized from the expected seen-set
cardinality (10 bits/key ≈ 1% FP with k=4... we use k=4, m=16n).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

BLOOM_K = 4  # hash functions
BITS_PER_KEY = 16  # m = 16n → FP ≈ 0.3% at k=4


def _positions_col(url_col: str, m: int):
    """k bloom bit positions, computed JVM-side (codegen)."""
    return F.array(
        *[
            F.pmod(F.xxhash64(F.col(url_col), F.lit(i)), F.lit(m)).cast("long")
            for i in range(BLOOM_K)
        ]
    )


def build_bloom(seen: DataFrame, url_col: str = "url", n_hint: int | None = None) -> tuple[bytes, int]:
    """Build the seen-set bloom filter: per-partition numpy bitsets in a
    mapInPandas pass, OR-merged on the driver. Returns (bitset, m).

    Driver merge is one ``m/8``-byte array per partition — at 10^10
    keys and 16 bits/key that's 20 GB total, so a production deploy
    shards the bloom by url-hash range and broadcasts shards to the
    tasks that need them; the sandbox keeps one shard.
    """
    n = n_hint if n_hint is not None else seen.count()
    m = max(1024, 1 << math.ceil(math.log2(max(1, n) * BITS_PER_KEY)))
    pos_df = seen.select(_positions_col(url_col, m).alias("pos"))

    n_bytes = m // 8

    def to_bitmaps(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.zeros(n_bytes, dtype=np.uint8)
        any_rows = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            any_rows = True
            pos = np.concatenate(pdf["pos"].to_numpy())
            np.bitwise_or.at(bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))
        if any_rows:
            yield pd.DataFrame({"bitmap": [bits.tobytes()]})

    parts = pos_df.mapInPandas(to_bitmaps, "bitmap binary").collect()
    merged = np.zeros(n_bytes, dtype=np.uint8)
    for row in parts:
        merged |= np.frombuffer(row["bitmap"], dtype=np.uint8)
    return merged.tobytes(), m


def bloom_maybe_seen_col(spark, bloom_bytes: bytes, m: int, url_col: str = "url"):
    """Vectorized probe column: True = maybe seen (needs exact confirm),
    False = definitely unseen."""
    bc = spark.sparkContext.broadcast(bloom_bytes)

    @F.pandas_udf(BooleanType())
    def probe(pos_series: pd.Series) -> pd.Series:
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        out = np.empty(len(pos_series), dtype=bool)
        for i, pos in enumerate(pos_series.to_numpy()):
            p = np.asarray(pos)
            out[i] = bool(np.all(bits[p // 8] & (1 << (p % 8)).astype(np.uint8)))
        return pd.Series(out)

    return probe(_positions_col(url_col, m))


class IncrementalBloom:
    """Persistent, incrementally-maintained seen-set bloom filter.

    The naive bloom path rebuilds from the FULL seen set every round —
    a non-starter at 10^10 urls. This one stores the merged bitmap as
    a TableStore blob and ORs in only each round's recorded urls
    (politeness-bounded delta). Staleness safety: the blob records the
    round it covers; if it does not exactly cover rounds <= r-1 at use
    time (crash between seen append and bloom update, or a fresh
    store), it is rebuilt from the seen table once — a stale bloom
    would otherwise produce FALSE NEGATIVES (urls wrongly skipped past
    the exact confirm join and re-crawled).

    Sizing is fixed at first build from ``n_expected`` (default: 32x
    the initial seen count, min 2^20 bits); production would shard and
    re-size (scalable bloom), noted here as the growth path.
    """

    BLOB = "seen_bloom"

    def __init__(self, store):
        self.store = store

    def _positions_df(self, urls_df: DataFrame, m: int, url_col: str):
        return urls_df.select(_positions_col(url_col, m).alias("pos"))

    def _bits_of(self, urls_df: DataFrame, m: int, url_col: str) -> bytes:
        n_bytes = m // 8

        def to_bitmaps(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            bits = np.zeros(n_bytes, dtype=np.uint8)
            any_rows = False
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                any_rows = True
                pos = np.concatenate(pdf["pos"].to_numpy())
                np.bitwise_or.at(bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))
            if any_rows:
                yield pd.DataFrame({"bitmap": [bits.tobytes()]})

        parts = (
            self._positions_df(urls_df, m, url_col)
            .mapInPandas(to_bitmaps, "bitmap binary")
            .collect()
        )
        merged = np.zeros(n_bytes, dtype=np.uint8)
        for row in parts:
            merged |= np.frombuffer(row["bitmap"], dtype=np.uint8)
        return merged.tobytes()

    def ensure(
        self,
        seen_df: DataFrame,
        covers_round: int,
        url_col: str = "url",
        n_expected: int | None = None,
    ) -> tuple[bytes, int]:
        """Return (bitmap, m) covering exactly ``seen_df`` (rounds <=
        covers_round), rebuilding only when the stored blob is stale."""
        blob = self.store.get_blob(self.BLOB)
        if blob is not None and blob[1]["round"] == covers_round:
            return blob[0], blob[1]["m"]
        n = n_expected if n_expected is not None else max(seen_df.count(), 1) * 32
        m = max(1 << 20, 1 << math.ceil(math.log2(max(1, n))))
        bits = self._bits_of(seen_df, m, url_col)
        self.store.put_blob(self.BLOB, bits, {"m": m, "round": covers_round})
        return bits, m

    def update(
        self, new_urls_df: DataFrame, covers_round: int, url_col: str = "url"
    ) -> None:
        """OR the round's recorded urls into the stored bitmap (delta
        only). No-op if no blob exists yet (ensure() builds lazily)."""
        blob = self.store.get_blob(self.BLOB)
        if blob is None:
            return
        old_bits, meta = blob
        if meta["round"] >= covers_round:
            return
        delta = self._bits_of(new_urls_df, meta["m"], url_col)
        merged = (
            np.frombuffer(old_bits, dtype=np.uint8)
            | np.frombuffer(delta, dtype=np.uint8)
        )
        self.store.put_blob(
            self.BLOB, merged.tobytes(), {"m": meta["m"], "round": covers_round}
        )


def anti_join_seen(
    candidates: DataFrame,
    seen: DataFrame,
    url_col: str = "url",
    use_bloom: bool = False,
    seen_count_hint: int | None = None,
    prebuilt: tuple[bytes, int] | None = None,
) -> DataFrame:
    """Return candidates whose url is NOT in seen.

    ``use_bloom=True`` routes only bloom-positive rows through the
    exact anti-join; semantics are identical (tested) — the bloom has
    no false negatives by construction. ``prebuilt`` supplies an
    (bitmap, m) from IncrementalBloom so the filter is not rebuilt
    from the full seen set per call.
    """
    if not use_bloom:
        # merge hint: the seen set is never broadcastable at frontier
        # scale (the static planner would happily build a 10^10-row
        # driver hash relation at the default threshold). With seen
        # stored bucketed by url the SMJ scans it exchange-free and
        # only the candidate delta shuffles.
        return candidates.join(
            seen.select(url_col).hint("merge"), url_col, "left_anti"
        )

    spark = candidates.sparkSession
    if prebuilt is not None:
        bloom_bytes, m = prebuilt
    else:
        bloom_bytes, m = build_bloom(seen, url_col, n_hint=seen_count_hint)
    flagged = candidates.withColumn(
        "_maybe_seen", bloom_maybe_seen_col(spark, bloom_bytes, m, url_col)
    )
    definite_new = flagged.where(~F.col("_maybe_seen")).drop("_maybe_seen")
    confirmed_new = (
        flagged.where(F.col("_maybe_seen"))
        .drop("_maybe_seen")
        .join(seen.select(url_col), url_col, "left_anti")
    )
    return definite_new.unionByName(confirmed_new)
