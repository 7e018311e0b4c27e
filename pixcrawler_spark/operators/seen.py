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

The PERSISTENT bloom (IncrementalBloom) is SHARDED by url-hash range:
``shard = pmod(xxhash64(url), n_shards)``, one bitmap blob per shard,
probed with the shard id as a routing column — a task touches only
the shard files its rows hash to (worker-side cache, file-backed, not
a monolithic broadcast). At 10^10 urls and 16 bits/key the total is
~20 GB; with 256 shards each blob is ~80 MB — streamable to object
storage, mergeable shard-at-a-time, never a single driver-resident
array.
"""

from __future__ import annotations

import math
import os
import uuid
from collections.abc import Iterator
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

BLOOM_K = 4  # hash functions
BITS_PER_KEY = 16  # m = 16n → FP ≈ 0.3% at k=4
SHARD_SEED = 7770  # xxhash seed for shard routing (≠ any position seed)


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


def _probe_bits(bits: np.ndarray, P: np.ndarray) -> np.ndarray:
    """Vectorized membership test: (n, k) position matrix against a
    bitset — one fancy-index + reduction, no per-row Python loop."""
    return ((bits[P // 8] & (1 << (P % 8)).astype(np.uint8)) != 0).all(axis=1)


def bloom_maybe_seen_col(spark, bloom_bytes: bytes, m: int, url_col: str = "url"):
    """Vectorized probe column: True = maybe seen (needs exact confirm),
    False = definitely unseen. The k positions of the whole Arrow batch
    are stacked into one (n, k) ndarray and tested in a single numpy
    expression (the per-row loop this replaced was the only hot-path
    Python loop in the repo)."""
    bc = spark.sparkContext.broadcast(bloom_bytes)

    @F.pandas_udf(BooleanType())
    def probe(pos_series: pd.Series) -> pd.Series:
        if len(pos_series) == 0:
            return pd.Series([], dtype=bool)
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        P = np.stack(pos_series.to_numpy()).astype(np.int64)
        return pd.Series(_probe_bits(bits, P))

    return probe(_positions_col(url_col, m))


@dataclass(frozen=True)
class BloomHandle:
    """Routing info for a sharded persistent bloom: tiny (n_shards
    paths), closure-captured by the probe UDF; the bitmaps themselves
    stay in files that workers open and cache on demand."""

    n_shards: int
    m_shard: int
    covers_round: int
    shard_paths: dict = field(default_factory=dict)  # shard -> abs path


# worker-side bitmap cache (per python worker process), keyed by path —
# generation-unique filenames make stale hits impossible
_SHARD_CACHE: dict = {}


def _load_shard(path: str) -> np.ndarray:
    bits = _SHARD_CACHE.get(path)
    if bits is None:
        with open(path, "rb") as f:
            bits = np.frombuffer(f.read(), dtype=np.uint8)
        _SHARD_CACHE[path] = bits
    return bits


def shard_expr(url_col: str, n_shards: int):
    return F.pmod(F.xxhash64(F.col(url_col), F.lit(SHARD_SEED)), F.lit(n_shards)).cast(
        "int"
    )


def sharded_maybe_seen_col(handle: BloomHandle, url_col: str = "url"):
    """Probe column against a sharded bloom: rows are routed by their
    shard id; the UDF tests each batch per unique shard with one
    vectorized bitset lookup, loading only the shard files its rows
    actually hash to (worker-cached)."""
    paths = dict(handle.shard_paths)

    @F.pandas_udf(BooleanType())
    def probe(shard_series: pd.Series, pos_series: pd.Series) -> pd.Series:
        n = len(shard_series)
        if n == 0:
            return pd.Series([], dtype=bool)
        sh = shard_series.to_numpy()
        P = np.stack(pos_series.to_numpy()).astype(np.int64)
        out = np.empty(n, dtype=bool)
        for j in np.unique(sh):
            mask = sh == j
            path = paths.get(int(j))
            if path is None:  # shard never built → nothing seen in it
                out[mask] = False
                continue
            out[mask] = _probe_bits(_load_shard(path), P[mask])
        return pd.Series(out)

    return probe(
        shard_expr(url_col, handle.n_shards),
        _positions_col(url_col, handle.m_shard),
    )


class IncrementalBloom:
    """Persistent, incrementally-maintained, SHARDED seen-set bloom.

    The naive bloom path rebuilds from the FULL seen set every round —
    a non-starter at 10^10 urls. This one ORs in only each round's
    recorded urls (politeness-bounded delta), and partitions the
    bitmap by url-hash range: ``pmod(xxhash64(url, seed), n_shards)``
    picks the shard, each shard is an independent bloom of
    ``m_shard`` bits stored as its own blob file, and the probe routes
    rows to shards. No step ever holds the full bitmap: builds emit
    per-shard bitmaps from shard-partitioned tasks, merges OR one
    shard at a time, and workers cache only the shards their rows
    touch (at 10^10 urls / 256 shards: ~80 MB per blob vs a 20 GB
    monolith).

    Commit protocol: shard files are generation-named; a master blob
    (atomic rename via TableStore.put_blob) lists the live generation's
    paths + covered round. A crash mid-write leaves the master pointing
    at the previous consistent generation.

    Staleness safety: if the master does not exactly cover rounds <=
    r-1 at use time (crash between seen append and bloom update, or a
    fresh store), the whole set is rebuilt from the seen table once —
    a stale bloom would otherwise produce FALSE NEGATIVES (urls
    wrongly skipped past the exact confirm join and re-crawled).
    """

    BLOB = "seen_bloom"  # master metadata blob name

    def __init__(self, store, n_shards: int = 8):
        self.store = store
        self.n_shards = n_shards

    # -- shard-file plumbing ------------------------------------------------
    def _bin_dir(self) -> str:
        d = os.path.join(self.store.root, "_blobs")
        os.makedirs(d, exist_ok=True)
        return d

    def _flip_master(
        self, rels: dict, m_shard: int, covers_round: int, replaced: list[str]
    ) -> BloomHandle:
        """Atomically publish a new shard generation. Replaced files
        are NOT deleted now: a concurrent reader (the frontier-merge
        job probes the round-(r-1) handle while the seen job advances
        the blob to round r) may still hold their paths in a lazy plan.
        Two-generation retention (the Iceberg snapshot-expiry pattern):
        each flip deletes the files the PREVIOUS flip replaced and
        records its own replaced list for the next one."""
        old = self.store.get_blob(self.BLOB)
        d = self._bin_dir()
        meta = {
            "round": covers_round,
            "m_shard": m_shard,
            "n_shards": self.n_shards,
            "shards": rels,
            "expired": replaced,
        }
        self.store.put_blob(self.BLOB, b"", meta)
        if old is not None:
            for rel in old[1].get("expired", []):
                try:
                    os.remove(os.path.join(d, rel))
                except OSError:
                    pass
        return self._handle_from_meta(meta)

    def _write_generation(
        self, bitmaps: dict[int, np.ndarray], m_shard: int, covers_round: int
    ) -> BloomHandle:
        old = self.store.get_blob(self.BLOB)
        gen = uuid.uuid4().hex[:8]
        d = self._bin_dir()
        rels = {}
        for j, bits in bitmaps.items():
            rel = f"{self.BLOB}.s{j}.{gen}.bin"
            with open(os.path.join(d, rel), "wb") as f:
                f.write(bits.tobytes())
            rels[str(j)] = rel
        replaced = (
            list(old[1].get("shards", {}).values()) if old is not None else []
        )
        return self._flip_master(rels, m_shard, covers_round, replaced)

    def _handle_from_meta(self, meta: dict) -> BloomHandle:
        d = self._bin_dir()
        return BloomHandle(
            n_shards=int(meta["n_shards"]),
            m_shard=int(meta["m_shard"]),
            covers_round=int(meta["round"]),
            shard_paths={
                int(j): os.path.join(d, rel)
                for j, rel in meta["shards"].items()
            },
        )

    def _shard_bitmaps(
        self, urls_df: DataFrame, m_shard: int, url_col: str
    ) -> dict[int, np.ndarray]:
        """One Spark job: urls → per-shard bitmaps. Rows are
        repartitioned by shard id so each task accumulates bitmaps for
        the few shards it owns (memory per task = shards/task ×
        m_shard/8); the driver merge ORs shard-at-a-time."""
        n_bytes = m_shard // 8
        n_shards = self.n_shards
        pos_df = urls_df.select(
            shard_expr(url_col, n_shards).alias("shard"),
            _positions_col(url_col, m_shard).alias("pos"),
        ).repartition(n_shards, "shard")

        def to_bitmaps(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            acc: dict[int, np.ndarray] = {}
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                sh = pdf["shard"].to_numpy()
                P = np.stack(pdf["pos"].to_numpy()).astype(np.int64)
                for j in np.unique(sh):
                    bits = acc.get(int(j))
                    if bits is None:
                        bits = acc.setdefault(int(j), np.zeros(n_bytes, np.uint8))
                    p = P[sh == j].ravel()
                    np.bitwise_or.at(
                        bits, p // 8, (1 << (p % 8)).astype(np.uint8)
                    )
            if acc:
                yield pd.DataFrame(
                    {
                        "shard": list(acc),
                        "bitmap": [b.tobytes() for b in acc.values()],
                    }
                )

        merged: dict[int, np.ndarray] = {}
        for row in pos_df.mapInPandas(
            to_bitmaps, "shard int, bitmap binary"
        ).collect():
            j = int(row["shard"])
            delta = np.frombuffer(row["bitmap"], dtype=np.uint8)
            if j in merged:
                merged[j] = merged[j] | delta
            else:
                merged[j] = delta.copy()
        return merged

    # -- public surface ------------------------------------------------------
    def ensure(
        self,
        seen_df: DataFrame,
        covers_round: int,
        url_col: str = "url",
        n_expected: int | None = None,
    ) -> BloomHandle:
        """Return a handle covering exactly ``seen_df`` (rounds <=
        covers_round), rebuilding only when the stored master is
        stale."""
        blob = self.store.get_blob(self.BLOB)
        if (
            blob is not None
            and blob[1].get("round") == covers_round
            and blob[1].get("n_shards") == self.n_shards
        ):
            return self._handle_from_meta(blob[1])
        n = n_expected if n_expected is not None else max(seen_df.count(), 1) * 32
        per_shard = max(1, n // self.n_shards)
        m_shard = max(1 << 17, 1 << math.ceil(math.log2(per_shard)))
        bitmaps = self._shard_bitmaps(seen_df, m_shard, url_col)
        # materialize empty shards too so every shard has a file
        n_bytes = m_shard // 8
        for j in range(self.n_shards):
            bitmaps.setdefault(j, np.zeros(n_bytes, np.uint8))
        return self._write_generation(bitmaps, m_shard, covers_round)

    def update(
        self, new_urls_df: DataFrame, covers_round: int, url_col: str = "url"
    ) -> None:
        """OR the round's recorded urls into the stored shard bitmaps
        (delta only; only shards the delta touches are rewritten — the
        rest carry over by path). No-op if no master exists yet
        (ensure() builds lazily)."""
        blob = self.store.get_blob(self.BLOB)
        if blob is None:
            return
        meta = blob[1]
        if meta["round"] >= covers_round:
            return
        handle = self._handle_from_meta(meta)
        deltas = self._shard_bitmaps(new_urls_df, handle.m_shard, url_col)
        d = self._bin_dir()
        gen = uuid.uuid4().hex[:8]
        new_rels = dict(meta["shards"])
        replaced = []
        for j, delta in deltas.items():
            old_path = handle.shard_paths.get(j)
            old_bits = (
                np.fromfile(old_path, dtype=np.uint8)
                if old_path is not None and os.path.exists(old_path)
                else np.zeros(handle.m_shard // 8, np.uint8)
            )
            rel = f"{self.BLOB}.s{j}.{gen}.bin"
            with open(os.path.join(d, rel), "wb") as f:
                f.write((old_bits | delta).tobytes())
            if str(j) in new_rels:
                replaced.append(new_rels[str(j)])
            new_rels[str(j)] = rel
        self._flip_master(new_rels, handle.m_shard, covers_round, replaced)


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
    no false negatives by construction. ``prebuilt`` supplies either a
    ``BloomHandle`` (sharded persistent bloom from IncrementalBloom)
    or a legacy (bitmap, m) tuple, so the filter is not rebuilt from
    the full seen set per call.
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
    if isinstance(prebuilt, BloomHandle):
        flagged = candidates.withColumn(
            "_maybe_seen", sharded_maybe_seen_col(prebuilt, url_col)
        )
        return _split_on_flag(flagged, seen, url_col)
    if prebuilt is not None:
        bloom_bytes, m = prebuilt
    else:
        bloom_bytes, m = build_bloom(seen, url_col, n_hint=seen_count_hint)
    flagged = candidates.withColumn(
        "_maybe_seen", bloom_maybe_seen_col(spark, bloom_bytes, m, url_col)
    )
    return _split_on_flag(flagged, seen, url_col)


def _split_on_flag(flagged: DataFrame, seen: DataFrame, url_col: str) -> DataFrame:
    definite_new = flagged.where(~F.col("_maybe_seen")).drop("_maybe_seen")
    confirmed_new = (
        flagged.where(F.col("_maybe_seen"))
        .drop("_maybe_seen")
        .join(seen.select(url_col), url_col, "left_anti")
    )
    return definite_new.unionByName(confirmed_new)
