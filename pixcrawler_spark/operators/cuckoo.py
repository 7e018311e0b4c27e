"""Cuckoo filter: deletable approximate membership, numpy-vectorized.

The north-star pairs the bloom URL-seen set with CUCKOO-filter dedup
for in-round candidates: unlike bloom, a cuckoo filter supports
deletion, so a candidate admitted then retracted (politeness deferral)
can be removed without rebuilding. Reference analog: the two in-memory
dedup hash maps (validator/integrity.py:150-170) — the exact maps
don't scale past one node, the filter does.

Implementation: standard (2,4) cuckoo filter — 2 candidate buckets,
4 slots/bucket, 16-bit fingerprints, partial-key cuckoo hashing
(Fan et al., CoNEXT'14; public algorithm). Vectorized numpy inserts/
lookups; used per-partition inside mapInPandas (build) and as a
broadcast probe, mirroring the bloom path in operators/seen.py.

Engine status: exposed as ``partition_dedup`` for in-partition
pre-dedup of candidate streams. The v2 round loop no longer needs it
on the hot path — the discovery dedup window carries a rank filter,
so Spark's WindowGroupLimit already drops locally-repeated urls
map-side before the exchange (the same effect, exact, and free).
The filter remains the right tool where deletion matters (e.g. an
admission cache that retracts deferred candidates) and for non-window
pipelines. Approximate filtering is only ever a pre-pass — exactness
always comes from the window/anti-join behind it.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

BUCKET_SLOTS = 4
MAX_KICKS = 500


class CuckooFilter:
    """(2,4) cuckoo filter over uint64-hashed keys, 16-bit fingerprints."""

    def __init__(self, capacity: int, seed: int = 42):
        n_buckets = max(4, int(1 << (int(np.ceil(np.log2(capacity / BUCKET_SLOTS + 1))))))
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, BUCKET_SLOTS), dtype=np.uint16)
        self.rng = np.random.default_rng(seed)
        self.size = 0

    # fingerprint 1..65535 (0 = empty slot)
    @staticmethod
    def _fingerprint(h: np.ndarray) -> np.ndarray:
        fp = (h >> np.uint64(48)).astype(np.uint16)
        return np.where(fp == 0, np.uint16(1), fp)

    def _i1(self, h: np.ndarray) -> np.ndarray:
        return (h & np.uint64(self.n_buckets - 1)).astype(np.int64)

    def _i2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # partial-key: i2 = i1 xor hash(fp)
        fph = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & np.uint64(
            self.n_buckets - 1
        )
        return (i1.astype(np.uint64) ^ fph).astype(np.int64)

    def _bucket_insert(self, i: int, fp: int) -> bool:
        row = self.table[i]
        empty = np.flatnonzero(row == 0)
        if len(empty):
            row[empty[0]] = fp
            return True
        return False

    def insert_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Insert uint64 hashes; returns bool array: True if newly
        inserted, False if already present (the dedup signal)."""
        out = np.empty(len(hashes), dtype=bool)
        fps = self._fingerprint(hashes)
        i1s = self._i1(hashes)
        i2s = self._i2(i1s, fps)
        for n, (fp, i1, i2) in enumerate(zip(fps, i1s, i2s)):
            fp = int(fp)
            if fp in self.table[i1] or fp in self.table[i2]:
                out[n] = False
                continue
            out[n] = True
            if self._bucket_insert(i1, fp) or self._bucket_insert(i2, fp):
                self.size += 1
                continue
            # cuckoo kicks
            i = int(i1 if self.rng.integers(2) else i2)
            cur = fp
            placed = False
            for _ in range(MAX_KICKS):
                slot = int(self.rng.integers(BUCKET_SLOTS))
                cur, self.table[i, slot] = int(self.table[i, slot]), cur
                i = int(self._i2(np.array([i]), np.array([cur], dtype=np.uint16))[0])
                if self._bucket_insert(i, cur):
                    placed = True
                    break
            if not placed:
                raise OverflowError("cuckoo filter full")
            self.size += 1
        return out

    def contains_hashes(self, hashes: np.ndarray) -> np.ndarray:
        fps = self._fingerprint(hashes)
        i1s = self._i1(hashes)
        i2s = self._i2(i1s, fps)
        out = np.empty(len(hashes), dtype=bool)
        for n, (fp, i1, i2) in enumerate(zip(fps, i1s, i2s)):
            out[n] = (fp in self.table[i1]) or (fp in self.table[i2])
        return out

    def delete_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Delete one copy of each present fingerprint; True if deleted."""
        fps = self._fingerprint(hashes)
        i1s = self._i1(hashes)
        i2s = self._i2(i1s, fps)
        out = np.zeros(len(hashes), dtype=bool)
        for n, (fp, i1, i2) in enumerate(zip(fps, i1s, i2s)):
            for i in (i1, i2):
                slots = np.flatnonzero(self.table[i] == fp)
                if len(slots):
                    self.table[i, slots[0]] = 0
                    self.size -= 1
                    out[n] = True
                    break
        return out


def _hash_series(s: pd.Series) -> np.ndarray:
    """Stable uint64 hash of a string series (vectorized pandas)."""
    return pd.util.hash_array(s.to_numpy()).astype(np.uint64)


def partition_dedup(df: DataFrame, key_col: str = "url") -> DataFrame:
    """In-round per-partition approximate dedup: keep the first
    occurrence of each key WITHIN a partition (cuckoo-filter pre-pass).
    Upstream exact dedup still runs; this only shrinks its input.

    Note the cuckoo filter is approximate: a fingerprint collision can
    drop a distinct key within a partition, which is why this operator
    is only used in front of exact dedup — never for correctness.
    """
    schema = df.schema

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cf: CuckooFilter | None = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if cf is None:
                cf = CuckooFilter(capacity=max(4096, len(pdf) * 8))
            fresh = cf.insert_hashes(_hash_series(pdf[key_col]))
            yield pdf[fresh]

    return df.mapInPandas(gen, schema)
