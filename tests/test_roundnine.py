"""Invariant tests for Neyman-allocated sampling and keyword typo
dedup: allocation math, exact sizes, and brute-force pair equality
over the vocabulary."""

from __future__ import annotations

import hashlib
import math

from pixcrawler_spark.queries import REGISTRY
from pixcrawler_spark.queries.roundnine import NEY_BUDGET

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_neyman_allocation_math(spark):
    pdf = REGISTRY["sample_neyman_allocation"].fn(spark, SF).toPandas()
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    stats = docs.groupby("lang")["n_chars"].agg(["count", "std"])
    w = stats["count"] * stats["std"]
    alloc = {
        lang: int(math.floor(round(NEY_BUDGET * wi / w.sum(), 6)))
        for lang, wi in w.items()
    }
    got = pdf.groupby("lang").size().to_dict()
    for lang, n in alloc.items():
        assert got.get(lang, 0) == min(n, int(stats.loc[lang, "count"]))
        assert (
            pdf[pdf["lang"] == lang]["n_alloc"].eq(n).all()
            if lang in got
            else True
        )
    # the budget is respected
    assert sum(got.values()) <= NEY_BUDGET


def test_neyman_selection_is_hash_topk(spark):
    """Selected docs per stratum are exactly the n_alloc smallest by
    the deterministic hash order — reproducible at any cluster size."""
    pdf = REGISTRY["sample_neyman_allocation"].fn(spark, SF).toPandas()
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    for lang, grp in pdf.groupby("lang"):
        n = int(grp["n_alloc"].iloc[0])
        pool = docs[docs["lang"] == lang]["doc_id"]
        want = set(
            sorted(pool, key=lambda d: (_h60(f"ney:{d}"), d))[:n]
        )
        assert set(grp["doc_id"]) == want, lang


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (ca != cb),
                )
            )
        prev = cur
    return prev[-1]


def test_keyword_typos_match_bruteforce(spark):
    """The blocked join finds EXACTLY the pairs a brute-force O(V^2)
    sweep finds under the same (first char, length band, dist<=1)
    predicate — blocking loses nothing here because a single deletion
    at position >= 2 preserves the first char."""
    pdf = REGISTRY["dedup_keyword_typos"].fn(spark, SF).toPandas()
    vocab = sorted(
        set(
            spark.read.parquet(f"{SF}/part.parquet")
            .toPandas()["p_name"]
        )
    )
    kws = {}
    for v in vocab:
        kws[_h60(f"kw:{v}")] = v
        if _h60(f"kw:{v}") % 3 == 0 and len(v) > 3:
            pos = 1 + _h60(f"kw:{v}") % (len(v) - 2)
            kws[_h60(f"kwt:{v}")] = v[:pos] + v[pos + 1:]
    want = set()
    items = sorted(kws.items())
    for i, (ia, ka) in enumerate(items):
        for ib, kb in items[i + 1:]:
            lo, hi = (ia, ib) if ia < ib else (ib, ia)
            a, b = kws[lo], kws[hi]
            if (
                a[0] == b[0]
                and abs(len(a) - len(b)) <= 1
                and _lev(a, b) <= 1
            ):
                want.add((lo, hi))
    got = set(zip(pdf["id_a"], pdf["id_b"]))
    assert got == want
    # every planted typo pairs with its base at distance exactly 1
    for v in vocab:
        h = _h60(f"kw:{v}")
        if h % 3 == 0 and len(v) > 3:
            ht = _h60(f"kwt:{v}")
            lo, hi = (h, ht) if h < ht else (ht, h)
            assert (lo, hi) in got, v
    assert (pdf["dist"] <= 1).all()
