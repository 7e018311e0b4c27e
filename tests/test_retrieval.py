"""Invariant tests for BM25 retrieval: python-recomputed scores and
the partial-top-K plan shape."""

from __future__ import annotations

import math
import re
from collections import Counter

from pixcrawler_spark.queries import REGISTRY
from pixcrawler_spark.queries.retrieval import (
    BM25_B,
    BM25_K1,
    BM25_TERMS,
    BM25_TOPK,
)

SF = "/root/testdata/sf0.001"


def _python_bm25(docs):
    toks = {
        r["doc_id"]: re.split(r"\s+", r["text"].strip().lower())
        for _, r in docs.iterrows()
    }
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    dfc = {
        q: sum(1 for t in toks.values() if q in t) for q in BM25_TERMS
    }
    scores = {}
    for doc_id, t in toks.items():
        c = Counter(t)
        s = 0.0
        for q in BM25_TERMS:
            tf = c.get(q, 0)
            if not tf:
                continue
            idf = math.log(1 + (n - dfc[q] + 0.5) / (dfc[q] + 0.5))
            s += (
                idf
                * tf
                * (BM25_K1 + 1)
                / (tf + BM25_K1 * (1 - BM25_B + BM25_B * len(t) / avgdl))
            )
        if s:
            scores[doc_id] = round(s, 6)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:BM25_TOPK]


def test_bm25_matches_python(spark):
    pdf = REGISTRY["text_bm25_topk"].fn(spark, SF).toPandas()
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    want = _python_bm25(docs)
    got = list(zip(pdf["doc_id"], pdf["bm25"]))
    got = sorted(got, key=lambda kv: (-kv[1], kv[0]))
    assert len(got) == len(want) == BM25_TOPK
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gd == wd
        assert abs(gs - ws) < 1e-9


def test_bm25_partial_topk_plan(spark):
    """The final cut is TakeOrderedAndProject (map-side partial
    top-K), never a global Sort."""
    df = REGISTRY["text_bm25_topk"].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
