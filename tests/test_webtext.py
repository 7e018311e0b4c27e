"""Webtext query family: keyword-extraction parser parity against an
independent pure-Python mirror of the reference semantics
(builder/_keywords.py:150-220), repetition-quality arithmetic on
planted docs, and SRP-pair blocking vs brute force."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from pixcrawler_spark.queries.webtext import (
    DUP_TRIGRAM_MAX,
    TOP_BIGRAM_MAX,
    extract_keywords_expr,
)


def _ref_extract(response: str, category: str) -> list[str]:
    """Line-for-line mirror of the reference algorithm (eval replaced
    by a strict quoted-string-list parse, the subset our synthesized
    grammar and the Spark expression both target)."""
    m = re.search(r"\[.*?\]", response, re.DOTALL)
    keywords = None
    if m:
        body = m.group(0)[1:-1].strip()
        items = []
        ok = bool(body)
        for part in body.split(","):
            part = part.strip()
            if len(part) >= 2 and part[0] == part[-1] and part[0] in "\"'":
                items.append(part[1:-1])
            else:
                ok = False
                break
        if ok:
            keywords = items
    if keywords is None:
        keywords = []
        for line in (ln.strip() for ln in response.split("\n")):
            line = re.sub(r"^[-*•\"]", "", line).strip()
            line = re.sub(r"^[0-9]+\.", "", line).strip()
            line = line.strip("\"'")
            if line and not line.startswith("[") and not line.startswith("]"):
                keywords.append(line)
    keywords = [k.strip() for k in keywords if k and k.strip()]
    keywords = list(dict.fromkeys(keywords))
    if category not in keywords:
        keywords.insert(0, category)
    return keywords


EDGE_CASES = [
    # (response, category)
    ('["cats", "dogs", "cats"]', "pets"),          # dedup inside list
    ("['a', 'b']", "x"),                           # single quotes
    ('noise ["k1", "k2"] trailing', "c"),          # list embedded in prose
    ("- one\n* two\n• three", "c"),                # bullet fallback
    ('1. one\n2. two\n\n3. "three"', "c"),         # numbered + blank + quoted
    ("[broken\nplain line\n]skip", "c"),           # no closing ] on first line
    ("", "solo"),                                   # empty → category only
    ("just one line", "line"),                      # plain text line
    ('- cats\n* dogs', "cats"),                     # category already present
    ('"quoted line"\n-dash', "q"),                  # full-quote strip
]


def test_keyword_parser_matches_reference_mirror(spark):
    df = spark.createDataFrame(
        [(i, r, c) for i, (r, c) in enumerate(EDGE_CASES)],
        "i int, response string, category string",
    )
    got = {
        r["i"]: r["kws"]
        for r in df.select(
            "i",
            extract_keywords_expr(
                F.col("response"), F.col("category")
            ).alias("kws"),
        ).collect()
    }
    for i, (resp, cat) in enumerate(EDGE_CASES):
        assert got[i] == _ref_extract(resp, cat), (
            f"case {i}: {resp!r} -> {got[i]} != {_ref_extract(resp, cat)}"
        )


def test_keyword_parser_category_not_duplicated(spark):
    df = spark.createDataFrame([("- cats\n- dogs", "cats")], "r string, c string")
    (row,) = df.select(
        extract_keywords_expr(F.col("r"), F.col("c")).alias("k")
    ).collect()
    assert row["k"] == ["cats", "dogs"]


def _repetition(spark, text: str) -> dict:
    from pixcrawler_spark.queries.webtext import text_repetition_quality
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(0, text, "en", "s", len(text))],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(os.path.join(d, "documents.parquet"))
        (row,) = text_repetition_quality(spark, d).collect()
    return row.asDict()


def test_repetition_planted_loop(spark):
    # "a b " * 20 → every bigram is "a b"/"b a": top fraction ~1/2 of
    # alternating pairs; all trigrams repeat after the first two
    r = _repetition(spark, "spam ham " * 20)
    assert r["n_tokens"] == 40
    assert r["top_bigram_frac"] > TOP_BIGRAM_MAX
    assert r["dup_trigram_frac"] > DUP_TRIGRAM_MAX
    assert r["repetitive"] is True


def test_repetition_all_distinct(spark):
    r = _repetition(spark, " ".join(f"w{i}" for i in range(30)))
    assert r["n_tokens"] == 30
    assert r["dup_trigram_frac"] == 0.0
    assert r["repetitive"] is False


def test_repetition_short_doc_no_grams(spark):
    r = _repetition(spark, "solo")
    assert r["n_tokens"] == 1
    assert r["top_bigram_frac"] == 0.0
    assert r["dup_trigram_frac"] == 0.0
    assert r["repetitive"] is False


def test_srp_pairs_subset_of_brute_force(spark):
    """Every SRP-bucketed pair must be a true >=threshold cosine pair
    (the bucket join may MISS pairs — that's the LSH contract — but
    must never emit a false one)."""
    from pixcrawler_spark.queries.pipeline import COSINE_THRESHOLD
    from pixcrawler_spark.queries.webtext import dedup_embedding_srp_pairs
    from pixcrawler_spark.operators.similarity import cosine_expr

    sf = "/root/testdata/sf0.001"
    pairs = dedup_embedding_srp_pairs(spark, sf).collect()
    assert pairs, "expected at least one SRP-bucketed near-dup pair"
    e = spark.read.parquet(f"{sf}/embeddings.parquet")
    a, b = e.alias("a"), e.alias("b")
    brute = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .where(
            cosine_expr(F.col("a.embedding"), F.col("b.embedding"))
            >= COSINE_THRESHOLD
        )
        .select(
            F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b")
        )
        .collect()
    }
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert got <= brute
