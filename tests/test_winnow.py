"""Winnowing fingerprints (operators/winnow.py) vs a pure-Python
reference implementing the paper definition directly (all windows →
min → rightmost tie-break), plus the paper's structural guarantees."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from pixcrawler_spark.operators import winnow


def _ref_normalize(text: str) -> str:
    """Mirror of operators/winnow.normalize_text: keep Unicode
    letters/digits (Python isalnum ≈ \\p{L}\\p{N}), lowercase ASCII
    only (non-Latin codepoints pass through unchanged)."""
    return "".join(
        c.lower() if c.isascii() else c
        for c in text
        if c.isalnum()
    )


def _ref_winnow(text: str, k: int, w: int) -> set[tuple[int, str]]:
    """Paper definition, independent of the engine's fold: normalize,
    hash every k-gram, take the rightmost minimum of every full
    window. Returns {(1-based pos, md5 hex)}."""
    s = _ref_normalize(text)
    if len(s) < k + w - 1:
        return set()
    hs = [
        hashlib.md5(s[p:p + k].encode()).hexdigest()
        for p in range(len(s) - k + 1)
    ]
    out: set[tuple[int, str]] = set()
    for st in range(len(hs) - w + 1):
        window = hs[st:st + w]
        m = min(window)
        rp = max(i for i, h in enumerate(window) if h == m) + st
        out.add((rp + 1, hs[rp]))
    return out


DOCS = [
    (0, "The quick brown fox jumps over the lazy dog!"),
    (1, "the QUICK brown-fox jumps over the lazy dog"),  # same normalized
    (2, "Completely different content, nothing shared at all here."),
    (3, "short"),  # below k+w-1 normalized chars → no fingerprints
    (4, "aaaaaaaaaaaaaaaaaaaaaaaa"),  # all k-grams identical (tie storm)
    (5, "Numbers 12345 and punctuation;;; mix: the quick brown fox."),
    # non-Latin scripts must fingerprint (codepoint-preserving
    # normalization), not normalize to empty
    (6, "Привет, мир! Это довольно длинный кириллический текст."),
    (7, "你好世界这是一个足够长的中文测试文档用于指纹提取验证流程"),
    (8, "Mixed Кириллица and ASCII text 混合 with enough length here."),
]


def test_matches_paper_reference(spark):
    k, w = 5, 4
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["fp_pos"], r["fp_hash"])
        for r in winnow.winnow_fingerprints(
            df, "doc_id", "text", k=k, w=w
        ).collect()
    }
    want = {
        (i, pos, h)
        for i, t in DOCS
        for pos, h in _ref_winnow(t, k, w)
    }
    assert got == want
    # doc 3 is below the t = w+k-1 threshold → contributes nothing
    assert not any(i == 3 for i, _, _ in got)
    # doc 4: every hash equal → rightmost-min rule selects the LAST
    # position of every window → positions w..n_grams, each once
    d4 = sorted(pos for i, pos, _ in got if i == 4)
    n_grams4 = len("aaaaaaaaaaaaaaaaaaaaaaaa") - k + 1
    assert d4 == list(range(w, n_grams4 + 1))


def test_normalization_invariance_and_guarantee(spark):
    # docs 0 and 1 normalize identically → identical fingerprint sets
    # (the winnowing guarantee in its strongest form).
    k, w = 5, 4
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    by_doc: dict[int, set] = {}
    for r in winnow.winnow_fingerprints(
        df, "doc_id", "text", k=k, w=w
    ).collect():
        by_doc.setdefault(r["doc_id"], set()).add(
            (r["fp_pos"], r["fp_hash"])
        )
    assert by_doc[0] == by_doc[1]
    # density guarantee: at least one fingerprint per window stretch —
    # count >= n_windows / w for every doc that has windows.
    for i, t in DOCS:
        want = _ref_winnow(t, k, w)
        if not want:
            continue
        s = _ref_normalize(t)
        n_windows = (len(s) - k + 1) - w + 1
        assert len(by_doc[i]) * w >= n_windows


def test_similarity_pairs_semantics(spark):
    # Paste-detection: doc 10 ⊂ doc 11 (prefix paste) → overlap 1.0;
    # doc 12 unrelated → no pair reported at threshold 0.5.
    base = (
        "winnowing selects the rightmost minimum hash of every "
        "window of consecutive kgram hashes across the document"
    )
    rows = [
        (10, base),
        (11, base + " with a long unrelated suffix appended here "
             "that adds plenty of extra fingerprints beyond it"),
        (12, "zebras quartz jackdaws vex my sphinx of black quartz "
             "judge my vow pack my box with five dozen jugs"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): (r["n_shared"], r["overlap"])
        for r in winnow.winnow_similarity_pairs(
            df, "doc_id", "text", k=5, w=4,
            max_df=64, threshold=0.5,
        ).collect()
    }
    assert set(got) == {(10, 11)}
    n_shared, overlap = got[(10, 11)]
    # the contained doc's fingerprints all come from the shared prefix
    # except those whose windows straddle the paste boundary
    assert overlap >= 0.8
    assert n_shared >= 10


def test_fingerprint_plan_is_map_only_and_hashes_once(spark):
    # The census path must stay shuffle-free: no Exchange in the plan.
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    staged = winnow.stage_gram_hashes(df, "doc_id", "text", 5, 4)
    fp = staged.select(
        "doc_id",
        F.size(
            winnow.select_fingerprints("_hs", 4)
        ).alias("n_fp"),
    )
    plan = fp._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # Linear-hashing audit: the gram-hash array must survive as its
    # own projection (md5 appears ONCE in the optimized plan). If
    # CollapseProject ever re-inlines it into the selection fold,
    # lambdas get no subexpression elimination and hashing goes
    # O(n_grams²) per doc (measured ~100x at 300-char docs).
    opt = fp._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("md5") == 1, opt
