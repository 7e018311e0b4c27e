"""Dedup operator unit tests beyond the oracle gate: the df-cap /
prefix-filter candidate bound of the n-gram Jaccard join, and the
pigeonhole exactness of SimHash hamming banding."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from pixcrawler_spark.operators import dedup


def test_planted_hot_shingle_never_joins(spark):
    """A boilerplate shingle shared by every doc must be excluded from
    candidate generation when its document frequency exceeds max_df:
    docs whose ONLY shared content is the boilerplate produce no pair,
    while genuinely similar docs still match."""
    boiler = "all rights reserved"
    rows = [
        # pair 0/1: near-identical real content → must still be found
        (0, f"{boiler} quick brown fox jumps over the lazy dog today"),
        (1, f"{boiler} quick brown fox jumps over the lazy dog tonight"),
    ] + [
        # 30 docs sharing ONLY the boilerplate prefix
        (i, f"{boiler} unique{i} content{i} words{i} here{i} now{i}")
        for i in range(2, 32)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.ngram_jaccard_pairs(
        df, "doc_id", "text", n=3, threshold=0.5, max_df=5
    )
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (0, 1) in pairs
    # no boilerplate-only pair survives candidate generation
    assert all(a in (0, 1) and b in (0, 1) for a, b in pairs), pairs


def test_ngram_plan_shows_df_filter_stage(spark):
    df = spark.createDataFrame(
        [(i, f"a b c d e f g{i}") for i in range(10)],
        "doc_id long, text string",
    )
    plan = (
        dedup.ngram_jaccard_pairs(df, "doc_id", "text", max_df=3)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the df-filter stage is present: shingle-frequency aggregate
    # (count > max_df) whose hot set is excluded via a broadcast
    # LEFT ANTI join (hot shingles never become join keys)
    assert "count(1)" in plan, plan
    assert "LeftAnti" in plan, plan
    assert plan.count("Join") >= 3, plan  # anti + candidate + verify joins


def test_ngram_prefix_filter_is_exact_without_cap(spark):
    """With max_df=None the prefix filter must lose nothing: results
    equal the naive all-shared-shingle join."""
    rows = [
        (i, " ".join(f"w{(i * 7 + k) % 23}" for k in range(12)))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.ngram_jaccard_pairs(
            df, "doc_id", "text", n=3, threshold=0.3
        ).collect()
    }
    # naive reference: python set arithmetic
    def shingles(text):
        t = text.split()
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    sets = {i: shingles(t) for i, t in rows}
    want = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if inter == 0:
            continue
        jac = round(inter / len(sets[a] | sets[b]), 4)
        if jac >= 0.3:
            want.add((a, b, jac))
    assert got == want


def test_simhash_hamming_banding_matches_bruteforce(spark):
    """Band candidates + exact verify ≡ brute-force hamming <= 3."""
    rows = [
        (i, " ".join(f"tok{(i * 5 + k) % 17}" for k in range(30)))
        for i in range(25)
    ] + [
        # near-identical cluster: same tokens ± one
        (100, "alpha beta gamma delta epsilon zeta eta theta"),
        (101, "alpha beta gamma delta epsilon zeta eta iota"),
        (102, "alpha beta gamma delta epsilon zeta eta theta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = dedup.simhash_fingerprints(df, "doc_id", "text", dims=64)
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_hamming_pairs(
            fps, "doc_id", dims=64, max_hamming=3, n_bands=4
        ).collect()
    }
    sims = {r["doc_id"]: r["simhash"] for r in fps.collect()}
    want = {}
    for a, b in itertools.combinations(sorted(sims), 2):
        h = sum(x != y for x, y in zip(sims[a], sims[b]))
        if h <= 3:
            want[(a, b)] = h
    assert got == want
    assert (100, 102) in got and got[(100, 102)] == 0  # identical docs


def test_simhash_dims_above_32(spark):
    """dims > 32 uses the second bit of each nibble; first 32 dims stay
    identical to the narrow fingerprint (back-compat of the scheme)."""
    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "jumps over lazy dogs")],
        "doc_id long, text string",
    )
    f32 = {r["doc_id"]: r["simhash"] for r in
           dedup.simhash_fingerprints(df, "doc_id", "text", dims=32).collect()}
    f64 = {r["doc_id"]: r["simhash"] for r in
           dedup.simhash_fingerprints(df, "doc_id", "text", dims=64).collect()}
    for k in f32:
        assert len(f64[k]) == 64
        assert f64[k][:32] == f32[k]


def test_ngram_capped_measure_is_joinable_jaccard(spark):
    """With max_df set, the reported jaccard is computed over the
    joinable (non-hot) shingle universe — the same universe the
    prefix/length/positional filters bound. A verify over FULL sets
    against joinable-bounded filters would be inconsistent (pairs
    whose full-set similarity rides on hot shingles would be silently
    dropped by the length filter)."""
    boiler = "all rights reserved"
    rows = [
        (0, f"{boiler} quick brown fox jumps over the lazy dog today"),
        (1, f"{boiler} quick brown fox jumps over the lazy dog tonight"),
    ] + [
        (i, f"{boiler} unique{i} content{i} words{i} here{i} now{i}")
        for i in range(2, 32)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    max_df = 5
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            df, "doc_id", "text", n=3, threshold=0.5, max_df=max_df
        ).collect()
    }

    def shingles(text):
        t = text.split()
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    sets = {i: shingles(t) for i, t in rows}
    from collections import Counter

    df_count = Counter(s for ss in sets.values() for s in ss)
    hot = {s for s, c in df_count.items() if c > max_df}
    joinable = {i: ss - hot for i, ss in sets.items()}
    a, b = joinable[0], joinable[1]
    want = round(len(a & b) / len(a | b), 4)
    assert got[(0, 1)] == want
