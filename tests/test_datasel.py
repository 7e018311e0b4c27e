"""Data-selection stage unit tests: chunk-window geometry, shard-pack
boundaries, and gate semantics on crafted docs (the sf0.01 fixture's
docs are all shorter than one chunk, so the overlap path needs these)."""

from __future__ import annotations

import pyspark.sql.functions as F

from pixcrawler_spark.queries.datasel import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    GOPHER_MIN_WORDS,
    SHARD_TOKENS,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _run(spark, tmp_path, rows, qname):
    import pixcrawler_spark.queries as q

    d = tmp_path / "documents.parquet"
    _docs(spark, rows).toPandas().to_parquet(d)
    return q.REGISTRY[qname].fn(spark, str(tmp_path))


def test_chunk_windows_overlap_geometry(spark, tmp_path):
    # 300 tokens -> 3 chunks: [0,128), [96,224), [192,300)
    text = " ".join(f"w{i}" for i in range(300))
    out = sorted(
        (r["chunk_id"], r["start_tok"], r["n_chunk_tokens"])
        for r in _run(
            spark, tmp_path, [(1, text, "en")], "train_chunk_windows"
        ).collect()
    )
    assert out == [
        (0, 0, CHUNK_TOKENS),
        (1, CHUNK_STRIDE, CHUNK_TOKENS),
        (2, 2 * CHUNK_STRIDE, 300 - 2 * CHUNK_STRIDE),
    ]


def test_chunk_windows_short_doc_single_chunk(spark, tmp_path):
    rows = [(1, " ".join(f"w{i}" for i in range(10)), "en")]
    out = _run(spark, tmp_path, rows, "train_chunk_windows").collect()
    assert [(r["chunk_id"], r["start_tok"], r["n_chunk_tokens"]) for r in out] == [
        (0, 0, 10)
    ]


def test_chunk_hash_distinguishes_overlapping_chunks(spark, tmp_path):
    text = " ".join(f"w{i}" for i in range(300))
    hashes = [
        r["chunk_hash"]
        for r in _run(
            spark, tmp_path, [(1, text, "en")], "train_chunk_windows"
        ).collect()
    ]
    assert len(set(hashes)) == 3


def test_shard_pack_budget_boundaries(spark, tmp_path):
    # per-doc 900 tokens, budget 2000: cum_before = 0, 900, 1800, 2700...
    # shard ids = 0,0,0,1,1,2 for six docs (shard = floor(cum_before/2000))
    text = " ".join("t" for _ in range(900))
    rows = [(i, text, "en") for i in range(6)]
    out = {
        r["shard_id"]: (r["n_docs"], r["shard_tokens"], r["first_doc"], r["last_doc"])
        for r in _run(spark, tmp_path, rows, "train_shard_pack").collect()
    }
    assert SHARD_TOKENS == 2000
    assert out == {0: (3, 2700, 0, 2), 1: (2, 1800, 3, 4), 2: (1, 900, 5, 5)}


def test_gopher_rules_each_gate_fires(spark, tmp_path):
    ok = "the and " + " ".join(f"word{i}" for i in range(GOPHER_MIN_WORDS))
    too_short = "the and tiny"
    long_words = " ".join("x" * 30 for _ in range(50)) + " the and"
    no_stop = " ".join(f"word{i}" for i in range(50))
    rows = [
        (1, ok, "en"),
        (2, too_short, "en"),
        (3, long_words, "en"),
        (4, no_stop, "en"),
    ]
    out = {
        r["doc_id"]: (
            r["ok_word_count"],
            r["ok_mean_len"],
            r["ok_stopwords"],
            r["keep"],
        )
        for r in _run(spark, tmp_path, rows, "text_gopher_rules").collect()
    }
    assert out[1] == (True, True, True, True)
    assert out[2][0] is False and out[2][3] is False
    assert out[3][1] is False and out[3][3] is False
    assert out[4][2] is False and out[4][3] is False


def test_temperature_rate_is_sqrt_share(spark, tmp_path):
    # lang a: 400 tokens, lang b: 100 -> rate(b) = sqrt(100/400) = 0.5
    rows = [(i, " ".join("t" for _ in range(100)), "a") for i in range(4)]
    rows += [(10, " ".join("t" for _ in range(100)), "b")]
    out = {
        r["lang"]: r["sample_rate"]
        for r in _run(
            spark, tmp_path, rows, "sample_lang_temperature"
        ).collect()
    }
    assert out == {"a": 1.0, "b": 0.5}


def test_quality_classifier_keep_is_integer_exact(spark, tmp_path):
    # keep must equal (weight_sum > 0) and weight_sum must be the sum
    # of per-token bucket weights — recompute in pure Python from the
    # same portable hash.
    import hashlib

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def w(tok):
        b = h60("qc:" + tok) % 1024
        return (h60("qw:" + str(b)) % 2001) - 1000

    text = "alpha beta gamma delta alpha"
    expect = sum(w(t) for t in text.split())
    out = _run(
        spark, tmp_path, [(1, text, "en")], "text_quality_classifier"
    ).collect()[0]
    assert out["weight_sum"] == expect
    assert out["keep"] == (expect > 0)
    assert out["n_tok"] == 5


def test_perplexity_terciles_split_by_score(spark, tmp_path):
    # 6 docs in one lang: 3 made of a REPEATED common bigram (high
    # logprob -> head side), 3 of unique bigrams (low -> tail side).
    common = " ".join(["x y"] * 40)
    rows = [(i, common, "en") for i in range(3)]
    rows += [
        (10 + i, " ".join(f"u{i}w{j}" for j in range(41)), "en")
        for i in range(3)
    ]
    out = {
        r["doc_id"]: (r["ppl_bucket"], r["avg_logprob"])
        for r in _run(
            spark, tmp_path, rows, "text_perplexity_buckets"
        ).collect()
    }
    # the 3 common-bigram docs tie at the best score -> better=0 ->
    # all 'head'. The unique docs are strictly worse (better >= 3 of
    # 6) -> never 'head'; among themselves LM-bucket collisions may
    # split their scores, so only assert bucket order follows score
    # order.
    assert all(out[i][0] == "head" for i in range(3))
    uniq = sorted((out[10 + i] for i in range(3)), key=lambda t: -t[1])
    assert all(b in ("middle", "tail") for b, _ in uniq)
    order = {"head": 0, "middle": 1, "tail": 2}
    assert [order[b] for b, _ in uniq] == sorted(order[b] for b, _ in uniq)
    assert all(out[0][1] > s for _, s in uniq)


def test_perplexity_excludes_sub_bigram_docs(spark, tmp_path):
    rows = [(1, "solo", "en"), (2, "two tokens here ok", "en")]
    out = _run(spark, tmp_path, rows, "text_perplexity_buckets").collect()
    assert [r["doc_id"] for r in out] == [2]
