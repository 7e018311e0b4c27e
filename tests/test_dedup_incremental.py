"""Incremental (delta-vs-corpus) MinHash dedup round loop.

The contract (operators/dedup.py incremental_minhash_pairs): corpus
signatures are computed once — in the round their documents arrived —
and appended to a TableStore; each later round band-joins only its
delta against the accumulated signatures. Over all rounds, the UNION of
the per-round incremental pairs must equal the batch recompute's pairs
exactly: a pair (a, b) surfaces in the round its later member arrives,
and never twice (delta ids are disjoint from corpus ids by the seen-set
contract).
"""

from pyspark.sql import functions as F

from pixcrawler_spark.operators import dedup
from pixcrawler_spark.sources.tables import TableStore

N_HASHES = 8
BAND = 2
THRESH = 0.5
N_ROUNDS = 3


def _docs(spark, sf_dir="/root/testdata/sf0.001"):
    from pixcrawler_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "documents")


def test_round_union_equals_batch(spark, tmp_path):
    d = _docs(spark).select("doc_id", "text")

    # --- batch ground truth -------------------------------------------------
    batch = {
        (r["id_a"], r["id_b"], r["est_jaccard"])
        for r in dedup.minhash_estimated_pairs(
            d, "doc_id", "text", num_hashes=N_HASHES,
            band_size=BAND, min_est=THRESH,
        ).collect()
    }
    assert batch, "fixture must contain near-duplicate documents"

    # --- round loop through the store ---------------------------------------
    store = TableStore(spark, str(tmp_path / "sigstore"))
    got: set = set()
    per_round_counts = []
    for rnd in range(N_ROUNDS):
        delta = d.where(F.col("doc_id") % N_ROUNDS == rnd)
        delta_sigs = dedup.minhash_signatures(
            delta, "doc_id", "text", num_hashes=N_HASHES
        )
        if store.exists("corpus_sigs"):
            corpus_sigs = store.read("corpus_sigs")
        else:
            corpus_sigs = spark.createDataFrame([], delta_sigs.schema)
        pairs = dedup.incremental_minhash_pairs(
            delta_sigs, corpus_sigs, "doc_id",
            num_hashes=N_HASHES, band_size=BAND, min_est=THRESH,
        ).collect()
        rows = {(r["id_a"], r["id_b"], r["est_jaccard"]) for r in pairs}
        assert not (rows & got), "a pair must surface in exactly one round"
        got |= rows
        per_round_counts.append(len(rows))
        # the round's signatures become corpus for the next round —
        # computed exactly once, appended, never recomputed
        store.append("corpus_sigs", delta_sigs, tag=f"round-{rnd}")

    assert got == batch, (
        f"union over rounds ({len(got)} pairs, per-round {per_round_counts}) "
        f"!= batch recompute ({len(batch)} pairs)"
    )
    # every document's signatures live in the store exactly once
    assert store.count("corpus_sigs") == d.count() - d.where(
        F.size(F.split(F.col("text"), r"\s+")) < 3
    ).count()


def test_first_round_empty_corpus(spark):
    """Round 0 (empty corpus) degrades to plain batch dedup of the delta."""
    d = _docs(spark).select("doc_id", "text")
    sigs = dedup.minhash_signatures(d, "doc_id", "text", num_hashes=N_HASHES)
    empty = spark.createDataFrame([], sigs.schema)
    inc = {
        (r["id_a"], r["id_b"])
        for r in dedup.incremental_minhash_pairs(
            sigs, empty, "doc_id", num_hashes=N_HASHES,
            band_size=BAND, min_est=THRESH,
        ).collect()
    }
    batch = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_estimated_pairs(
            d, "doc_id", "text", num_hashes=N_HASHES,
            band_size=BAND, min_est=THRESH,
        ).collect()
    }
    assert inc == batch
