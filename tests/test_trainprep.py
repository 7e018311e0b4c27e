"""Unit tests for operators/trainprep.py beyond the registry-oracle
mirror: hand-built fixtures with independently computed expectations
(numpy / pure-Python union-find), edge cases the testdata can't hit
(short docs, PII-free text, long path graphs)."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from pixcrawler_spark.operators import trainprep


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# paragraph_dedup
# ---------------------------------------------------------------------------
def test_paragraph_dedup_keep_first_and_short_docs(spark):
    p1 = " ".join(f"w{i}" for i in range(10))  # shared paragraph
    p2 = " ".join(f"x{i}" for i in range(10))
    p3 = " ".join(f"y{i}" for i in range(10))
    rows = [
        (1, f"{p1} {p2}"),     # first owner of p1 and p2
        (2, f"{p1} {p3} tail tail tail"),  # p1 is a dup; trailing <10 toks ignored
        (3, "only seven tokens here not a para"),  # 8 tokens → 0 paragraphs
        (4, f"{p3} {p3}"),     # p3 dup of doc2's, AND self-dup within doc
    ]
    out = {
        r["doc_id"]: r
        for r in trainprep.paragraph_dedup(
            _docs(spark, rows), "doc_id", "text", 10
        ).collect()
    }
    assert out[1]["n_paras"] == 2 and out[1]["n_dup_paras"] == 0
    assert out[1]["kept_text"] == f"{p1} {p2}"
    assert out[2]["n_paras"] == 2 and out[2]["n_dup_paras"] == 1
    assert out[2]["kept_text"] == p3  # p1 removed (doc1 owns it)
    assert out[3]["n_paras"] == 0 and out[3]["kept_text"] == ""
    assert out[3]["dup_para_fraction"] == 0.0
    # doc4: p3 already owned by doc2 (earlier doc_id) → both copies dup
    assert out[4]["n_paras"] == 2 and out[4]["n_dup_paras"] == 2
    assert out[4]["kept_text"] == "" and out[4]["dup_para_fraction"] == 1.0


# ---------------------------------------------------------------------------
# incremental_paragraph_dedup — round loop through a TableStore
# ---------------------------------------------------------------------------
def test_incremental_paragraph_round_union_equals_batch(spark, tmp_path):
    """Ascending-id rounds through a paragraph-hash store: the union of
    per-round incremental reports equals the batch keep-first, and the
    store accumulates each distinct paragraph hash exactly once."""
    from pixcrawler_spark.sources.tables import TableStore, load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    batch = {
        r["doc_id"]: (
            r["n_paras"], r["n_dup_paras"], r["dup_para_fraction"], r["kept_text"]
        )
        for r in trainprep.paragraph_dedup(d, "doc_id", "text", 10).collect()
    }
    assert any(v[1] > 0 for v in batch.values()), "fixture needs dup paragraphs"

    store = TableStore(spark, str(tmp_path / "parastore"))
    bounds = [(0, 150), (150, 320), (320, 10**9)]  # ascending id ranges
    got = {}
    for rnd, (lo, hi) in enumerate(bounds):
        delta = d.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        if store.exists("para_hashes"):
            corpus_hashes = store.read("para_hashes")
        else:
            corpus_hashes = spark.createDataFrame([], "phash string")
        report, new_hashes = trainprep.incremental_paragraph_dedup(
            delta, corpus_hashes, "doc_id", "text", 10
        )
        for r in report.collect():
            assert r["doc_id"] not in got
            got[r["doc_id"]] = (
                r["n_paras"], r["n_dup_paras"], r["dup_para_fraction"], r["kept_text"]
            )
        store.append("para_hashes", new_hashes, tag=f"round-{rnd}")

    assert got == batch
    # store holds each distinct paragraph hash exactly once
    n_distinct = (
        trainprep.paragraph_hashes(d, "doc_id", "text", 10)
        .select("phash").distinct().count()
    )
    assert store.count("para_hashes") == n_distinct


# ---------------------------------------------------------------------------
# pii_redact
# ---------------------------------------------------------------------------
def test_pii_redact_counts_and_placeholders(spark):
    rows = [
        (1, "reach me at a.b-c_1@sub.example.org or +44 123-4567 now"),
        (2, "server 192.168.0.1 and 10.0.0.255 no mail"),
        (3, "plain text with no pii at all"),
        (4, "x@y.io x@y.io twice"),  # duplicate emails both counted
    ]
    out = {
        r["doc_id"]: r
        for r in trainprep.pii_redact(_docs(spark, rows), "text").collect()
    }
    assert (out[1]["n_emails"], out[1]["n_phones"], out[1]["n_ips"]) == (1, 1, 0)
    assert out[1]["redacted"] == "reach me at <EMAIL> or <PHONE> now"
    assert (out[2]["n_emails"], out[2]["n_phones"], out[2]["n_ips"]) == (0, 0, 2)
    assert out[2]["redacted"] == "server <IP> and <IP> no mail"
    assert (out[3]["n_emails"], out[3]["n_phones"], out[3]["n_ips"]) == (0, 0, 0)
    assert out[3]["redacted"] == rows[2][1]  # untouched
    assert out[4]["n_emails"] == 2
    assert out[4]["redacted"] == "<EMAIL> <EMAIL> twice"


# ---------------------------------------------------------------------------
# token_ngrams / ngram_decontaminate
# ---------------------------------------------------------------------------
def test_ngram_decontaminate_broadcast_membership(spark):
    docs = _docs(
        spark,
        [
            (1, "a b c d e"),      # grams: "a b c", "b c d", "c d e"
            (2, "b c d x y"),      # shares "b c d"
            (3, "p q r s"),        # clean
            (4, "a b"),            # too short → 0 grams
        ],
    )
    bench = spark.createDataFrame([("b c d",), ("zz zz zz",)], "gram string")
    out = {
        r["doc_id"]: r
        for r in trainprep.ngram_decontaminate(
            docs, bench, "doc_id", "text", 3
        ).collect()
    }
    assert (out[1]["total_grams"], out[1]["hit_grams"], out[1]["contaminated"]) == (3, 1, True)
    assert (out[2]["total_grams"], out[2]["hit_grams"], out[2]["contaminated"]) == (3, 1, True)
    assert (out[3]["total_grams"], out[3]["hit_grams"], out[3]["contaminated"]) == (2, 0, False)
    assert (out[4]["total_grams"], out[4]["hit_grams"], out[4]["contaminated"]) == (0, 0, False)


# ---------------------------------------------------------------------------
# connected_components
# ---------------------------------------------------------------------------
def _true_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for n in parent:
        comp[n] = find(n)
    # normalize: component id = min node id in component
    groups = {}
    for n, c in comp.items():
        groups.setdefault(c, []).append(n)
    return {n: min(g) for c, g in groups.items() for n in g}


@pytest.mark.parametrize(
    "edges,iters_exact",
    [
        # two cliques + one star: diameter ≤ 2 → 3 iterations exact
        ([(1, 2), (2, 3), (1, 3), (10, 11), (20, 21), (20, 22), (20, 23)], 3),
        # a 6-node path, diameter 5 → needs ≥ 5 iterations
        ([(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)], 5),
    ],
)
def test_connected_components_matches_union_find(spark, edges, iters_exact):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["node"]: r["comp"]
        for r in trainprep.connected_components(
            df, "id_a", "id_b", iters=iters_exact
        ).collect()
    }
    assert got == _true_components(edges)


def test_connected_components_bounded_iters_are_min_within_hops(spark):
    # path 1-2-3-4-5-6 with 2 iterations: node k sees min id within 2 hops
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["node"]: r["comp"]
        for r in trainprep.connected_components(df, "id_a", "id_b", iters=2).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 3, 6: 4}


# ---------------------------------------------------------------------------
# semantic_dedup
# ---------------------------------------------------------------------------
def test_semantic_dedup_keeps_farthest_from_centroid(spark):
    # centroids = first 2 vectors (axis-aligned); cluster 0 holds three
    # near-identical vectors of descending centroid-similarity; the
    # farthest from the centroid (id 4) must be the one kept. Cluster 1
    # holds a single vector — trivially kept.
    vecs = {
        0: [1.0, 0.0],    # centroid 0
        1: [0.0, 1.0],    # centroid 1 (also its own cluster's only member)
        2: [0.99, 0.14],  # cluster 0, cos_centroid high
        3: [0.97, 0.24],  # cluster 0, mid
        4: [0.94, 0.34],  # cluster 0, lowest cos_centroid → kept
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    out = {
        r["vec_id"]: r
        for r in trainprep.semantic_dedup(
            df, "vec_id", "embedding", k_centroids=2, threshold=0.95
        ).collect()
    }
    a = {i: np.array(v) for i, v in vecs.items()}
    cos = lambda x, y: float(x @ y / (np.linalg.norm(x) * np.linalg.norm(y)))  # noqa: E731
    # sanity on the fixture: 2 and 3 are ≥0.95-dups of 4, so the chain
    # 2→3→4 resolves to the lowest-cos_centroid member 4 (0 is a dup of
    # 2 and 3 but NOT of 4 — dropped pairwise, not transitively kept)
    assert cos(a[2], a[4]) >= 0.95 and cos(a[3], a[4]) >= 0.95
    assert cos(a[0], a[2]) >= 0.95 and cos(a[0], a[4]) < 0.95
    assert {i: out[i]["cluster"] for i in vecs} == {0: 0, 1: 1, 2: 0, 3: 0, 4: 0}
    assert [i for i in sorted(vecs) if out[i]["kept"]] == [1, 4]
    # cos_centroid ordering drove the decision
    assert out[4]["cos_centroid"] < out[3]["cos_centroid"] < out[2]["cos_centroid"]


def test_semantic_dedup_below_threshold_all_kept(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.8, 0.6])],
        "vec_id long, embedding array<double>",
    )
    out = trainprep.semantic_dedup(
        df, "vec_id", "embedding", k_centroids=2, threshold=0.999
    ).collect()
    assert all(r["kept"] for r in out)
