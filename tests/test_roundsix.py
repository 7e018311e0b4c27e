"""Invariant tests for the round-5 additions: weighted reservoir
sampling (A-ES), triangle counting, embedding decontamination, and
UCB1 bandit scheduling.

The DuckDB oracle equivalence for all three is covered by
tests/test_queries_oracle.py (parameterized over the whole registry)
and the ANSI-on materialization by tests/test_ansi_sweep.py; this file
pins the SEMANTIC invariants the oracle comparison cannot express —
partitioning-independence, exact-K, triangle identities, plan shape.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pixcrawler_spark.queries import REGISTRY
from pixcrawler_spark.queries.roundsix import (
    EMB_DECON_MOD,
    RSV_K,
)

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


# ---------------------------------------------------------------------------
# sample_reservoir_weighted
# ---------------------------------------------------------------------------
def test_reservoir_exact_k_per_lang(spark):
    pdf = REGISTRY["sample_reservoir_weighted"].fn(spark, SF).toPandas()
    counts = pdf.groupby("lang").size()
    n_docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .groupBy("lang")
        .count()
        .toPandas()
        .set_index("lang")["count"]
    )
    for lang, c in counts.items():
        # exactly K when the language has >= K docs, else all of them
        assert c == min(RSV_K, int(n_docs[lang])), (lang, c)


def test_reservoir_partitioning_invariant(spark):
    """The selected set is a pure function of the rows — identical no
    matter how the input is partitioned (the cluster-size
    reproducibility claim in the docstring)."""
    q = REGISTRY["sample_reservoir_weighted"].fn
    base = q(spark, SF).toPandas()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    for nparts in (1, 7):
        docs.repartition(nparts).createOrReplaceTempView("_rsv_probe")
        # re-run the same expression pipeline over the reshuffled input
        from pixcrawler_spark.operators import sketches as sk

        d = spark.table("_rsv_probe")
        u = (
            (
                sk.h60(
                    F.concat(F.lit("rsv:"), F.col("doc_id").cast("string"))
                )
                % 1000000
                + 1
            )
            / F.lit(1000001.0)
        )
        from pyspark.sql import Window

        keyed = d.select(
            "doc_id",
            "lang",
            F.size(F.split(F.trim(F.col("text")), r"\s+"))
            .cast("bigint")
            .alias("n_tok"),
            u.alias("u"),
        ).withColumn(
            "k",
            F.pow(F.col("u"), F.lit(1.0) / F.greatest("n_tok", F.lit(1))),
        )
        w = Window.partitionBy("lang").orderBy(F.desc("k"), F.asc("doc_id"))
        got = (
            keyed.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= RSV_K)
            .select("lang", "doc_id")
            .toPandas()
        )
        a = set(map(tuple, base[["lang", "doc_id"]].itertuples(index=False)))
        b = set(map(tuple, got.itertuples(index=False)))
        assert a == b, f"selection changed at nparts={nparts}"


def test_reservoir_matches_brute_force(spark):
    """Independent reimplementation: compute A-ES priorities in pure
    Python (hashlib md5, math.pow) and take the top-K per lang."""
    import hashlib

    pdf = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "lang", "text")
        .toPandas()
    )

    def prio(row):
        h = int(
            hashlib.md5(f"rsv:{row.doc_id}".encode()).hexdigest()[:15], 16
        )
        u = (h % 1000000 + 1) / 1000001.0
        toks = len(row.text.strip().split()) if row.text.strip() else 1
        w = max(toks, 1)
        return u ** (1.0 / w)

    pdf["k"] = [prio(r) for r in pdf.itertuples()]
    expect = set()
    for lang, grp in pdf.groupby("lang"):
        top = grp.sort_values(["k", "doc_id"], ascending=[False, True]).head(
            RSV_K
        )
        expect |= {(lang, int(d)) for d in top.doc_id}
    got = REGISTRY["sample_reservoir_weighted"].fn(spark, SF).toPandas()
    have = set(map(tuple, got[["lang", "doc_id"]].itertuples(index=False)))
    assert have == expect


def test_reservoir_plan_windowgrouplimit(spark):
    """Scale guard: the per-group top-K must compile to
    WindowGroupLimit (map-side partial top-K, O(K) state per task) —
    a full sort-per-group regression would be quadratic memory on a
    skewed language."""
    df = REGISTRY["sample_reservoir_weighted"].fn(spark, SF01)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


# ---------------------------------------------------------------------------
# graph_triangle_count
# ---------------------------------------------------------------------------
def test_triangle_identities(spark):
    pdf = REGISTRY["graph_triangle_count"].fn(spark, SF01).toPandas()
    # clustering coefficient is a ratio in [0, 1]
    assert (pdf.clustering >= 0).all() and (pdf.clustering <= 1 + 1e-9).all()
    # sum of per-node participation = 3 * number of triangles (each
    # triangle has exactly 3 corners); check divisibility AND signal
    # (the sf0.01 graph is sparse but far from triangle-free)
    assert int(pdf.n_triangles.sum()) % 3 == 0
    assert int(pdf.n_triangles.sum()) > 0
    # a degree-1 node cannot close a triangle
    assert (pdf.loc[pdf.degree < 2, "n_triangles"] == 0).all()


def test_triangle_brute_force(spark):
    """Independent check vs itertools over the materialized edge set
    (sf0.01: ~10k edges, ~5.6k triangles — enough signal that an
    enumeration bug cannot hide behind an empty graph)."""
    from itertools import combinations

    from pixcrawler_spark.queries.roundsix import _TRI_DST, _TRI_SRC

    ev = spark.read.parquet(f"{SF01}/events.parquet").toPandas()
    edges = set()
    for r in ev.itertuples():
        a, b = r.user_id % _TRI_SRC, r.event_id % _TRI_DST
        if a != b:
            edges.add((min(a, b), max(a, b)))
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expect: dict[int, int] = {n: 0 for n in adj}
    for n, nbrs in adj.items():
        for x, y in combinations(sorted(nbrs), 2):
            if x > n and y > n and (min(x, y), max(x, y)) in edges:
                for c in (n, x, y):
                    expect[c] += 1
    assert sum(expect.values()) > 0  # signal: the fixture has triangles
    pdf = REGISTRY["graph_triangle_count"].fn(spark, SF01).toPandas()
    got = dict(zip(pdf.domain, pdf.n_triangles))
    assert got == expect
    deg = dict(zip(pdf.domain, pdf.degree))
    assert deg == {n: len(v) for n, v in adj.items()}


def test_triangle_oriented_outdegree_bounded(spark):
    """The (degree, id) orientation's scale claim: max oriented
    out-degree stays O(sqrt(E)) — verify on the fixture graph."""
    from pixcrawler_spark.queries.roundsix import _TRI_DST, _TRI_SRC

    ev = spark.read.parquet(f"{SF01}/events.parquet")
    u = (F.col("user_id") % _TRI_SRC).cast("long")
    v = (F.col("event_id") % _TRI_DST).cast("long")
    und = (
        ev.select(F.least(u, v).alias("lo"), F.greatest(u, v).alias("hi"))
        .where(F.col("lo") != F.col("hi"))
        .distinct()
    )
    n_edges = und.count()
    deg = (
        und.select(F.col("lo").alias("node"))
        .unionAll(und.select(F.col("hi").alias("node")))
        .groupBy("node")
        .count()
    ).toPandas()
    order = {
        int(r.node): (int(r["count"]), int(r.node))
        for _, r in deg.iterrows()
    }
    out: dict[int, int] = {}
    for r in und.toPandas().itertuples():
        src = r.lo if order[r.lo] < order[r.hi] else r.hi
        out[src] = out.get(src, 0) + 1
    # Chiba-Nishizeki bound: oriented out-degree <= ~sqrt(2E) + small
    assert max(out.values()) <= int(math.sqrt(2 * n_edges)) + 2


# ---------------------------------------------------------------------------
# text_decontaminate_embedding
# ---------------------------------------------------------------------------
def test_decontaminate_embedding_invariants(spark):
    pdf = REGISTRY["text_decontaminate_embedding"].fn(spark, SF01).toPandas()
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet").toPandas()
    corpus_ids = set(emb.vec_id[emb.vec_id % EMB_DECON_MOD != 0])
    # exactly the corpus (benchmarks excluded), one row each
    assert set(pdf.vec_id) == corpus_ids and len(pdf) == len(corpus_ids)
    # cosine bounds
    assert (pdf.max_benchmark_cosine <= 1 + 1e-6).all()
    assert (pdf.max_benchmark_cosine >= -1 - 1e-6).all()
    # the flag is consistent with the reported score
    from pixcrawler_spark.queries.roundsix import EMB_DECON_TAU

    hot = pdf.max_benchmark_cosine >= EMB_DECON_TAU + 1e-6
    cold = pdf.max_benchmark_cosine <= EMB_DECON_TAU - 1e-6
    assert (pdf.loc[hot, "contaminated"] == 1).all()
    assert (pdf.loc[cold, "contaminated"] == 0).all()


def test_decontaminate_embedding_matches_numpy(spark):
    """Independent max-cosine via numpy over the same split."""
    import numpy as np

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").toPandas()
    mat = np.array(emb.embedding.tolist(), dtype=np.float64)
    norm = np.linalg.norm(mat, axis=1)
    is_b = (emb.vec_id % EMB_DECON_MOD == 0).to_numpy()
    sims = (mat[~is_b] @ mat[is_b].T) / np.outer(norm[~is_b], norm[is_b])
    expect = dict(
        zip(emb.vec_id[~is_b], np.round(sims.max(axis=1), 6))
    )
    pdf = REGISTRY["text_decontaminate_embedding"].fn(spark, SF).toPandas()
    for r in pdf.itertuples():
        assert abs(expect[r.vec_id] - r.max_benchmark_cosine) <= 1e-6, (
            r.vec_id
        )


def test_decontaminate_embedding_no_corpus_shuffle(spark):
    """Scale guard: the corpus side must stay a pure map — the only
    Exchanges allowed are the under-split-guard RoundRobin repartition
    (load_table), the 1-row benchmark collect, and its broadcast. No
    hash-partitioning of the corpus (a groupBy regression would
    shuffle 100 TB)."""
    df = REGISTRY["text_decontaminate_embedding"].fn(spark, SF01)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan.lower()


# ---------------------------------------------------------------------------
# crawl_bandit_ucb
# ---------------------------------------------------------------------------
def test_bandit_ucb_matches_brute_force(spark):
    """Independent UCB1 computation over the full arm set; the Spark
    top-K must equal the brute-force top-K under the same (ucb desc,
    domain asc) order."""
    import math as m

    from pixcrawler_spark.queries.roundsix import (
        UCB_REWARD_THRESHOLD,
        UCB_TOP_K,
    )

    ev = spark.read.parquet(f"{SF01}/events.parquet").toPandas()
    ev["domain"] = ev.user_id % 50
    ev["reward"] = (ev.value > UCB_REWARD_THRESHOLD).astype(int)
    g = ev.groupby("domain").agg(
        n_pulls=("reward", "size"), n_rewards=("reward", "sum")
    )
    n_total = int(g.n_pulls.sum())
    g["ucb_raw"] = g.n_rewards / g.n_pulls + (
        (2.0 * m.log(n_total) / g.n_pulls) ** 0.5
    )
    expect = (
        g.sort_values(["ucb_raw", "domain"], ascending=[False, True])
        .head(UCB_TOP_K)
        .reset_index()
    )
    got = REGISTRY["crawl_bandit_ucb"].fn(spark, SF01).toPandas()
    assert list(got.domain) == list(expect.domain)
    assert list(got.n_pulls) == list(expect.n_pulls.astype(int))
    for a, b in zip(got.ucb_score, expect.ucb_raw):
        assert abs(a - round(b, 6)) <= 1e-9


def test_bandit_ucb_optimism_property(spark):
    """The UCB bonus must favor under-sampled arms: among returned
    rows with equal mean_reward, fewer pulls => strictly higher
    ucb_score (the exploration guarantee)."""
    pdf = REGISTRY["crawl_bandit_ucb"].fn(spark, SF01).toPandas()
    for mean, grp in pdf.groupby("mean_reward"):
        if len(grp) < 2:
            continue
        g = grp.sort_values("n_pulls")
        scores = list(g.ucb_score)
        assert scores == sorted(scores, reverse=True), (mean, scores)


def test_bandit_ucb_plan_take_ordered(spark):
    """Scale guard: the top-K must be TakeOrderedAndProject (partial
    per-partition top-K), never a global Sort."""
    df = REGISTRY["crawl_bandit_ucb"].fn(spark, SF01)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# graph_label_propagation
# ---------------------------------------------------------------------------
def _lpa_brute(sf_dir, spark):
    """Independent pandas LPA with the same deterministic argmax."""
    from collections import Counter

    from pixcrawler_spark.queries.roundsix import (
        _LPA_DST,
        _LPA_SRC,
        LPA_ROUNDS,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    edges = set()
    for u, v in zip(ev.user_id % _LPA_SRC, ev.event_id % _LPA_DST):
        u, v = int(u), int(v)
        if u != v:
            edges.add((min(u, v), max(u, v)))
    nbrs: dict[int, list[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    labels = {n: n for n in nbrs}
    for _ in range(LPA_ROUNDS):
        nxt = {}
        for n, ns in nbrs.items():
            c = Counter(labels[m] for m in ns)
            # max count, then smallest label
            nxt[n] = min((-cnt, lab) for lab, cnt in c.items())[1]
        labels = nxt
    return labels


def test_lpa_matches_brute_force(spark):
    labels = _lpa_brute(SF, spark)
    from collections import Counter

    sizes = Counter(labels.values())
    expect = {
        lab: (
            cnt,
            min(n for n, l2 in labels.items() if l2 == lab),
            max(n for n, l2 in labels.items() if l2 == lab),
        )
        for lab, cnt in sizes.items()
    }
    got = REGISTRY["graph_label_propagation"].fn(spark, SF).toPandas()
    assert len(got) == len(expect)
    for row in got.itertuples():
        cnt, lo, hi = expect[row.community]
        assert (row.n_members, row.min_member, row.max_member) == (
            cnt,
            lo,
            hi,
        ), row


def test_lpa_members_partition_nodes(spark):
    """Community sizes must sum to the node count: every node gets
    exactly one label (synchronous update, no drops)."""
    got = REGISTRY["graph_label_propagation"].fn(spark, SF01).toPandas()
    labels = _lpa_brute(SF01, spark)
    assert int(got.n_members.sum()) == len(labels)
    assert (got.min_member >= 0).all()
    assert (got.min_member <= got.max_member).all()


# ---------------------------------------------------------------------------
# crawl_shard_rendezvous
# ---------------------------------------------------------------------------
def test_hrw_minimal_remap(spark):
    """Growing the fleet by one shard must remap roughly 1/17 of hosts
    (HRW's minimal-disruption guarantee); modulo hashing would remap
    ~15/16. Tolerance: binomial 5 sigma on the fixture's host count."""
    from pixcrawler_spark.queries.roundsix import HRW_SHARDS_GROWN

    pdf = REGISTRY["crawl_shard_rendezvous"].fn(spark, SF01).toPandas()
    n_hosts = int(pdf.n_hosts.sum())
    n_remap = int(pdf.n_remapped.sum())
    p = 1.0 / HRW_SHARDS_GROWN
    sigma = (n_hosts * p * (1 - p)) ** 0.5
    assert abs(n_remap - n_hosts * p) <= 5 * sigma, (n_remap, n_hosts)


def test_hrw_remaps_go_to_new_shard_only(spark):
    """Every remapped host must land on the NEW shard — an existing
    host never moves between surviving shards (per-host politeness
    clocks on old shards are undisturbed)."""
    from pixcrawler_spark.operators import sketches as sk
    from pixcrawler_spark.queries.roundsix import (
        HRW_HOST_MOD,
        HRW_SHARDS,
        HRW_SHARDS_GROWN,
    )

    ev = spark.read.parquet(f"{SF01}/events.parquet")
    hosts = ev.select(
        F.concat(
            F.lit("h"), (F.col("user_id") % HRW_HOST_MOD).cast("string")
        ).alias("host")
    ).distinct()

    def assign(n):
        return (
            -F.array_max(
                F.array(
                    *[
                        F.struct(
                            sk.h60(
                                F.concat(
                                    F.lit("hrw:"),
                                    F.col("host"),
                                    F.lit(f":{s}"),
                                )
                            ).alias("score"),
                            F.lit(-s).cast("bigint").alias("nshard"),
                        )
                        for s in range(n)
                    ]
                )
            ).getField("nshard")
        ).cast("bigint")

    pdf = hosts.select(
        assign(HRW_SHARDS).alias("s16"),
        assign(HRW_SHARDS_GROWN).alias("s17"),
    ).toPandas()
    moved = pdf[pdf.s16 != pdf.s17]
    assert len(moved) > 0
    assert (moved.s17 == HRW_SHARDS_GROWN - 1).all()


def test_hrw_balance(spark):
    """HRW load balance: no shard holds more than 2x the mean host
    count (uniform hashing over 16 shards, ~94 hosts/shard expected)."""
    pdf = REGISTRY["crawl_shard_rendezvous"].fn(spark, SF01).toPandas()
    from pixcrawler_spark.queries.roundsix import HRW_SHARDS

    assert len(pdf) == HRW_SHARDS  # every shard got SOME host
    mean = pdf.n_hosts.mean()
    assert pdf.n_hosts.max() <= 2 * mean, pdf.n_hosts.describe()


def test_hrw_assignment_map_only(spark):
    """Scale guard: after the host distinct, the shard argmax must be
    a pure projection — exactly ONE exchange in the whole plan (the
    distinct) plus the single final 16-key agg."""
    df = REGISTRY["crawl_shard_rendezvous"].fn(spark, SF01)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # distinct + bounded final agg = at most 2 shuffle exchanges; the
    # argmax itself must add none
    assert plan.lower().count("exchange hashpartitioning") <= 2, plan


# ---------------------------------------------------------------------------
# sample_holdout_split
# ---------------------------------------------------------------------------
def test_holdout_fractions_and_stability(spark):
    """Split fractions must be ~80/10/10 per language, and a doc's
    split must be a pure function of doc_id (identical across two
    independent evaluations)."""
    a = REGISTRY["sample_holdout_split"].fn(spark, SF01).toPandas()
    b = REGISTRY["sample_holdout_split"].fn(spark, SF01).toPandas()
    key = ["lang", "split"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )
    total = a.groupby("lang").n_docs.sum()
    for (lang, split), grp in a.groupby(["lang", "split"]):
        frac = grp.n_docs.iloc[0] / total[lang]
        want = {"train": 0.8, "val": 0.1, "test": 0.1}[split]
        n = total[lang]
        sigma = (want * (1 - want) / n) ** 0.5
        assert abs(frac - want) <= 6 * sigma + 1.0 / n, (lang, split, frac)


def test_holdout_covers_corpus_exactly(spark):
    """The three splits partition the corpus: n_docs sums to the table
    count and every (lang, split) frac sums to 1 per lang."""
    pdf = REGISTRY["sample_holdout_split"].fn(spark, SF01).toPandas()
    n = spark.read.parquet(f"{SF01}/documents.parquet").count()
    assert int(pdf.n_docs.sum()) == n
    for lang, grp in pdf.groupby("lang"):
        assert set(grp.split) == {"train", "val", "test"}
        assert abs(grp.frac.sum() - 1.0) <= 0.0005  # rounding to 4dp


# ---------------------------------------------------------------------------
# text_char_entropy
# ---------------------------------------------------------------------------
def test_char_entropy_matches_numpy(spark):
    """Independent numpy entropy over the same capped prefix."""
    from collections import Counter

    import numpy as np

    from pixcrawler_spark.queries.roundsix import ENT_CAP

    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    got = (
        REGISTRY["text_char_entropy"].fn(spark, SF).toPandas()
        .set_index("doc_id")
    )
    for row in docs.itertuples():
        t = (row.text or "")[:ENT_CAP]
        n = max(len(t), 1)
        counts = np.array(list(Counter(t if t else [""]).values()))
        p = counts / n
        ent = float(-(p * np.log2(p)).sum())
        assert abs(got.loc[row.doc_id].char_entropy - round(ent, 4)) <= 1e-9


def test_char_entropy_flags_planted_extremes(spark):
    """Planted fixtures: repeated-char spam flags 'low', base64-ish
    noise flags 'high', the organic corpus is overwhelmingly 'ok'."""
    import pandas as pd

    from pixcrawler_spark.queries.roundsix import ENT_CAP

    planted = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": [
                    "spam " * 400,  # ~2.0 bits/char
                    "".join(  # deterministic base64-ish junk
                        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
                        "0123456789+/"[(7 * i) % 64]
                        for i in range(ENT_CAP)
                    ),
                ],
                "lang": ["en", "en"],
                "source": ["t", "t"],
                "n_chars": [2000, ENT_CAP],
            }
        )
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        planted.write.parquet(f"{td}/documents.parquet")
        pdf = (
            REGISTRY["text_char_entropy"].fn(spark, td).toPandas()
            .set_index("doc_id")
        )
    assert pdf.loc[1].entropy_flag == "low", pdf.loc[1].char_entropy
    assert pdf.loc[2].entropy_flag == "high", pdf.loc[2].char_entropy
    corpus = REGISTRY["text_char_entropy"].fn(spark, SF).toPandas()
    assert (corpus.entropy_flag == "ok").mean() > 0.95


def test_char_entropy_map_only(spark):
    """Scale guard: per-doc entropy is a pure projection — no shuffle
    exchange anywhere in the plan."""
    df = REGISTRY["text_char_entropy"].fn(spark, SF01)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan.lower(), plan
