"""Product quantization (operators/pq.py): the Spark operator must
equal a straight-line numpy reference of the same algorithm, the
encode plan must stay map-only (no window, no hash-shuffle), and the
ADC→exact-rerank ladder must hit its measured recall on the fixture.
Oracle parity of the two registered queries (ann_pq_adc_topk,
ann_ivfpq_topk) is covered by test_queries_oracle.py like every other
registry entry."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pixcrawler_spark.operators import pq, similarity


def _numpy_pq(vecs: np.ndarray, n_codewords: int, n_sub: int,
              sub_dim: int):
    """Independent reference: first-K codebook of subspace slices,
    rounded double d2, first-min argmin, ADC table from vector 0."""
    n = len(vecs)
    codes = np.zeros((n, n_sub), dtype=int)
    dt = np.zeros((n_sub, n_codewords))
    for m in range(n_sub):
        sl = vecs[:, m * sub_dim:(m + 1) * sub_dim]
        cb = sl[:n_codewords]
        d2 = np.round(
            ((sl[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2), 6
        )
        codes[:, m] = d2.argmin(axis=1)  # argmin = first min = smallest c
        dt[m] = d2[0]
    adc = np.round(dt[np.arange(n_sub)[None, :], codes].sum(axis=1), 6)
    return codes, adc


def _df(spark, vecs: np.ndarray):
    return spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<float>",
    )


def test_pq_encode_matches_numpy_and_self_quantizes(spark):
    n, ks, m, sub = 200, 16, 4, 4
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(n, m * sub)).round(3)
    df = _df(spark, vecs)
    cb = pq.pq_codebook_row(df, "vec_id", "embedding", ks, m, sub)
    got = {
        r["vec_id"]: list(r["codes"])
        for r in pq.pq_encode(df, cb, "vec_id", "embedding", m, sub).collect()
    }
    want, _ = _numpy_pq(vecs.astype(np.float32).astype(np.float64), ks, m, sub)
    assert len(got) == n
    for i in range(n):
        assert got[i] == list(want[i]), f"row {i}"
        assert all(0 <= c < ks for c in got[i])
    # a codeword-source row is its own nearest codeword (d2 = 0)
    for i in range(ks):
        assert got[i] == [i] * m


def test_pq_encode_plan_is_map_only(spark, sf_dir):
    """The 100 TB claim in code: quantizing the corpus must not
    shuffle it. Only the K-row codebook fold may exchange (a
    SinglePartition exchange of ``n_codewords`` rows); the corpus side
    is scan → broadcast-join → project, with no Window anywhere."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb = pq.pq_codebook_row(e, "vec_id", "embedding", 16, 8, 8)
    plan = (
        pq.pq_encode(e, cb, "vec_id", "embedding", 8, 8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    assert "Exchange hashpartitioning" not in plan
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


def test_pq_adc_topk_matches_numpy_reference(spark):
    n, ks, m, sub = 150, 8, 4, 4
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(n, m * sub)).round(3)
    df = _df(spark, vecs)
    got = [
        (r["vec_id"], r["approx_d2"])
        for r in pq.pq_adc_topk(
            df, "vec_id", "embedding", query_id=0, k=10,
            n_codewords=ks, n_sub=m, sub_dim=sub,
        ).collect()
    ]
    _, adc = _numpy_pq(vecs.astype(np.float32).astype(np.float64), ks, m, sub)
    order = np.lexsort((np.arange(n), adc))[:10]
    want = [(int(i), float(adc[i])) for i in order]
    assert [i for i, _ in got] == [i for i, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert abs(a - b) < 2e-6


def test_pq_rerank_recall_ladder(spark, sf_dir):
    """Measured ladder on the uniform-random fixture (the adversarial
    no-cluster case): pure ADC recall@10 = 0.3, exact rerank of the
    ADC-100 shortlist = 0.8 — rerank trades one bounded exact-read
    batch for recall, as documented in pq.pq_adc_topk."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = e.orderBy("vec_id").collect()
    vecs = np.array([r["embedding"] for r in rows], dtype=np.float64)
    exact = ((vecs - vecs[0]) ** 2).sum(axis=1)
    truth = set(np.lexsort((np.arange(len(vecs)), exact))[:10].tolist())

    def recall(df):
        return len({r["vec_id"] for r in df.collect()} & truth) / 10

    adc = pq.pq_adc_topk(e, "vec_id", "embedding", 0, k=10,
                         n_codewords=16, n_sub=8, sub_dim=8)
    rr = pq.pq_adc_topk(e, "vec_id", "embedding", 0, k=10,
                        n_codewords=16, n_sub=8, sub_dim=8, rerank=100)
    r_adc, r_rr = recall(adc), recall(rr)
    assert r_rr >= r_adc
    assert r_rr >= 0.8
    # reranked distances are the EXACT ones for the returned ids
    for r in rr.collect():
        assert r["d2"] == pytest.approx(
            round(float(exact[r["vec_id"]]), 6), abs=2e-6
        )


def test_ivfpq_results_subset_of_probed_lists(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    kc = similarity.centroids_for(512)
    npb = similarity.nprobe_for(kc)
    cand = similarity.ivf_candidates(
        e, "vec_id", "embedding", query_id=0, k_centroids=kc, nprobe=npb
    ).select("vec_id")
    cand_ids = {r["vec_id"] for r in cand.collect()}
    got = pq.pq_adc_topk(
        e, "vec_id", "embedding", 0, k=10,
        n_codewords=16, n_sub=8, sub_dim=8, candidates=cand,
    )
    ids = [r["vec_id"] for r in got.collect()]
    assert len(ids) == 10
    assert set(ids) <= cand_ids
    # flat PQ over the same corpus assigns the same ADC distance to a
    # shared id (candidate restriction cannot change the metric)
    flat = {
        r["vec_id"]: r["approx_d2"]
        for r in pq.pq_adc_topk(
            e, "vec_id", "embedding", 0, k=10,
            n_codewords=16, n_sub=8, sub_dim=8,
        ).collect()
    }
    for r in got.collect():
        if r["vec_id"] in flat:
            assert r["approx_d2"] == flat[r["vec_id"]]


def test_pq_stored_codes_round_loop(spark, sf_dir, tmp_path):
    """Deployment shape: encode each round's delta ONCE, append the
    8-byte codes to a TableStore, answer queries from the stored codes
    — identical results to encode-at-query-time, with the encode cost
    paid per delta, not per query (mirrors the incremental-minhash
    signature store)."""
    from pyspark.sql import functions as F

    from pixcrawler_spark.sources.tables import TableStore

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cb = pq.pq_codebook_row(e, "vec_id", "embedding", 16, 8, 8)
    store = TableStore(spark, str(tmp_path / "codes"))
    for rnd in range(3):
        delta = e.where(F.col("vec_id") % 3 == rnd)
        store.append("codes", pq.pq_encode(
            delta, cb, "vec_id", "embedding", 8, 8))
    stored = store.read("codes")
    assert stored.count() == e.count()

    from_store = pq.pq_adc_topk(
        e, "vec_id", "embedding", 0, k=10,
        n_codewords=16, n_sub=8, sub_dim=8, codes=stored,
    ).collect()
    from_scratch = pq.pq_adc_topk(
        e, "vec_id", "embedding", 0, k=10,
        n_codewords=16, n_sub=8, sub_dim=8,
    ).collect()
    assert [(r["vec_id"], r["approx_d2"]) for r in from_store] == [
        (r["vec_id"], r["approx_d2"]) for r in from_scratch
    ]


def test_codewords_for_derivation():
    """K tracks √n as a power of two, capped at the production 256
    (byte codes): the first-K codebook stays meaningful at every
    corpus scale without resizing the code column."""
    assert pq.codewords_for(4) == 4
    assert pq.codewords_for(512) == 16
    assert pq.codewords_for(262144) == 256
    assert pq.codewords_for(10**10) == 256  # capped: codes stay 1 byte
