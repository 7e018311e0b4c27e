"""Invariant tests for the roundeleven batch: containment estimator
vs exact set math, co-citation vs pandas brute force, EWMA closed
form vs the textbook recursion, CUSUM reflected-walk identity vs the
textbook max(0, .) recursion."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from pixcrawler_spark.queries import REGISTRY
from pixcrawler_spark.queries.roundeleven import (
    CONT_K,
    CONT_MAX_DF,
    CONT_THRESHOLD,
    COCIT_DST_MOD,
    COCIT_SRC_MOD,
    CUSUM_H_SD,
    CUSUM_SLACK_SD,
    EWMA_ALPHA,
)

SF = "/root/testdata/sf0.001"


def _shingle_hashes(text: str) -> set[str]:
    toks = text.strip().split()
    return {
        hashlib.md5(" ".join(toks[i : i + 3]).encode()).hexdigest()
        for i in range(len(toks) - 2)
    }


def test_containment_matches_set_math(spark):
    pdf = (
        REGISTRY["dedup_containment_bottomk"].fn(spark, SF).toPandas()
    )
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    hsets = {
        r.doc_id: _shingle_hashes(r.text) for r in docs.itertuples()
    }
    # df-cap: drop hashes present in > CONT_MAX_DF docs
    df_count: dict[str, int] = {}
    for hs in hsets.values():
        for h in hs:
            df_count[h] = df_count.get(h, 0) + 1
    hsets = {
        d: {h for h in hs if df_count[h] <= CONT_MAX_DF}
        for d, hs in hsets.items()
    }
    for r in pdf.itertuples():
        probes = sorted(hsets[r.a_id])[:CONT_K]
        hits = sum(1 for h in probes if h in hsets[r.b_id])
        assert r.n_probe == len(probes), (r.a_id, r.b_id)
        assert r.n_hit == hits
        assert abs(r.containment - round(hits / len(probes), 6)) < 1e-9
        assert r.containment >= CONT_THRESHOLD
    # the fixture contains full-containment (subset-dup) pairs
    assert (pdf["containment"] == 1.0).any()


def test_cocitation_matches_bruteforce(spark):
    pdf = (
        REGISTRY["graph_cocitation_similarity"].fn(spark, SF).toPandas()
    )
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    src = (ev["user_id"] % COCIT_SRC_MOD).astype(int)
    dst = (ev["event_id"] % COCIT_DST_MOD).astype(int)
    edges = {(s, d) for s, d in zip(src, dst) if s != d}
    inlinks: dict[int, set[int]] = {}
    for s, d in edges:
        inlinks.setdefault(d, set()).add(s)
    want = {}
    nodes = sorted(inlinks)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            co = len(inlinks[a] & inlinks[b])
            if co == 0:
                continue
            jac = co / (len(inlinks[a]) + len(inlinks[b]) - co)
            if jac >= 0.4:
                want[(a, b)] = (co, jac)
    got = {
        (r.a, r.b): (r.co, r.jaccard) for r in pdf.itertuples()
    }
    assert set(got) == set(want)
    for k, (co, jac) in want.items():
        assert got[k][0] == co
        assert abs(got[k][1] - round(jac, 6)) < 1e-9


def test_ewma_closed_form_equals_recursion(spark):
    pdf = (
        REGISTRY["crawl_hostload_ewma"]
        .fn(spark, SF)
        .toPandas()
        .set_index("domain")
    )
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    ev["domain"] = "h" + (ev["user_id"] % 50).astype(str)
    for dom, grp in ev.sort_values(["ts", "event_id"]).groupby("domain"):
        ewma = None
        for x in grp["value"]:
            ewma = (
                x
                if ewma is None
                else EWMA_ALPHA * x + (1 - EWMA_ALPHA) * ewma
            )
        row = pdf.loc[dom]
        assert row["n_obs"] == len(grp)
        assert abs(row["ewma_ms"] - ewma) < 1e-3, dom
        assert row["fetches_per_min"] == math.floor(
            60000.0 / max(row["ewma_ms"], 1.0)
        )


def test_cusum_identity_equals_recursion(spark):
    row = (
        REGISTRY["stats_cusum_changepoint"].fn(spark, SF).toPandas().iloc[0]
    )
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    t = (ev["ts"].astype("int64") // 10**9 // 3600).astype(int)
    series = (
        pd.DataFrame({"t": t, "x": ev["value"]})
        .groupby("t")["x"]
        .mean()
        .sort_index()
    )
    mu, sd = series.mean(), series.std(ddof=1)
    s, max_s, alarms, first_alarm = 0.0, 0.0, 0, None
    for ti, x in series.items():
        s = max(0.0, s + x - mu - CUSUM_SLACK_SD * sd)
        max_s = max(max_s, s)
        if s > CUSUM_H_SD * sd:
            alarms += 1
            first_alarm = ti if first_alarm is None else first_alarm
    assert row["n_points"] == len(series)
    assert abs(row["max_s"] - round(max_s, 4)) < 1e-3
    assert row["n_alarms"] == alarms
    if first_alarm is None:
        assert np.isnan(row["first_alarm_t"]) or row["first_alarm_t"] is None
    else:
        assert row["first_alarm_t"] == first_alarm
