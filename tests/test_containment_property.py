"""Property-based check of the containment operator: on RANDOM small
corpora (random vocab draws, random planted subset relations), the
Spark bottom-k estimate must equal the exact set-math recomputation
for every reported pair, and every planted full-containment must be
reported. Few examples (Spark job per example), each adversarially
shrunk by hypothesis on failure."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pixcrawler_spark.operators import dedup as dd

K = 16
MAX_DF = 64


def _hashes(text: str) -> set[str]:
    toks = text.split()
    return {
        hashlib.md5(" ".join(toks[i : i + 3]).encode()).hexdigest()
        for i in range(len(toks) - 2)
    }


corpus_strategy = st.lists(
    st.lists(
        st.integers(min_value=0, max_value=120),  # small shared vocab
        min_size=4,
        max_size=40,
    ),
    min_size=3,
    max_size=25,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=corpus_strategy, plant=st.booleans())
def test_containment_equals_set_math_on_random_corpora(
    spark, docs, plant
):
    rows = [
        (i, " ".join(f"w{t}" for t in toks))
        for i, toks in enumerate(docs)
    ]
    if plant and len(rows) >= 2:
        # plant a guaranteed subset: doc N = doc 0's text + suffix
        rows.append((len(rows), rows[0][1] + " zsuf1 zsuf2 zsuf3"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = dd.containment_bottomk_pairs(
        df, "doc_id", "text", n=3, k=K, max_df=MAX_DF, threshold=0.5
    ).toPandas()

    # exact recomputation over the df-capped universe
    hsets = {i: _hashes(t) for i, t in rows}
    dfc: dict[str, int] = {}
    for hs in hsets.values():
        for h in hs:
            dfc[h] = dfc.get(h, 0) + 1
    capped = {
        i: {h for h in hs if dfc[h] <= MAX_DF}
        for i, hs in hsets.items()
    }
    for r in got.itertuples():
        probes = sorted(capped[r.a_id])[:K]
        hits = sum(1 for h in probes if h in capped[r.b_id])
        assert r.n_probe == len(probes)
        assert r.n_hit == hits
        assert hits / len(probes) >= 0.5
    # completeness: every (a, b) whose exact probe containment clears
    # the threshold is reported (the operator prunes NOTHING below df
    # cap)
    for a, sa in capped.items():
        probes = sorted(sa)[:K]
        if not probes:
            continue
        for b, sb in capped.items():
            if a == b:
                continue
            hits = sum(1 for h in probes if h in sb)
            if hits / len(probes) >= 0.5:
                assert (
                    ((got.a_id == a) & (got.b_id == b)).any()
                ), (a, b)
