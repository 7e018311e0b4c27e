"""URL canonicalizer edge cases beyond the registered query's four
synthesized variants, and domain-rank parity with a hand-computed
power iteration on a planted graph."""

from __future__ import annotations

from pyspark.sql import functions as F

from pixcrawler_spark.queries.urlgraph import (
    DAMPING,
    N_ITER,
    canonicalize_url_expr,
)

CASES = [
    # (input, expected canonical)
    ("HTTP://EXAMPLE.COM/", "http://example.com/"),
    ("http://example.com:8080/x", "http://example.com:8080/x"),  # non-default port kept
    ("https://Example.com:443/x?b=2&a=1", "https://example.com/x?a=1&b=2"),
    ("http://a.com/p#frag", "http://a.com/p"),
    ("http://a.com/p?utm_source=s&utm_medium=m", "http://a.com/p"),
    ("http://a.com/CaseSensitive/Path", "http://a.com/CaseSensitive/Path"),
    ("http://a.com/p?x=1=2&y", "http://a.com/p?x=1=2&y"),  # odd params kept verbatim
    ("http://a.com:80/p?c=3&b=2&a=1#f", "http://a.com/p?a=1&b=2&c=3"),
    ("https://a.com:80/p", "https://a.com:80/p"),  # 80 not default for https
]


def test_canonicalizer_edge_cases(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CASES)], "i int, url string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select(
            "i", canonicalize_url_expr(F.col("url")).alias("c")
        ).collect()
    }
    for i, (u, want) in enumerate(CASES):
        assert got[i] == want, f"{u!r}: {got[i]!r} != {want!r}"


def test_canonicalizer_idempotent(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    once = canonicalize_url_expr(F.col("url"))
    rows = df.select(
        once.alias("c1"), canonicalize_url_expr(once).alias("c2")
    ).collect()
    for r in rows:
        assert r["c1"] == r["c2"]


def _hand_rank(edges: list[tuple[int, int]]) -> dict[int, float]:
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    deg: dict[int, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    r = {v: 1.0 / n for v in nodes}
    for _ in range(N_ITER):
        contrib = {v: 0.0 for v in nodes}
        for s, d in edges:
            contrib[d] += r[s] / deg[s]
        r = {v: (1 - DAMPING) / n + DAMPING * contrib[v] for v in nodes}
    return r


def test_domain_rank_matches_hand_iteration(spark, tmp_path):
    import datetime
    import os

    # planted: 0 and 1 both point at 2; 2 points at 0 — node 2 must
    # out-rank the others after any iteration count
    edges = [(0, 2), (1, 2), (2, 0), (3, 1), (3, 2)]
    rows = []
    eid = 0
    for s, d in edges:
        # craft (user_id, event_id) so that user_id%30==s, event_id%29==d
        while eid % 29 != d:
            eid += 1
        rows.append((eid, datetime.datetime(2024, 1, 1), s, "view", 1.0, "{}"))
        eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(os.path.join(str(tmp_path), "events.parquet"))

    from pixcrawler_spark.queries.urlgraph import graph_domain_rank

    got = {
        r["domain"]: r["rank"]
        for r in graph_domain_rank(spark, str(tmp_path)).collect()
    }
    want = _hand_rank(edges)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - round(want[v], 6)) < 1e-9, (v, got[v], want[v])
    assert got[2] == max(got.values())


def test_opic_conserves_cash(spark):
    """OPIC invariants on the declared fixture: total cash equals N
    after every synchronous round (the virtual root returns dangling
    cash), history accumulates exactly one N per round, and the
    importance column is a probability distribution."""
    from pixcrawler_spark.queries.urlgraph import graph_opic_cash

    rows = graph_opic_cash(spark, "/root/testdata/sf0.001").collect()
    n = len(rows)
    assert n > 0
    assert abs(sum(r["cash"] for r in rows) - n) < 1e-3
    assert abs(sum(r["history"] for r in rows) - 2 * n) < 1e-3
    assert abs(sum(r["importance"] for r in rows) - 1.0) < 1e-6
    assert all(r["importance"] >= 0 for r in rows)
