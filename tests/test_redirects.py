"""Redirect-chain resolution: pointer-doubling semantics on shapes the
oracle fixture can't isolate — hand-built graphs where every row's
expected (final, hops, is_cycle) is known exactly."""

from __future__ import annotations

from pyspark.sql import Row

from pixcrawler_spark.operators.redirects import resolve_redirects


def _resolve(spark, nodes, edges, **kw):
    ndf = spark.createDataFrame([Row(url=u) for u in nodes])
    edf = spark.createDataFrame([Row(src=s, dst=d) for s, d in edges])
    out = resolve_redirects(ndf, edf, **kw)
    return {
        r["url"]: (r["final_url"], r["hops"], r["is_cycle"])
        for r in out.collect()
    }


def test_plain_chain_exact_hops(spark):
    # a -> b -> c -> d (terminal)
    got = _resolve(
        spark,
        ["a", "b", "c", "d"],
        [("a", "b"), ("b", "c"), ("c", "d")],
    )
    assert got == {
        "a": ("d", 3, False),
        "b": ("d", 2, False),
        "c": ("d", 1, False),
        "d": ("d", 0, False),
    }


def test_terminal_by_absence(spark):
    # dst never listed as a node or src: still a valid terminal
    got = _resolve(spark, ["a"], [("a", "gone")])
    assert got == {"a": ("gone", 1, False)}


def test_two_cycle_and_feeder_chain(spark):
    # x <-> y, and f2 -> f1 -> x flows INTO the cycle: all four cycle
    got = _resolve(
        spark,
        ["x", "y", "f1", "f2", "t"],
        [("x", "y"), ("y", "x"), ("f1", "x"), ("f2", "f1")],
    )
    assert got["x"] == ("", -1, True)
    assert got["y"] == ("", -1, True)
    assert got["f1"] == ("", -1, True)
    assert got["f2"] == ("", -1, True)
    assert got["t"] == ("t", 0, False)


def test_self_loop(spark):
    got = _resolve(spark, ["s"], [("s", "s")])
    assert got == {"s": ("", -1, True)}


def test_long_chain_within_doubling_budget(spark):
    # chain of length 50 resolves with 6 doublings (2^6 = 64 >= 50)
    n = 50
    names = [f"n{i}" for i in range(n + 1)]
    edges = [(f"n{i}", f"n{i+1}") for i in range(n)]
    got = _resolve(spark, names, edges)
    assert got["n0"] == (f"n{n}", n, False)
    assert got[f"n{n}"] == (f"n{n}", 0, False)


def test_chain_beyond_budget_reported_as_cycle(spark):
    # with max_doublings=2 (reach 4), a 6-hop chain is abandoned the
    # same way a cycle is — the crawler treats both as traps
    names = [f"m{i}" for i in range(7)]
    edges = [(f"m{i}", f"m{i+1}") for i in range(6)]
    got = _resolve(spark, names, edges, max_doublings=2)
    assert got["m0"] == ("", -1, True)
    # nodes 4 hops from the end still resolve
    assert got["m2"] == ("m6", 4, False)
