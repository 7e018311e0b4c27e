"""Differential fuzz for RFC 3986 relative-reference resolution:
the Catalyst expression tree in operators/urlresolve.py vs stdlib
``urljoin`` (fragment-dropped), on hypothesis-generated (base, ref)
pairs. One Spark batch for the whole corpus, same harness shape as
the trap-signal fuzz in tests/test_fuzz.py."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pixcrawler_spark.operators.urlresolve import resolve_py, resolve_reference

_SEG = st.text(alphabet="abz09_-", min_size=1, max_size=5)
_DOTS = st.sampled_from([".", ".."])


@st.composite
def _base(draw):
    host = draw(st.text(alphabet="abz09", min_size=1, max_size=8))
    scheme = draw(st.sampled_from(["https", "http"]))
    segs = draw(st.lists(_SEG, min_size=0, max_size=4))
    trail = draw(st.sampled_from(["", "/"])) if segs else ""
    path = "/" + "/".join(segs) + trail if segs else draw(
        st.sampled_from(["", "/"])
    )
    return f"{scheme}://{host}.example{path}"


@st.composite
def _ref(draw):
    kind = draw(st.sampled_from(
        ["empty", "frag", "query", "rel", "rootrel", "protorel", "abs"]
    ))
    if kind == "empty":
        return ""
    if kind == "frag":
        return "#" + draw(st.text(alphabet="abz09", max_size=4))
    if kind == "query":
        return "?" + draw(st.text(alphabet="abz09=&", max_size=6))
    if kind == "protorel":
        return "//" + draw(st.text(alphabet="abz09", min_size=1, max_size=6)) + ".example/x"
    if kind == "abs":
        return "https://" + draw(st.text(alphabet="abz09", min_size=1, max_size=6)) + ".example/p?q=1"
    segs = draw(st.lists(st.one_of(_SEG, _DOTS), min_size=1, max_size=6))
    trail = draw(st.sampled_from(["", "/"]))
    q = draw(st.sampled_from(["", "?a=1", "?b=2&a=1"]))
    lead = "/" if kind == "rootrel" else ""
    return lead + "/".join(segs) + trail + q


def test_resolve_matches_stdlib_urljoin(spark):
    collected: list[tuple[str, str]] = []

    @settings(
        max_examples=400,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(_base(), _ref())
    def _collect(b, r):
        collected.append((b, r))

    _collect()
    corpus = sorted(set(collected))
    assert len(corpus) > 100
    df = spark.createDataFrame(corpus, "base string, ref string")
    got = df.select(
        "base", "ref",
        resolve_reference(F.col("base"), F.col("ref")).alias("resolved"),
    ).collect()
    for row in got:
        want = resolve_py(row["base"], row["ref"])
        assert row["resolved"] == want, (
            row["base"], row["ref"], row["resolved"], want,
        )


def test_resolve_idempotent_on_absolute_results(spark):
    """Resolving a resolved URL against any base returns it unchanged —
    absolute refs must pass through verbatim (frontier idempotence)."""
    pairs = [
        ("https://h.example/a/b/", "../c/./d.html"),
        ("https://h.example", "x/../../y"),
        ("http://h.example/p?k=1", "?k=2"),
    ]
    df = spark.createDataFrame(pairs, "base string, ref string")
    once = df.select(
        "base",
        resolve_reference(F.col("base"), F.col("ref")).alias("r1"),
    )
    twice = once.select(
        "r1",
        resolve_reference(F.col("base"), F.col("r1")).alias("r2"),
    )
    for row in twice.collect():
        assert row["r1"] == row["r2"]
