"""Property fuzz: crawl inputs are UNTRUSTED. Decoders must return a
value or None for ANY byte string — never raise; the URL canonicalizer
must be total and idempotent over arbitrary URL-ish text."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pixcrawler_spark.operators.multimodal import (
    _decode_bmp,
    _decode_png,
    _sniff_format,
)

_BMP_SIG = b"BM"
_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_JPG_SIG = b"\xff\xd8\xff"


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=512))
def test_sniff_never_raises(payload):
    _sniff_format(payload)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=4096))
def test_bmp_decode_never_raises(tail):
    assert _decode_bmp(_BMP_SIG + tail) is None or True


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=4096))
def test_png_decode_never_raises(tail):
    assert _decode_png(_PNG_SIG + tail) is None or True


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=4096))
def test_jpeg_decode_never_raises(tail):
    from pixcrawler_spark.operators.jpegcodec import jpeg_decode

    assert jpeg_decode(_JPG_SIG + tail) is None or True


# one executor-side pass over a hypothesis-free deterministic corpus of
# adversarial URL strings: totality + idempotence of the canonicalizer
# column expression (hypothesis drives pure-python strategies; the
# Spark round-trip is batched once for speed)
_URL_ALPHABET = st.text(
    alphabet="abcXYZ09:/?&=#%._-'\"\\ \té中", max_size=40
)


@settings(max_examples=60, deadline=None)
@given(_URL_ALPHABET)
def test_canonicalize_pure_mirror_total(s):
    """The canonicalizer is regexp/array ops only — mirror its pieces
    in python to assert the REGEXES are total (no catastrophic
    backtracking, no exceptions) over adversarial input."""
    import re

    re.sub(r"^[A-Za-z][A-Za-z0-9+.\-]*://", "", s)
    re.sub(r"#.*$", "", s)
    m = re.match(r"^([^/?]*)", s)
    assert m is not None
    re.sub(r":[0-9]+$", "", s)


def test_canonicalize_spark_idempotent_on_adversarial_corpus(spark):
    from pyspark.sql import functions as F

    from pixcrawler_spark.queries.urlgraph import canonicalize_url_expr

    corpus = [
        "", "http://", "https://:443", "http://#", "http://?",
        "http://a.com??&&##", "HTTP://A.COM:0080/x",
        "ftp://Weird.Host:21/Path?b&a", "http://a.com/p?utm_=1&utm=2",
        "no-scheme-at-all", "://missing", "http://h/p?a=1&a=1&a=0",
        "http://h:99999999999/p", "http://[::1]:80/p",
        "http://h/p#frag#frag2", "x" * 200,
        "http://h/p?" + "&".join(f"k{i}=v" for i in range(50)),
    ]
    df = spark.createDataFrame([(u,) for u in corpus], "url string")
    once = canonicalize_url_expr(F.col("url"))
    rows = df.select(
        once.alias("c1"), canonicalize_url_expr(once).alias("c2")
    ).collect()
    for r in rows:
        assert r["c1"] == r["c2"], (r["c1"], r["c2"])


# ---------------------------------------------------------------------------
# Trap-signal differential fuzz: the Catalyst expressions in
# operators/traps.py vs the scalar Python reference trap_py, on
# arbitrary url-shaped strings (not just the fixture variants).
# One Spark batch for the whole corpus (per-example Spark jobs would
# take minutes); hypothesis drives the generation deterministically.
# ---------------------------------------------------------------------------
def _urlish(draw):
    from hypothesis import strategies as st

    scheme = draw(st.sampled_from(["https://", "http://", "", "ftp://"]))
    host = draw(st.text(
        alphabet="abcz09.-", min_size=0 if not scheme else 1, max_size=12
    ))
    seg = st.text(alphabet="abcx12 .%~_", min_size=0, max_size=6)
    path = "/".join(draw(st.lists(seg, min_size=0, max_size=10)))
    q = draw(st.sampled_from([
        "", "?a=1", "?phpsessid=x&b=2", "?a=1&b=2&c=3&d=4&e=5",
        "??double", "?a&&b", "?SessionID=9",
    ]))
    cal = draw(st.sampled_from(["", "/2024/07/", "/1999/12/", "/20ab/01/"]))
    return f"{scheme}{host}/{path}{cal}{q}"


def test_trap_signals_match_python_reference(spark):
    from hypothesis import strategies as st

    from pixcrawler_spark.operators.traps import trap_py, trap_signals

    urls = st.composite(_urlish)
    # collect a deterministic corpus with one @given pass, then verify
    # it against Spark in a single batch job
    from hypothesis import HealthCheck, given, settings

    collected: list[str] = []

    @settings(
        max_examples=400,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(urls())
    def _collect(u):
        collected.append(u)

    _collect()
    corpus = sorted(set(collected))
    assert len(corpus) > 100
    df = spark.createDataFrame([(u,) for u in corpus], "url string")
    got = {r["url"]: r for r in trap_signals(df).collect()}
    for u in corpus:
        want = trap_py(u)
        g = got[u]
        for k, v in want.items():
            assert g[k] == v, (u, k, g[k], v)
