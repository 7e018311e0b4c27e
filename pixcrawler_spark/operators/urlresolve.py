"""RFC 3986 §5 relative-reference resolution as pure JVM expressions.

Every outlink a crawler extracts from HTML is usually RELATIVE
(``../up.html``, ``./same``, ``//cdn.example/x``, ``?page=2``) and must
be resolved against the page's base URL before it can enter the
frontier, the seen-set join, or the politeness key — otherwise every
relative form of the same page is a distinct frontier row. The
reference never faces this (its SERP engines hand it absolute image
URLs — backend downloader consumes ``result['url']`` directly); at
web scale reference resolution IS the outlink path.

Design: one expression tree per (base, ref) pair — no UDF, no shuffle,
stays inside whole-stage codegen next to the outlink explode.

* branch classification (scheme'd / protocol-relative / root-relative
  / empty / query-only / relative) via ``rlike``/``startswith``;
* path merge (RFC 5.3): base directory prefix + relative path;
* ``remove_dot_segments`` (RFC 5.2.4) as a single ``aggregate`` fold
  over the split segment array — ``.`` skips, ``..`` pops, anything
  else pushes; a trailing dot-segment keeps its trailing slash by
  appending an empty segment before the fold. Over-popping clamps at
  the root exactly as the RFC's output-stack formulation does.
* fragments are DROPPED on purpose: frontier keys never carry
  fragments (same normalization the SURT/canonicalize stages apply).

The DuckDB oracle for the registered query normalizes the SAME merged
path with a completely different algorithm — a recursive-CTE
fixpoint of single leftmost regex reductions — so agreement certifies
the fold, not a shared implementation. A scalar Python reference
(``resolve_py``, stdlib ``urljoin``) backs the hypothesis fuzz test.
"""

from __future__ import annotations

from urllib.parse import urldefrag, urljoin

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["resolve_reference", "resolve_py"]


def _remove_dot_segments(path: Column) -> Column:
    """RFC 3986 §5.2.4 over an absolute path, as one aggregate fold."""
    # a trailing '.' or '..' segment leaves a trailing slash: append an
    # empty segment so the fold's output join re-creates it
    p = F.when(path.rlike(r"/\.\.?$"), F.concat(path, F.lit("/"))).otherwise(
        path
    )
    segs_all = F.split(p, "/")
    # drop the leading '' segment of the absolute path
    segs = F.slice(segs_all, 2, F.greatest(F.size(segs_all) - 1, F.lit(0)))
    folded = F.aggregate(
        segs,
        F.expr("cast(array() as array<string>)"),
        lambda acc, s: (
            F.when(s == ".", acc)
            .when(
                s == "..",
                F.slice(acc, F.lit(1), F.greatest(F.size(acc) - 1, F.lit(0))),
            )
            .otherwise(F.concat(acc, F.array(s)))
        ),
    )
    return F.concat(F.lit("/"), F.array_join(folded, "/"))


def resolve_reference(base: Column, ref: Column) -> Column:
    """Resolve ``ref`` against absolute http(s) ``base``; drop fragments.

    Returns the absolute target URL as a string column. Pure built-in
    expressions — usable directly after the outlink explode.
    """
    origin = F.regexp_extract(base, r"^(https?://[^/]+)", 1)
    scheme = F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1)
    bpath = F.regexp_extract(base, r"^https?://[^/]+(/.*)$", 1)
    r = F.regexp_replace(ref, r"#.*$", "")  # frontier keys: no fragments
    rpath = F.regexp_extract(r, r"^[^?]*", 0)
    # an EMPTY query ('page?') normalizes away, matching stdlib urljoin
    # and the frontier's canonical keys
    rquery0 = F.when(r.contains("?"), F.regexp_extract(r, r"(\?.*)$", 1)).otherwise(
        F.lit("")
    )
    rquery = F.when(rquery0 == "?", F.lit("")).otherwise(rquery0)
    # RFC 5.3 merge: authority present + empty base path => '/' + ref
    bdir = F.when(bpath == "", F.lit("/")).otherwise(
        F.regexp_replace(bpath, r"[^/]*$", "")
    )
    mpath = F.when(rpath.startswith("/"), rpath).otherwise(
        F.concat(bdir, rpath)
    )
    npath = _remove_dot_segments(mpath)
    return (
        F.when(r.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*:"), r)
        .when(r.startswith("//"), F.concat(scheme, F.lit(":"), r))
        .when(r == "", F.regexp_replace(base, r"#.*$", ""))
        .when(
            r.startswith("?"),
            F.concat(F.regexp_replace(base, r"#.*$", ""), rquery),
        )
        .otherwise(F.concat(origin, npath, rquery))
    )


def resolve_py(base: str, ref: str) -> str:
    """Scalar reference semantics: stdlib urljoin, fragment dropped.

    Used only by the differential fuzz test — never on the data path.
    """
    return urldefrag(urljoin(base, ref))[0]
