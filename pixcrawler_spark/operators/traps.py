"""Crawler-trap signals over raw urls — pure string/array Catalyst
expressions (no UDF, no regex backreferences, so the same signals run
JVM-side here and in RE2-based engines).

The classic heuristics (Heritrix's PathologicalPath / TooManyPath
rules, standard trap literature): adjacent-repeat path segments
(symlink/self-link loops), calendar archives, session ids, parameter
spray, depth explosion. A narrow map — zero shuffle — sized for the
frontier's enqueue filter at 10^10 urls.

``trap_py`` is the row-level Python reference of the SAME rules used
by the hypothesis differential fuzz (tests/test_sketches.py): the
expressions must agree with it on arbitrary url-shaped strings, not
just the fixture.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRAP_THRESHOLD = 2


def _score(
    session: Column, repeat: Column, calendar: Column, depth: Column, n_params: Column
) -> Column:
    return (
        F.when(session, 3).otherwise(0)
        + F.when(repeat, 2).otherwise(0)
        + F.when(calendar, 2).otherwise(0)
        + F.when(depth >= 8, 1).otherwise(0)
        + F.when(n_params >= 4, 1).otherwise(0)
    ).cast("bigint")


def trap_signals(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append depth, n_params, has_repeat, has_calendar, has_session,
    trap_score, is_trap to ``df``."""
    rest = F.regexp_replace(url_col, r"^https?://[^/]+", "")
    # F.get (not getItem): ANSI mode throws INVALID_ARRAY_INDEX on
    # getItem past the end (any url without a "?"), and the driver's
    # correctness harness runs an ANSI-on session. get() returns NULL.
    path = F.get(F.split(rest, r"\?"), 0)
    query = F.coalesce(F.get(F.split(rest, r"\?"), 1), F.lit(""))
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    with_parts = df.withColumns({"_segs": segs, "_query": query})
    has_repeat = F.when(F.size("_segs") < 2, F.lit(False)).otherwise(
        F.array_contains(
            F.expr(
                "transform(sequence(1, size(_segs) - 1),"
                " i -> element_at(_segs, i) = element_at(_segs, i + 1))"
            ),
            True,
        )
    )
    has_calendar = F.col(url_col).rlike("/20[0-9][0-9]/[0-9][0-9]/")
    has_session = F.lower(url_col).contains("phpsessid=") | F.lower(
        url_col
    ).contains("sessionid=")
    depth = F.size("_segs").cast("bigint")
    n_params = (
        F.when(F.col("_query") == "", F.lit(0))
        .otherwise(F.size(F.split("_query", "&")))
        .cast("bigint")
    )
    score = _score(has_session, has_repeat, has_calendar, depth, n_params)
    return with_parts.select(
        *df.columns,
        depth.alias("depth"),
        n_params.alias("n_params"),
        has_repeat.alias("has_repeat"),
        has_calendar.alias("has_calendar"),
        has_session.alias("has_session"),
        score.alias("trap_score"),
        (score >= TRAP_THRESHOLD).alias("is_trap"),
    )


# ---------------------------------------------------------------------------
# Row-level Python reference (fuzz oracle) — SAME rules, scalar form
# ---------------------------------------------------------------------------
import re as _re

_SCHEME_HOST = _re.compile(r"^https?://[^/]+")
_CALENDAR = _re.compile(r"/20[0-9][0-9]/[0-9][0-9]/")


def trap_py(url: str) -> dict:
    rest = _SCHEME_HOST.sub("", url, count=1)
    parts = rest.split("?")
    path, query = parts[0], (parts[1] if len(parts) > 1 else "")
    segs = [s for s in path.split("/") if s != ""]
    depth = len(segs)
    n_params = 0 if query == "" else len(query.split("&"))
    has_repeat = any(a == b for a, b in zip(segs, segs[1:]))
    has_calendar = _CALENDAR.search(url) is not None
    low = url.lower()
    has_session = "phpsessid=" in low or "sessionid=" in low
    score = (
        (3 if has_session else 0)
        + (2 if has_repeat else 0)
        + (2 if has_calendar else 0)
        + (1 if depth >= 8 else 0)
        + (1 if n_params >= 4 else 0)
    )
    return {
        "depth": depth,
        "n_params": n_params,
        "has_repeat": has_repeat,
        "has_calendar": has_calendar,
        "has_session": has_session,
        "trap_score": score,
        "is_trap": score >= TRAP_THRESHOLD,
    }
