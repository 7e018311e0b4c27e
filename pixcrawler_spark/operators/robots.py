"""robots.txt parsing as a columnar operator: raw robots bodies →
per-domain rules table (disallow_prefixes, crawl_delay_s).

The reference never consults robots (verified by repo-wide grep —
SURVEY.md §2.9); the north rule requires it, so the grammar here is
the de-facto standard subset (RFC 9309 §2 simplified):

- case-insensitive field names; ``#`` starts a comment to end-of-line;
- a ``User-agent:`` line opens a group; consecutive UA lines share the
  group; we honor the ``*`` group (this engine's UA);
- ``Disallow:`` paths within the ``*`` group become prefix rules
  (empty Disallow = allow-all, contributes nothing; ``Disallow: /``
  is RFC deny-all and is kept as the empty-string prefix, which
  startswith-matches every path);
- ``Crawl-delay:`` within the ``*`` group sets the domain's token
  bucket delay (non-standard but ubiquitous).

The parse is pure JVM columnar code — split/filter/transform/aggregate
higher-order functions over the line array, whole-stage-codegen'd, no
Python. This matters because at 10^10-URL scale the robots corpus is
~10^8 bodies: a row-at-a-time Python parser would be the pipeline's
slowest stage.

Output feeds operators/politeness.with_robots_decision unchanged:
(domain, disallow_prefixes array<string>, crawl_delay_s double).
Paths are normalized to the prefix form politeness compares against
(leading '/' stripped, since path_expr extracts 'p/...' without it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _clean_lines(body_col: Column) -> Column:
    """Body text → array of trimmed, comment-stripped, non-empty lines."""
    lines = F.split(body_col, r"\r?\n")
    no_comment = F.transform(
        lines, lambda l: F.trim(F.regexp_replace(l, r"#.*$", ""))
    )
    return F.filter(no_comment, lambda l: l != "")


def _star_group(lines_col: Column) -> Column:
    """Keep only lines belonging to the ``User-agent: *`` group(s).

    Directive lines are tagged with the most recent user-agent above
    them. A group's UA set is every consecutive UA line immediately
    above its directives, so a directive belongs to ``*`` iff scanning
    upward through UA lines (skipping none) finds ``*`` before a
    directive. Implemented as a running aggregate over (line, state):
    state holds (in_star, saw_directive_since_ua) and an accumulator
    array of the kept directive lines.
    """
    is_ua = lambda l: F.lower(l).rlike(r"^user-agent\s*:")
    ua_val = lambda l: F.trim(F.regexp_replace(l, r"(?i)^user-agent\s*:", ""))
    # fold: acc = struct(kept: array<string>, in_star: boolean,
    #                    in_ua_block: boolean)
    init = F.struct(
        F.array().cast("array<string>").alias("kept"),
        F.lit(False).alias("in_star"),
        F.lit(False).alias("in_ua_block"),
    )

    def step(acc, l):
        new_star_block = F.when(
            acc["in_ua_block"], acc["in_star"] | (ua_val(l) == "*")
        ).otherwise(ua_val(l) == "*")
        return (
            F.when(
                is_ua(l),
                F.struct(
                    acc["kept"].alias("kept"),
                    new_star_block.alias("in_star"),
                    F.lit(True).alias("in_ua_block"),
                ),
            )
            .otherwise(
                F.struct(
                    F.when(
                        acc["in_star"], F.concat(acc["kept"], F.array(l))
                    ).otherwise(acc["kept"]).alias("kept"),
                    acc["in_star"].alias("in_star"),
                    F.lit(False).alias("in_ua_block"),
                )
            )
        )

    return F.aggregate(lines_col, init, step, lambda acc: acc["kept"])


def parse_robots(
    df: DataFrame, domain_col: str = "domain", body_col: str = "robots_txt"
) -> DataFrame:
    """Raw robots bodies → (domain, disallow_prefixes, allow_prefixes,
    crawl_delay_s).

    Null/empty bodies produce allow-all (empty prefixes, null delay).
    ``allow_prefixes`` carries RFC 9309 Allow records from the ``*``
    group (same '/'-stripped form as disallow); the longest-match
    precedence between the two lists is ``rfc_allowed_expr``.
    """
    star_lines = _star_group(_clean_lines(F.coalesce(F.col(body_col), F.lit(""))))
    tagged = df.select(
        F.col(domain_col).alias("domain"), star_lines.alias("_lines")
    )
    dis_raw = F.filter(
        F.col("_lines"), lambda l: F.lower(l).rlike(r"^disallow\s*:")
    )
    # RFC 9309: an EMPTY Disallow value contributes nothing, but
    # ``Disallow: /`` is deny-all — so drop empties BEFORE stripping
    # the leading '/', keeping '/' as the empty-string prefix (which
    # startswith-matches every path downstream).
    dis_vals = F.filter(
        F.transform(
            dis_raw,
            lambda l: F.trim(F.regexp_replace(l, r"(?i)^disallow\s*:", "")),
        ),
        lambda v: v != "",
    )
    dis_paths = F.transform(dis_vals, lambda v: F.regexp_replace(v, r"^/", ""))
    # Allow records: same value handling, but "allow" does NOT match
    # the start of "disallow" the way a naive prefix regex would — the
    # (?i)^allow anchor below cannot fire on "Disallow:" lines because
    # those start with 'd'.
    allow_raw = F.filter(
        F.col("_lines"), lambda l: F.lower(l).rlike(r"^allow\s*:")
    )
    allow_vals = F.filter(
        F.transform(
            allow_raw,
            lambda l: F.trim(F.regexp_replace(l, r"(?i)^allow\s*:", "")),
        ),
        lambda v: v != "",
    )
    allow_paths = F.transform(
        allow_vals, lambda v: F.regexp_replace(v, r"^/", "")
    )
    delays = F.filter(
        F.col("_lines"), lambda l: F.lower(l).rlike(r"^crawl-delay\s*:")
    )
    delay = F.element_at(
        F.transform(
            delays,
            lambda l: F.trim(F.regexp_replace(l, r"(?i)^crawl-delay\s*:", "")).cast(
                "double"
            ),
        ),
        1,
    )
    return tagged.select(
        "domain",
        dis_paths.alias("disallow_prefixes"),
        allow_paths.alias("allow_prefixes"),
        delay.alias("crawl_delay_s"),
    )


def rfc_allowed_expr(
    path: Column, allow_col: Column, dis_col: Column
) -> Column:
    """RFC 9309 §2.2.2 longest-match precedence over prefix rules:
    the most specific (longest) matching record wins; on a tie the
    least restrictive (Allow) wins. Prefixes are in the stored
    '/'-stripped form, so deny-all ('') has specificity 0 and any
    matching Allow beats it. Pure JVM array folds — for each list,
    the fold keeps the longest matching prefix length (-1 = no
    match), then one comparison decides.

    (Wildcards * and $ are NOT supported — prefix rules only, the
    same subset the reference-era crawlers and the rest of this
    parser implement; bodies using them fall back to prefix
    semantics deterministically.)
    """

    def best_len(prefixes: Column) -> Column:
        return F.aggregate(
            F.filter(prefixes, lambda p: path.startswith(p)),
            F.lit(-1),
            lambda acc, p: F.greatest(acc, F.length(p)),
        )

    a = best_len(F.coalesce(allow_col, F.array().cast("array<string>")))
    d = best_len(F.coalesce(dis_col, F.array().cast("array<string>")))
    return (d == -1) | (a >= d)


def sitemap_urls(body_col: Column) -> Column:
    """All ``Sitemap:`` directive urls from a robots body (RFC 9309 §2.3
    treats them as non-group records: they apply regardless of which
    user-agent group they appear inside, so extraction scans EVERY
    cleaned line, not just the ``*`` group). Pure JVM array exprs.

    Reference analog: none — the reference never reads robots.txt at
    all; sitemap discovery is the standard seed source a web-scale
    frontier adds next to SERP seeding (plans/seeding.py).
    """
    lines = _clean_lines(F.coalesce(body_col, F.lit("")))
    maps = F.filter(lines, lambda l: F.lower(l).rlike(r"^sitemap\s*:"))
    return F.transform(
        maps, lambda l: F.trim(F.regexp_replace(l, r"(?i)^sitemap\s*:", ""))
    )


# ---------------------------------------------------------------------------
# RFC 9309 §2.2.3 wildcard path patterns: '*' (any sequence) and a
# trailing '$' (end-of-path anchor)
# ---------------------------------------------------------------------------
# The prefix-only matcher above (rfc_allowed_expr) covers the rule
# subset the engine's own parse layer stores; real-web robots bodies
# also use '*' and '$' (RFC 9309 permits both, and the large crawlers
# honor them). This matcher implements the full pattern language as
# pure JVM array/string folds — no regex compilation per row, no
# Python: a pattern is split on '*' into literal segments; the path
# must start with the first segment and contain the remaining
# segments in order (greedy leftmost, the standard correct strategy
# for '*'-only globs); a trailing '$' additionally requires the last
# segment to END the path at/after the greedy position. Unanchored
# patterns keep robots prefix semantics (the pattern matches a PREFIX
# of the path, so whatever follows the last segment is free).
#
# Differential-fuzz tested against a scalar Python reference on
# arbitrary rule/path strings (tests/test_robots.py), the same
# verification pattern as operators/traps.py.


def _glob_fold(path: Column, segs: Column, seg0: Column, n_drop: int) -> Column:
    """Greedy in-order containment of segs[2..size-n_drop+1] in
    ``path`` starting after seg0. Returns struct(pos, ok)."""
    mids = F.slice(
        segs, 2, F.greatest(F.size(segs) - F.lit(n_drop), F.lit(0))
    )
    init = F.struct(
        (F.length(seg0) + F.lit(1)).alias("pos"),
        path.startswith(seg0).alias("ok"),
    )
    return F.aggregate(
        mids,
        init,
        lambda acc, s: F.struct(
            F.when(s == "", acc["pos"])
            .otherwise(
                F.call_function("locate", s, path, acc["pos"])
                + F.length(s)
            )
            .alias("pos"),
            (
                acc["ok"]
                & (
                    (s == "")
                    | (F.call_function("locate", s, path, acc["pos"]) > 0)
                )
            ).alias("ok"),
        ),
    )


def robots_glob_match(path: Column, rule: Column) -> Column:
    """True iff RFC 9309 path pattern ``rule`` matches ``path``."""
    anchored = rule.endswith("$")
    pat = F.regexp_replace(rule, r"\$$", "")
    segs = F.split(pat, r"\*", -1)
    seg0 = F.element_at(segs, 1)
    last = F.element_at(segs, -1)

    unanchored_ok = _glob_fold(path, segs, seg0, 1)["ok"]
    # anchored, no '*': the pattern must equal the whole path
    exact_ok = path == pat
    # anchored with '*': greedy-match all but the last segment, then
    # the last segment must end the path at/after the greedy position
    r = _glob_fold(path, segs, seg0, 2)
    anchored_ok = (
        r["ok"]
        & path.endswith(last)
        & (F.length(path) - F.length(last) + 1 >= r["pos"])
    )
    return F.when(
        ~anchored, unanchored_ok
    ).otherwise(F.when(F.size(segs) == 1, exact_ok).otherwise(anchored_ok))


def rfc_allowed_glob_expr(
    path: Column, allow_col: Column, dis_col: Column
) -> Column:
    """rfc_allowed_expr generalized to wildcard rules: longest-match
    precedence where specificity is the RULE's octet length (the
    robots.cc convention; RFC 9309 'most octets'), Allow wins ties."""

    def best_len(rules: Column) -> Column:
        return F.aggregate(
            F.filter(
                F.coalesce(rules, F.array().cast("array<string>")),
                lambda rl: robots_glob_match(path, rl),
            ),
            F.lit(-1),
            lambda acc, rl: F.greatest(acc, F.length(rl)),
        )

    a = best_len(allow_col)
    d = best_len(dis_col)
    return (d == -1) | (a >= d)


def robots_glob_match_py(path: str, rule: str) -> bool:
    """Scalar reference for differential fuzzing — same semantics as
    robots_glob_match, independent implementation."""
    anchored = rule.endswith("$")
    pat = rule[:-1] if anchored else rule
    segs = pat.split("*")
    if anchored and len(segs) == 1:
        return path == pat
    if not path.startswith(segs[0]):
        return False
    pos = len(segs[0])
    tail = segs[1:-1] if anchored else segs[1:]
    for s in tail:
        if s == "":
            continue
        i = path.find(s, pos)
        if i < 0:
            return False
        pos = i + len(s)
    if anchored:
        last = segs[-1]
        return path.endswith(last) and len(path) - len(last) >= pos
    return True
