"""robots.txt parser tests: RFC 9309 subset semantics (star group
selection, comments, crawl-delay, multi-UA groups, empty disallow),
checked against a straight-line Python oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from pixcrawler_spark.operators.robots import parse_robots


def _oracle(body: str | None) -> tuple[list[str], float | None]:
    prefixes: list[str] = []
    delay: float | None = None
    in_star = False
    in_ua_block = False
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        low = line.lower()
        if low.startswith("user-agent"):
            ua = line.split(":", 1)[1].strip() if ":" in line else ""
            if in_ua_block:
                in_star = in_star or ua == "*"
            else:
                in_star = ua == "*"
            in_ua_block = True
            continue
        in_ua_block = False
        if not in_star:
            continue
        if low.startswith("disallow") and ":" in line:
            v = line.split(":", 1)[1].strip()
            # RFC 9309: empty value = allow-all (contributes nothing);
            # "/" = deny-all, kept as the empty-string match-all prefix.
            if v:
                prefixes.append(v.lstrip("/"))
        elif low.startswith("crawl-delay") and ":" in line:
            try:
                d = float(line.split(":", 1)[1].strip())
                if delay is None:
                    delay = d
            except ValueError:
                pass
    return prefixes, delay


BODIES = {
    "simple.example": "User-agent: *\nDisallow: /private/\nCrawl-delay: 2",
    "other-ua.example": "User-agent: googlebot\nDisallow: /\n"
    "User-agent: *\nDisallow: /tmp/",
    "multi-ua-group.example": "User-agent: googlebot\nUser-agent: *\n"
    "Disallow: /shared/\nCrawl-delay: 0.5",
    "comments.example": "# hello\nUser-agent: * # us\nDisallow: /a/ # nope\n\n"
    "Disallow:\nDisallow: /b/",
    "no-star.example": "User-agent: googlebot\nDisallow: /g/",
    "empty.example": "",
    "null.example": None,
    "two-groups.example": "User-agent: *\nDisallow: /one/\n"
    "User-agent: bing\nDisallow: /two/\n"
    "User-agent: *\nCrawl-delay: 3\nDisallow: /three/",
    "case.example": "USER-AGENT: *\nDISALLOW: /Upper/\nCRAWL-DELAY: 1.5",
    "deny-all.example": "User-agent: *\nDisallow: /",
    "deny-all-mixed.example": "User-agent: *\nDisallow: /a/\nDisallow: /\n"
    "Disallow:\nCrawl-delay: 1",
}


def test_parse_matches_oracle(spark):
    df = spark.createDataFrame(
        [(d, b) for d, b in BODIES.items()], "domain string, robots_txt string"
    )
    got = {
        r["domain"]: (list(r["disallow_prefixes"]), r["crawl_delay_s"])
        for r in parse_robots(df).collect()
    }
    for domain, body in BODIES.items():
        assert got[domain] == _oracle(body), domain


def test_feeds_politeness(spark):
    """Parsed rules drive with_robots_decision unchanged."""
    from pyspark.sql import functions as F

    from pixcrawler_spark.operators import politeness as pol

    rules = parse_robots(
        spark.createDataFrame(
            [("d.example", "User-agent: *\nDisallow: /private/")],
            "domain string, robots_txt string",
        )
    ).withColumn("max_per_round", F.lit(10).cast("int"))
    cand = spark.createDataFrame(
        [
            ("https://d.example/private/x", "d.example"),
            ("https://d.example/public/y", "d.example"),
        ],
        "url string, domain string",
    )
    out = {
        r["url"]: r["robots_denied"]
        for r in pol.with_robots_decision(cand, rules).collect()
    }
    assert out == {
        "https://d.example/private/x": True,
        "https://d.example/public/y": False,
    }


def test_deny_all_denies_every_path(spark):
    """``Disallow: /`` (RFC deny-all) must deny every url on the
    domain, including the root — the most common robots rule."""
    from pyspark.sql import functions as F

    from pixcrawler_spark.operators import politeness as pol

    rules = parse_robots(
        spark.createDataFrame(
            [("closed.example", "User-agent: *\nDisallow: /")],
            "domain string, robots_txt string",
        )
    ).withColumn("max_per_round", F.lit(10).cast("int"))
    assert rules.collect()[0]["disallow_prefixes"] == [""]
    cand = spark.createDataFrame(
        [
            ("https://closed.example/", "closed.example"),
            ("https://closed.example", "closed.example"),
            ("https://closed.example/any/path", "closed.example"),
        ],
        "url string, domain string",
    )
    decided = pol.with_robots_decision(cand, rules).collect()
    assert all(r["robots_denied"] for r in decided), decided


def test_no_python_in_plan(spark):
    """The parse must be whole-stage-codegen JVM code (no Python UDFs)."""
    df = spark.createDataFrame(
        [("d.example", "User-agent: *\nDisallow: /p/")],
        "domain string, robots_txt string",
    )
    plan = parse_robots(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_allow_prefixes_parsed(spark):
    """Allow records in the * group are extracted like Disallow ones,
    and the (?i)^allow anchor must NOT fire on Disallow lines."""
    df = spark.createDataFrame(
        [
            (
                "a.example",
                "User-agent: *\nAllow: /open/\nDisallow: /closed/\n"
                "Allow:\nALLOW: /Upper/\nAllow: /",
            ),
            ("b.example", "User-agent: *\nDisallow: /only/"),
        ],
        "domain string, robots_txt string",
    )
    got = {
        r["domain"]: (list(r["allow_prefixes"]), list(r["disallow_prefixes"]))
        for r in parse_robots(df).collect()
    }
    assert got["a.example"] == (["open/", "Upper/", ""], ["closed/"])
    assert got["b.example"] == ([], ["only/"])


def test_rfc_allow_precedence(spark):
    """RFC 9309 §2.2.2 longest-match precedence through the production
    with_robots_decision join: specific Allow beats shorter Disallow,
    specific Disallow beats shorter Allow, tie -> Allow, deny-all ('')
    beaten by any matching Allow, no match -> allowed."""
    from pyspark.sql import functions as F

    from pixcrawler_spark.operators import politeness as pol

    rules = parse_robots(
        spark.createDataFrame(
            [
                (
                    "d.example",
                    "User-agent: *\nDisallow: /a/\nAllow: /a/sub/\n"
                    "Allow: /b/\nDisallow: /b/sub/\n"
                    "Disallow: /tie\nAllow: /tie\nDisallow: /",
                )
            ],
            "domain string, robots_txt string",
        )
    ).withColumn("max_per_round", F.lit(10).cast("int"))
    cases = {
        "https://d.example/a/x": True,        # dis 'a/' > allow ''
        "https://d.example/a/sub/x": False,   # allow 'a/sub/' > dis 'a/'
        "https://d.example/b/x": False,       # allow 'b/' > deny-all ''
        "https://d.example/b/sub/x": True,    # dis 'b/sub/' > allow 'b/'
        "https://d.example/tie-page": False,  # tie at len 3 -> Allow wins
        "https://d.example/other": True,      # only deny-all '' matches
    }
    cand = spark.createDataFrame(
        [(u, "d.example") for u in cases], "url string, domain string"
    )
    got = {
        r["url"]: r["robots_denied"]
        for r in pol.with_robots_decision(cand, rules).collect()
    }
    assert got == cases


def test_rfc_allow_plan_stays_jvm(spark):
    """The allow-aware decision path must stay whole-stage-codegen."""
    from pyspark.sql import functions as F

    from pixcrawler_spark.operators import politeness as pol

    rules = parse_robots(
        spark.createDataFrame(
            [("d.example", "User-agent: *\nAllow: /a/\nDisallow: /")],
            "domain string, robots_txt string",
        )
    ).withColumn("max_per_round", F.lit(10).cast("int"))
    cand = spark.createDataFrame(
        [("https://d.example/a/x", "d.example")], "url string, domain string"
    )
    plan = (
        pol.with_robots_decision(cand, rules)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# RFC 9309 wildcard matcher ('*' / trailing '$'): semantics +
# differential fuzz vs the scalar Python reference, one Spark batch
# (the operators/traps.py verification pattern).
# ---------------------------------------------------------------------------
def test_glob_match_rfc_examples(spark):
    """The RFC/Google documentation examples, plus the edge shapes the
    fold has to get right (empty rule, bare '*', bare '$', '**')."""
    from pixcrawler_spark.operators.robots import (
        robots_glob_match,
        robots_glob_match_py,
    )

    cases = [
        # (path, rule, expected)
        ("/fish", "/fish", True), ("/fishheads", "/fish", True),
        ("/Fish", "/fish", False), ("/catfish", "/fish", False),
        ("/fish/salmon", "/fish/", True), ("/fish", "/fish/", False),
        ("/filename.php", "/*.php", True),
        ("/folder/filename.php?p", "/*.php", True),
        ("/index.php5", "/*.php", True),
        ("/filename.php", "/*.php$", True),
        ("/filename.php?p", "/*.php$", False),
        ("/fish.php", "/fish*.php", True),
        ("/fishheads/catfish.php?p", "/fish*.php", True),
        ("/fish.PHP", "/fish*.php", False),
        ("/a/b", "", True), ("/a/b", "*", True),
        ("", "$", True), ("/x", "$", False),
        ("/ab", "/a**b", True), ("/aXbYbZ", "/a*b$", False),
        ("/aXbYb", "/a*b$", True),
    ]
    df = spark.createDataFrame(
        [(p, r) for p, r, _ in cases], "path string, rule string"
    )
    got = {
        (r["path"], r["rule"]): r["m"]
        for r in df.select(
            "path",
            "rule",
            robots_glob_match(F.col("path"), F.col("rule")).alias("m"),
        ).collect()
    }
    for p, r, want in cases:
        assert got[(p, r)] == want, (p, r)
        assert robots_glob_match_py(p, r) == want, (p, r)


def test_glob_match_differential_fuzz(spark):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pixcrawler_spark.operators.robots import (
        robots_glob_match,
        robots_glob_match_py,
    )

    collected: list[tuple[str, str]] = []

    @settings(
        max_examples=400,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(
        st.text(alphabet="ab/$.*xyz0", min_size=0, max_size=16),
        st.text(alphabet="ab/$.*xyz0", min_size=0, max_size=12),
    )
    def _collect(path, rule):
        collected.append((path, rule))

    _collect()
    corpus = sorted(set(collected))
    assert len(corpus) > 100
    df = spark.createDataFrame(corpus, "path string, rule string")
    got = df.select(
        "path",
        "rule",
        robots_glob_match(F.col("path"), F.col("rule")).alias("m"),
    ).collect()
    for r in got:
        want = robots_glob_match_py(r["path"], r["rule"])
        assert r["m"] == want, (r["path"], r["rule"], r["m"], want)


def test_glob_allow_precedence_and_jvm_plan(spark):
    """Wildcard longest-match precedence (rule octet length, Allow on
    ties) and a Python-free physical plan."""
    from pixcrawler_spark.operators.robots import rfc_allowed_glob_expr

    rows = [
        # dis '*bolt*' (6) vs allow '*bolt*economy$' (14): allow wins
        ("/large/bolt/economy", True),
        ("/large/bolt/promo", False),
        # dis '/cold' (5) vs allow '/cold/widget' (12): allow wins
        ("/cold/widget/x", True),
        ("/cold/rod", False),
        # no rule matches
        ("/pink/gear", True),
        # tie: allow '/t*' (3) vs dis '/tx$' (4) -> dis more specific
        ("/tx", False),
        ("/ty", True),
    ]
    df = spark.createDataFrame([(p,) for p, _ in rows], "path string")
    out = df.select(
        "path",
        rfc_allowed_glob_expr(
            F.col("path"),
            F.array(
                F.lit("*bolt*economy$"), F.lit("/cold/widget"), F.lit("/t*")
            ),
            F.array(
                F.lit("*bolt*"), F.lit("/cold"), F.lit("/tx$")
            ),
        ).alias("allowed"),
    )
    got = {r["path"]: r["allowed"] for r in out.collect()}
    for p, want in rows:
        assert got[p] == want, p
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_with_robots_decision_wildcards(spark):
    """The production robots join honors wildcard rules when
    wildcards=True, and wildcard-free rule sets decide identically
    under both matchers."""
    from pixcrawler_spark.operators.politeness import with_robots_decision

    cand = spark.createDataFrame(
        [
            ("https://a.ex/p/file.php?x=1", "a.ex"),
            ("https://a.ex/p/file.html", "a.ex"),
            ("https://a.ex/private/file.php", "a.ex"),
            ("https://b.ex/anything", "b.ex"),
        ],
        "url string, domain string",
    )
    rules = spark.createDataFrame(
        [
            # rules in the engine's stored '/'-stripped form
            ("a.ex", ["*.php"], ["private*.php$"], 1.0, 100),
            ("b.ex", [""], [], 1.0, 100),
        ],
        "domain string, disallow_prefixes array<string>, "
        "allow_prefixes array<string>, crawl_delay_s double, "
        "max_per_round int",
    )
    out = with_robots_decision(cand, rules, broadcast=True, wildcards=True)
    got = {r["url"]: r["robots_denied"] for r in out.collect()}
    # '*.php' denies any path containing .php ...
    assert got["https://a.ex/p/file.php?x=1"] is True
    assert got["https://a.ex/p/file.html"] is False
    # ... except the more specific anchored Allow for /private*.php
    assert got["https://a.ex/private/file.php"] is False
    # deny-all prefix rule still denies everything under wildcards=True
    assert got["https://b.ex/anything"] is True

    # equivalence on wildcard-free rules: both matchers, same decisions
    plain = spark.createDataFrame(
        [("a.ex", ["/private", ""], ["/private/pub"], 2.0, 50)],
        "domain string, disallow_prefixes array<string>, "
        "allow_prefixes array<string>, crawl_delay_s double, "
        "max_per_round int",
    )
    cand2 = spark.createDataFrame(
        [
            ("https://a.ex/private/x", "a.ex"),
            ("https://a.ex/private/pub/x", "a.ex"),
            ("https://a.ex/open", "a.ex"),
        ],
        "url string, domain string",
    )
    d_prefix = {
        r["url"]: r["robots_denied"]
        for r in with_robots_decision(
            cand2, plain, broadcast=True, wildcards=False
        ).collect()
    }
    d_glob = {
        r["url"]: r["robots_denied"]
        for r in with_robots_decision(
            cand2, plain, broadcast=True, wildcards=True
        ).collect()
    }
    assert d_prefix == d_glob
