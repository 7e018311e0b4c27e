"""PSL registrable-domain extraction (operators/psl.py).

Covers the publicsuffix.org algorithm cases: normal multi-label rules,
wildcard rules, exception rules, the implicit ``*`` default, private
suffixes, IPs, ports, userinfo, trailing dots, and hosts that ARE a
public suffix — plus the politeness consequence: shared-suffix hosts
share one budget, private-suffix subdomains do not.
"""

from pyspark.sql import functions as F

from pixcrawler_spark.operators.psl import (
    host_expr,
    psl_oracle_sql,
    registrable_domain_expr,
)

CASES = [
    # url, expected registrable domain
    ("https://www.example.co.uk/p", "example.co.uk"),
    ("https://shop.example.co.uk/x?q=1", "example.co.uk"),
    ("http://example.com/", "example.com"),
    ("https://a.b.c.example.com/", "example.com"),
    # private suffixes: each subdomain is its own registrable unit
    ("https://a.blogspot.com/", "a.blogspot.com"),
    ("https://x.a.blogspot.com/", "a.blogspot.com"),
    ("https://b.blogspot.com/", "b.blogspot.com"),
    ("https://EXAMPLE.GitHub.IO/Repo", "example.github.io"),
    ("https://my.bucket.s3.amazonaws.com/", "bucket.s3.amazonaws.com"),
    # userinfo + port + 4-label ICANN structure
    ("https://user:pw@deep.sub.example.com.au:8443/p", "example.com.au"),
    # wildcard *.ck: bar.ck is a public suffix
    ("https://foo.bar.ck/", "foo.bar.ck"),
    ("https://x.foo.bar.ck/", "foo.bar.ck"),
    # exception !www.ck cancels the wildcard
    ("https://www.ck/", "www.ck"),
    ("https://foo.www.ck/", "www.ck"),
    # wildcard with 2-label base (*.kawasaki.jp): foo.kawasaki.jp is a
    # public suffix, so x.foo.kawasaki.jp is itself registrable
    ("https://foo.kawasaki.jp/", "foo.kawasaki.jp"),
    ("https://x.foo.kawasaki.jp/", "x.foo.kawasaki.jp"),
    ("https://city.kawasaki.jp/", "city.kawasaki.jp"),  # exception
    ("https://ward.city.kawasaki.jp/", "city.kawasaki.jp"),
    # IPs and degenerate hosts group as themselves
    ("https://192.168.10.1:8080/admin", "192.168.10.1"),
    ("https://com/", "com"),
    ("https://co.uk/", "co.uk"),
    ("https://single/", "single"),
    # trailing dot normalizes away
    ("https://example.co.uk./", "example.co.uk"),
    # unknown TLD → implicit '*' rule → eTLD+1 (fixture hosts rely on this)
    ("https://d0042.example/p/1", "d0042.example"),
    ("https://sub.d0042.example/p/1", "d0042.example"),
]


def test_registrable_domain_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = [
        r["d"]
        for r in df.select(registrable_domain_expr("url").alias("d")).collect()
    ]
    for (url, want), g in zip(CASES, got):
        assert g == want, f"{url}: want {want}, got {g}"


def test_oracle_sql_mirrors_spark(spark):
    """The generated DuckDB SQL and the Spark expression must agree on
    every edge case — one truth table, two engines."""
    import duckdb

    df = spark.createDataFrame(
        [(u,) for u, _ in CASES], "url string"
    ).select(
        "url", registrable_domain_expr("url").alias("d"), host_expr("url").alias("h")
    )
    rows = df.collect()
    con = duckdb.connect()
    frag = psl_oracle_sql("h")
    for r in rows:
        got = con.execute(
            f"SELECT {frag} AS d FROM (SELECT ? AS h)", [r["h"]]
        ).fetchone()[0]
        assert got == r["d"], f"{r['url']}: spark={r['d']} duckdb={got}"


def test_politeness_budget_grouping(spark):
    """The politeness window must key on eTLD+1: sibling subdomains of
    one site share a budget; blogspot tenants do not."""
    from pixcrawler_spark.operators import politeness as pol

    urls = [
        # 4 urls across 2 subdomains of one .co.uk site -> ONE domain group
        "https://www.site.co.uk/a",
        "https://www.site.co.uk/b",
        "https://shop.site.co.uk/c",
        "https://shop.site.co.uk/d",
        # 2 blogspot tenants -> TWO domain groups
        "https://alice.blogspot.com/1",
        "https://bob.blogspot.com/2",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["dom"]
        for r in df.select(pol.domain_expr("url").alias("dom")).distinct().collect()
    }
    assert got == {"site.co.uk", "alice.blogspot.com", "bob.blogspot.com"}


def _random_hosts(n: int = 400, seed: int = 20260818) -> list[str]:
    """Deterministic messy-host corpus: random labels over suffixes
    drawn from every rule class (normal 2/3/4-label, wildcard,
    exception, private, unknown TLD), plus IPs, degenerate and
    junk-ish hosts. One batched pass keeps the Spark round-trip
    cheap (the repo's fuzz pattern, tests/test_fuzz.py)."""
    import random

    rnd = random.Random(seed)
    suffixes = [
        "com", "org", "example", "co.uk", "ac.uk", "com.au", "ac.jp",
        "kawasaki.jp", "city.kawasaki.jp", "ck", "www.ck", "bar.ck",
        "blogspot.com", "github.io", "s3.amazonaws.com", "zz-unknown",
    ]
    labels = ["a", "b0", "x-y", "deep", "www", "shop", "9start", "q"]
    hosts = []
    for _ in range(n):
        kind = rnd.random()
        if kind < 0.08:
            hosts.append(
                ".".join(str(rnd.randrange(256)) for _ in range(4))
            )
        elif kind < 0.12:
            hosts.append(rnd.choice(suffixes))  # host IS a suffix
        else:
            depth = rnd.randrange(0, 4)
            pre = [rnd.choice(labels) for _ in range(depth)]
            hosts.append(".".join(pre + [rnd.choice(suffixes)]))
    hosts += ["", ".", "..", "a..b.com", "single", "xn--p1ai"]
    return hosts


def test_psl_differential_random_hosts(spark):
    """Differential check on 400+ random messy hosts: the Spark
    expression and the DuckDB oracle (independent implementations
    generated from one snapshot) must agree exactly; and two
    structural properties of the publicsuffix algorithm must hold —
    the registrable domain is a label-suffix of the host, and the
    extraction is idempotent (rd(rd(h)) == rd(h))."""
    import duckdb

    from pixcrawler_spark.operators.psl import registrable_domain_of_host

    hosts = _random_hosts()
    df = spark.createDataFrame([(h,) for h in hosts], "h string")
    out = df.select(
        "h",
        registrable_domain_of_host(F.col("h")).alias("rd"),
    ).select(
        "h", "rd",
        registrable_domain_of_host(F.col("rd")).alias("rd2"),
    )
    rows = {r["h"]: (r["rd"], r["rd2"]) for r in out.collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE hosts (h VARCHAR)")
    con.executemany("INSERT INTO hosts VALUES (?)", [(h,) for h in hosts])
    oracle = {
        h: d
        for h, d in con.execute(
            f"SELECT h, {psl_oracle_sql('h')} AS d FROM hosts"
        ).fetchall()
    }

    for h in hosts:
        rd, rd2 = rows[h]
        assert rd == oracle[h], f"{h!r}: spark={rd!r} duckdb={oracle[h]!r}"
        assert rd2 == rd, f"not idempotent on {h!r}: {rd!r} -> {rd2!r}"
        # suffix property: rd is the host or a trailing-label suffix
        assert h == rd or h.endswith("." + rd), f"{rd!r} not a suffix of {h!r}"
