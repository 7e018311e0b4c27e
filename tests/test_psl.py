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
