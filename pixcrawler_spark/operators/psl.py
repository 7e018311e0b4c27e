"""Registrable-domain (eTLD+1) extraction via a Public Suffix List match.

The reference throttles per keyword (builder/_generator.py:1280) — it has
no URL-frontier politeness at all, so this operator is part of the
from-scratch frontier design the north rule asks for: the politeness
unit, the frontier salting key, and per-domain budgets must group hosts
by *registrable domain* (publicsuffix.org semantics), not by raw host.
Host-only grouping misbudgets shared-suffix hosts two ways:
``www.example.co.uk`` vs ``shop.example.co.uk`` (one operator, should
share one budget) and ``a.blogspot.com`` vs ``b.blogspot.com`` (distinct
operators under a *private* public suffix, should NOT share one).

Everything is pure JVM expressions — split / slice / array_join plus
``Column.isin`` membership, which Catalyst compiles to an ``INSET`` hash
lookup once the rule set exceeds ``inSetConversionThreshold`` (verified
in the physical plan), so the match is O(labels) per row with zero
Python and zero shuffle. It composes into any select/filter/repartition
without a join.

Rule semantics implemented (publicsuffix.org/list algorithm):
- normal rules (``co.uk``): a matching suffix of k labels is public;
- wildcard rules (``*.ck``): any (k_base+1)-label suffix whose last
  k_base labels equal the base is public;
- exception rules (``!www.ck``): cancel a wildcard — the public suffix
  is the exception minus its first label;
- implicit default rule ``*``: an unknown TLD is itself public;
- prevailing rule = exceptions first, then most labels.
The registrable domain is the public suffix plus one label. Hosts that
*are* a public suffix (or IPs / dotless hosts) group as themselves —
the right fallback for a politeness key.

``SUFFIX_SNAPSHOT`` below is a pinned subset of the publicsuffix.org
list (public-domain data): the full ICANN second/third-level structures
for the registries that dominate crawl traffic plus widely used private
suffixes. Only multi-label rules need enumerating — the implicit ``*``
rule already covers every plain TLD — so the subset's failure mode is
soft: an unlisted multi-label registry degrades to host-level grouping
one label too coarse, never to a crash. Production swaps in the full
list via the ``rules=`` hook on :func:`registrable_domain_expr`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- pinned publicsuffix.org snapshot (subset; see module docstring) ---
# Normal multi-label rules. (Single-label TLDs are covered by the
# implicit "*" default rule and are deliberately not listed.)
_ICANN_SECOND_LEVEL = [
    # United Kingdom
    "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk", "nhs.uk",
    "org.uk", "plc.uk", "police.uk", "sch.uk",
    # Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    # Japan
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    # Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br", "art.br",
    "blog.br", "eco.br", "esp.br", "far.br", "flog.br", "imb.br",
    "ind.br", "inf.br", "jus.br", "leg.br", "mp.br", "nom.br", "not.br",
    "ntr.br", "odo.br", "pro.br", "psc.br", "qsl.br", "rec.br", "srv.br",
    "tmp.br", "tur.br", "tv.br", "vet.br", "wiki.br",
    # China
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "mil.cn", "net.cn", "org.cn",
    # India
    "co.in", "firm.in", "gen.in", "ind.in", "net.in", "org.in",
    "ac.in", "edu.in", "gov.in", "mil.in", "res.in", "nic.in",
    # South Korea
    "co.kr", "ne.kr", "or.kr", "re.kr", "pe.kr", "go.kr", "mil.kr",
    "ac.kr", "hs.kr", "ms.kr", "es.kr", "sc.kr", "kg.kr",
    # New Zealand
    "ac.nz", "co.nz", "geek.nz", "gen.nz", "govt.nz", "iwi.nz",
    "kiwi.nz", "maori.nz", "net.nz", "org.nz", "school.nz",
    # South Africa
    "ac.za", "co.za", "edu.za", "gov.za", "law.za", "mil.za", "net.za",
    "ngo.za", "nom.za", "org.za", "school.za", "web.za",
    # Mexico / Argentina / Colombia / Venezuela
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar", "int.ar",
    "mil.ar", "tur.ar",
    "com.co", "edu.co", "gov.co", "net.co", "org.co", "nom.co", "mil.co",
    "com.ve", "net.ve", "org.ve", "edu.ve", "gob.ve", "info.ve",
    "web.ve", "co.ve",
    # Turkey
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "av.tr", "bbs.tr",
    "bel.tr", "biz.tr", "dr.tr", "gen.tr", "info.tr", "k12.tr",
    "name.tr", "tel.tr", "tv.tr", "web.tr",
    # Russia / Ukraine / Poland
    "ac.ru", "edu.ru", "gov.ru", "int.ru", "mil.ru", "test.ru",
    "com.ru", "net.ru", "org.ru", "pp.ru", "msk.ru", "spb.ru",
    "com.ua", "edu.ua", "gov.ua", "in.ua", "net.ua", "org.ua",
    "kiev.ua", "kyiv.ua", "lviv.ua", "od.ua", "odessa.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl",
    "waw.pl", "wroc.pl", "biz.pl",
    # Singapore / Hong Kong / Taiwan / Thailand / Malaysia /
    # Indonesia / Philippines / Vietnam
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "club.tw", "ebiz.tw", "game.tw",
    "ac.th", "co.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
    "com.my", "net.my", "org.my", "edu.my", "gov.my", "mil.my",
    "name.my",
    "ac.id", "biz.id", "co.id", "desa.id", "go.id", "mil.id", "my.id",
    "net.id", "or.id", "ponpes.id", "sch.id", "web.id",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph", "mil.ph", "i.ph",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn",
    "ac.vn", "biz.vn", "info.vn", "name.vn", "pro.vn",
    # Israel / Saudi Arabia / UAE / Egypt / Nigeria / Kenya
    "ac.il", "co.il", "gov.il", "muni.il", "net.il", "org.il", "k12.il",
    "com.sa", "net.sa", "org.sa", "gov.sa", "med.sa", "pub.sa",
    "edu.sa", "sch.sa",
    "ac.ae", "co.ae", "gov.ae", "mil.ae", "net.ae", "org.ae", "sch.ae",
    "com.eg", "edu.eg", "eun.eg", "gov.eg", "mil.eg", "name.eg",
    "net.eg", "org.eg", "sci.eg",
    "com.ng", "edu.ng", "gov.ng", "i.ng", "mil.ng", "mobi.ng",
    "name.ng", "net.ng", "org.ng", "sch.ng",
    "ac.ke", "co.ke", "go.ke", "info.ke", "me.ke", "mobi.ke", "ne.ke",
    "or.ke", "sc.ke",
    # Europe misc
    "co.at", "or.at", "ac.at", "gv.at", "priv.at",
    "com.pt", "edu.pt", "gov.pt", "int.pt", "net.pt", "nome.pt",
    "org.pt", "publ.pt",
    "com.gr", "edu.gr", "net.gr", "org.gr", "gov.gr",
    "com.ro", "org.ro", "tm.ro", "nt.ro", "nom.ro", "info.ro",
    "rec.ro", "arts.ro", "firm.ro", "store.ro", "www.ro",
    "ac.be", "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    # US / misc structures
    "ci.us", "co.us", "k12.us", "lib.us", "cc.us",
]
# Geographic third-level structures that appear constantly in crawls.
_ICANN_THIRD_LEVEL = [
    "pvt.k12.ma.us", "chtr.k12.ma.us", "paroch.k12.ma.us",
]
# Widely used PRIVATE-section suffixes: each subdomain is a distinct
# operator (its own politeness budget / registrable unit).
_PRIVATE = [
    "blogspot.com", "appspot.com", "github.io", "githubusercontent.com",
    "gitlab.io", "herokuapp.com", "azurewebsites.net", "cloudapp.net",
    "cloudfront.net", "elasticbeanstalk.com", "firebaseapp.com",
    "web.app", "netlify.app", "vercel.app", "pages.dev", "workers.dev",
    "wordpress.com", "dreamhosters.com", "fastly-terrarium.com",
    "readthedocs.io", "neocities.org", "glitch.me", "repl.co",
    "onrender.com", "surge.sh", "tumblr.com", "weebly.com", "wix.com",
    "s3.amazonaws.com", "compute.amazonaws.com",
]
# Wildcard rules "*.<base>": listed by their BASE.
_WILDCARD_BASES = [
    "ck", "bd", "er", "fk", "jm", "kh", "mm", "np", "pg",
    "kawasaki.jp", "kitakyushu.jp", "kobe.jp", "nagoya.jp",
    "sapporo.jp", "sendai.jp", "yokohama.jp",
    "compute.amazonaws.com",
]
# Exception rules "!<suffix>": cancel a wildcard; the public suffix is
# the exception minus its first label.
_EXCEPTIONS = [
    "www.ck",
    "city.kawasaki.jp", "city.kitakyushu.jp", "city.kobe.jp",
    "city.nagoya.jp", "city.sapporo.jp", "city.sendai.jp",
    "city.yokohama.jp",
]

SUFFIX_SNAPSHOT: dict[str, list[str]] = {
    "rules": sorted(set(_ICANN_SECOND_LEVEL + _ICANN_THIRD_LEVEL + _PRIVATE)),
    "wildcards": sorted(set(_WILDCARD_BASES)),
    "exceptions": sorted(set(_EXCEPTIONS)),
}

# Longest structures we match: normal rules up to 4 labels, wildcard
# suffixes up to base+1. Everything longer falls through to the
# longest listed level — same soft degradation as an unlisted registry.
_MAX_K = 4

_IPV4_RE = r"^\d{1,3}(\.\d{1,3}){3}$"


def host_expr(url_col: str = "url") -> Column:
    """Normalized host from a URL: netloc minus userinfo/port, lowered,
    trailing dot stripped. Pure JVM regex — no Python."""
    netloc = F.regexp_extract(F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)
    no_user = F.substring_index(netloc, "@", -1)
    no_port = F.regexp_replace(no_user, r":\d+$", "")
    return F.regexp_replace(F.lower(no_port), r"\.$", "")


def registrable_domain_of_host(
    host: Column, rules: dict[str, list[str]] | None = None
) -> Column:
    """PSL registrable domain (eTLD+1) of a host column.

    See the module docstring for semantics. ``rules`` defaults to
    :data:`SUFFIX_SNAPSHOT`; pass the parsed full publicsuffix.org list
    in production.
    """
    r = rules or SUFFIX_SNAPSHOT
    normal = set(r["rules"])
    wild = set(r["wildcards"])
    exc = set(r["exceptions"])

    labels = F.split(host, r"\.")
    n = F.size(labels)

    def sfx(k: int) -> Column:
        return F.array_join(F.slice(labels, -k, k), ".")

    def in_set(col: Column, values: set[str]) -> Column:
        if not values:
            return F.lit(False)
        return col.isin(*sorted(values))  # Catalyst → INSET hash lookup

    # public-suffix length in labels, prevailing-rule order:
    # exceptions (any level) first, then longest normal/wildcard match,
    # then the implicit "*" default (ps_len = 1).
    expr = None
    # exceptions: suffix of k labels in EXC → ps_len = k - 1
    for k in (4, 3, 2):
        by_level = {s for s in exc if s.count(".") + 1 == k}
        cond = (n >= k) & in_set(sfx(k), by_level)
        branch = (cond, F.lit(k - 1))
        expr = F.when(*branch) if expr is None else expr.when(*branch)
    # normal rules of k labels OR wildcard with a (k-1)-label base
    for k in (_MAX_K, 3, 2):
        by_level = {s for s in normal if s.count(".") + 1 == k}
        wild_base = {s for s in wild if s.count(".") + 1 == k - 1}
        cond = (n >= k) & (
            in_set(sfx(k), by_level) | in_set(sfx(k - 1), wild_base)
        )
        expr = expr.when(cond, F.lit(k))
    ps_len = expr.otherwise(F.lit(1))

    reg = F.array_join(F.slice(labels, -(F.lit(1) + ps_len), F.lit(1) + ps_len), ".")
    return (
        F.when(host.rlike(_IPV4_RE) | host.startswith("["), host)  # IPs
        .when(n <= ps_len + 1, host)  # host IS (or is within) a public suffix
        .otherwise(reg)
    )


def registrable_domain_expr(
    url_col: str = "url", rules: dict[str, list[str]] | None = None
) -> Column:
    """Registrable domain straight from a URL column."""
    return registrable_domain_of_host(host_expr(url_col), rules=rules)


# --- DuckDB oracle mirror -------------------------------------------------

def _sql_in(frag: str, values: set[str]) -> str:
    if not values:
        return "FALSE"
    lst = ", ".join("'" + v + "'" for v in sorted(values))
    return f"({frag}) IN ({lst})"


def psl_oracle_sql(host_frag: str, rules: dict[str, list[str]] | None = None) -> str:
    """ANSI/DuckDB SQL computing the same registrable domain from a host
    expression — generated from the SAME snapshot so both engines share
    one truth table. ``host_frag`` must be a lowercased, port-stripped
    host SQL fragment."""
    r = rules or SUFFIX_SNAPSHOT
    normal = set(r["rules"])
    wild = set(r["wildcards"])
    exc = set(r["exceptions"])
    lab = f"string_split({host_frag}, '.')"
    n = f"len({lab})"

    def sfx(k: int) -> str:
        return f"array_to_string({lab}[-{k}:], '.')"

    whens = []
    for k in (4, 3, 2):
        by_level = {s for s in exc if s.count(".") + 1 == k}
        whens.append(
            f"WHEN {n} >= {k} AND {_sql_in(sfx(k), by_level)} THEN {k - 1}"
        )
    for k in (_MAX_K, 3, 2):
        by_level = {s for s in normal if s.count(".") + 1 == k}
        wild_base = {s for s in wild if s.count(".") + 1 == k - 1}
        whens.append(
            f"WHEN {n} >= {k} AND ({_sql_in(sfx(k), by_level)}"
            f" OR {_sql_in(sfx(k - 1), wild_base)}) THEN {k}"
        )
    ps_len = "CASE " + " ".join(whens) + " ELSE 1 END"
    return f"""
      CASE
        WHEN regexp_matches({host_frag}, '{_IPV4_RE}')
             OR {host_frag} LIKE '[%' THEN {host_frag}
        WHEN {n} <= ({ps_len}) + 1 THEN {host_frag}
        ELSE array_to_string({lab}[-(({ps_len}) + 1):], '.')
      END
    """
