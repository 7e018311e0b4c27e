"""Query registry: every implemented operator exposed as a named query.

Each query is a (Spark callable, DuckDB oracle SQL) pair over the
driver-generated testdata tables — the correctness contract of
``__spark_entry__.py``. Importing this package registers everything.
"""

from pixcrawler_spark.queries.registry import REGISTRY, Query, register

# Import for registration side effects. ORDER MATTERS: the driver's
# correctness harness evaluates the first 50 registry entries, so the
# newest / least-proven queries register FIRST and the longest-stable
# blocks (advanced q21-q29, analytics q01-q20 — green in every prior
# round) register last and absorb any overflow past the cap. The
# overflow queries are NOT unverified: tests/test_queries_oracle.py
# parameterizes over the ENTIRE registry and runs every query against
# its DuckDB oracle on every pytest run, driver cap or not.
from pixcrawler_spark.queries import media as _media  # noqa: F401
from pixcrawler_spark.queries import jobops as _jobops  # noqa: F401
# webtext transitively imports pipeline + scalepath, so those two
# register here (before crawlops) regardless of the lines below
from pixcrawler_spark.queries import webtext as _webtext  # noqa: F401
from pixcrawler_spark.queries import urlgraph as _urlgraph  # noqa: F401
from pixcrawler_spark.queries import scalepath as _scalepath  # noqa: F401
from pixcrawler_spark.queries import pipeline as _pipeline  # noqa: F401
from pixcrawler_spark.queries import crawlops as _crawlops  # noqa: F401
from pixcrawler_spark.queries import advanced as _advanced  # noqa: F401
from pixcrawler_spark.queries import analytics as _analytics  # noqa: F401

__all__ = ["REGISTRY", "Query", "register"]
