"""Query registry: every implemented operator exposed as a named query.

Each query is a (Spark callable, DuckDB oracle SQL) pair over the
driver-generated testdata tables — the correctness contract of
``__spark_entry__.py``. Importing this package registers everything.
"""

from pixcrawler_spark.queries.registry import REGISTRY, Query, register

# Import for registration side effects.
from pixcrawler_spark.queries import analytics as _analytics  # noqa: F401
from pixcrawler_spark.queries import pipeline as _pipeline  # noqa: F401
from pixcrawler_spark.queries import crawlops as _crawlops  # noqa: F401
from pixcrawler_spark.queries import advanced as _advanced  # noqa: F401
from pixcrawler_spark.queries import scalepath as _scalepath  # noqa: F401
from pixcrawler_spark.queries import media as _media  # noqa: F401
from pixcrawler_spark.queries import jobops as _jobops  # noqa: F401

__all__ = ["REGISTRY", "Query", "register"]
