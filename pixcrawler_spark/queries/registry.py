"""Registry of named queries with optional DuckDB oracle SQL.

Contract (from the driver): the Spark callable and the oracle SQL must
produce identical row counts, schemas (column names), and
order-insensitive value hashes at sf=0.01. Rules we follow to make the
comparison robust across engines:

- every computed column is explicitly aliased, identically in both;
- integer aggregates are cast to BIGINT in the oracle (DuckDB SUM of
  integers yields HUGEINT otherwise);
- floating aggregates are ``round(x, 4)`` on both sides so partial-sum
  ordering differences (32-way parallel vs single-threaded) cannot
  flip the value hash;
- timestamps: Spark session TZ is pinned to UTC (session.py) to match
  DuckDB's naive-UTC timestamps.
"""

from __future__ import annotations

import functools
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from pixcrawler_spark.session import tune_session

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator registering a query under ``name``."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")

        @functools.wraps(fn)
        def tuned(spark: SparkSession, sf_dir: str) -> DataFrame:
            # the driver runs queries on a session it built itself;
            # apply the engine's runtime tuning (optimizer-rule
            # exclusions) there too
            tune_session(spark)
            # Queries persist() self-join sides (fingerprints, edges,
            # bucket frames) and never unpersist — correct within one
            # query, but across a multi-query driver/bench run the
            # cached blocks accumulate and silently eat storage memory.
            # Each query starts from a clean cache; the previous
            # query's DataFrame was already materialized by the caller.
            spark.catalog.clearCache()
            return fn(spark, sf_dir)

        REGISTRY[name] = Query(name=name, fn=tuned, oracle=oracle, doc=doc)
        return fn

    return wrap
