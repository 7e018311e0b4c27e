"""Round-4 queries: PSL registrable domains, incremental dedup, recall frontier.

Registered FIRST so every new query lands inside the driver's 50-entry
correctness window (see queries/__init__.py rotation schedule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pixcrawler_spark.queries.registry import register
from pixcrawler_spark.sources.tables import load_table

__all__: list[str] = []
