"""Mirror of the driver's correctness gate: every registered query with
an oracle must match DuckDB on row count, column names, and
order-insensitive values (exact for ints/strings/bools, 1e-9 for
floats — queries round their float outputs so this is effectively
exact)."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

from pixcrawler_spark.queries import REGISTRY
from pixcrawler_spark.sources.tables import TESTDATA_TABLES

SF_DIR = os.environ.get("PIXCRAWLER_TEST_SF", "/root/testdata/sf0.001")


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con.execute(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs oracle {len(duck_pdf)}"
    )
    # Exact ORDER, not just the same set — the driver's schema check is
    # column-order-sensitive, so the mirror must be too.
    assert list(spark_pdf.columns) == list(duck_pdf.columns), (
        f"{name}: columns {list(spark_pdf.columns)} vs {list(duck_pdf.columns)}"
    )
    s = _normalize(spark_pdf)
    d = _normalize(duck_pdf)
    for c in s.columns:
        sv, dv = s[c].tolist(), d[c].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            if isinstance(a, float) or isinstance(b, float):
                fa, fb = float(a), float(b)
                if math.isnan(fa) and math.isnan(fb):
                    continue
                assert abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb)), (
                    f"{name}: col {c} row {i}: {a!r} != {b!r}"
                )
            else:
                assert a == b, f"{name}: col {c} row {i}: {a!r} != {b!r}"


ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, name):
    q = REGISTRY[name]
    spark_pdf = q.fn(spark, SF_DIR).toPandas()
    duck_pdf = _duck(q.oracle)
    _compare(spark_pdf, duck_pdf, name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()).issubset(set(e.queries()))
