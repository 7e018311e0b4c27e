"""Invariant tests for the lakehouse layout batch: Morton key
properties, the zone-map pruning win, and profile correctness."""

from __future__ import annotations

from pyspark.sql import functions as F

from pixcrawler_spark.queries import REGISTRY
from pixcrawler_spark.queries.lakehouse import _ZM_DIM, morton_expr

SF = "/root/testdata/sf0.001"


def _morton_py(a: int, b: int, bits: int = 16) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_morton_matches_python_and_is_injective(spark):
    pdf = REGISTRY["store_zorder_keys"].fn(spark, SF).toPandas()
    for _, r in pdf.head(200).iterrows():
        assert r["zkey"] == _morton_py(
            int(r["domain_bucket"]), int(r["time_bucket"])
        )
    # injective on the bucket pair: one zkey per (a, b)
    assert (
        pdf.groupby("zkey")[["domain_bucket", "time_bucket"]]
        .nunique()
        .max()
        .max()
        == 1
    )


def test_morton_dimension_separation(spark):
    """morton(a, 0) uses only even bit positions, morton(0, b) only
    odd — the interleave really alternates dimensions."""
    df = spark.range(0, _ZM_DIM).select(
        F.col("id").alias("a"), F.lit(0).cast("bigint").alias("z")
    )
    even = df.select(
        morton_expr(F.col("a"), F.col("z")).alias("m")
    ).toPandas()
    odd = df.select(
        morton_expr(F.col("z"), F.col("a")).alias("m")
    ).toPandas()
    even_mask = sum(1 << (2 * i) for i in range(16))
    odd_mask = sum(1 << (2 * i + 1) for i in range(16))
    assert (even["m"] & ~even_mask == 0).all()
    assert (odd["m"] & ~odd_mask == 0).all()


def test_zonemap_zorder_prunes_natural_does_not(spark):
    pdf = (
        REGISTRY["store_zonemap_pruning"].fn(spark, SF)
        .toPandas()
        .set_index("layout")
    )
    # arrival order scatters every domain across every block
    assert pdf.loc["natural", "skip_frac"] == 0.0
    # the z-order layout must actually skip a majority of blocks
    assert pdf.loc["zorder", "skip_frac"] > 0.5
    assert (
        pdf.loc["zorder", "n_blocks"] == pdf.loc["natural", "n_blocks"]
    )


def test_profile_matches_pandas(spark):
    pdf = (
        REGISTRY["profile_table_stats"].fn(spark, SF)
        .toPandas()
        .set_index("col")
    )
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    for col in ("doc_id", "lang", "source", "n_chars"):
        row = pdf.loc[col]
        assert row["n_rows"] == len(docs)
        assert row["n_null"] == docs[col].isna().sum()
        assert row["n_distinct"] == docs[col].nunique()
        assert row["min_val"] == str(docs[col].min())
        assert row["max_val"] == str(docs[col].max())
