"""Table layer: parquet-backed ACID-ish store with an Iceberg upgrade path.

The north rule targets Iceberg tables; this sandbox has no Iceberg jar,
so the store writes parquet snapshots under a table directory with an
atomically-renamed manifest pointer — the same append/commit/read
surface (``append``, ``read``, ``snapshot_id``) so the engine code
never branches on the backend. On a cluster, swap ``ParquetTableStore``
for ``df.writeTo(tbl).append()`` against a real catalog.

Reference analogs: the image sink + progress cache + Postgres rows
(builder/_search_engines.py:190-202, builder/progress.py:37-154,
backend/database/models.py) all collapse into this one table layer.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-generated parquet table (TESTDATA.md)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


class TableStore:
    """Append-only snapshot table over parquet with a manifest pointer.

    Layout::

        <root>/<table>/data/<snapshot-uuid>/part-*.parquet   (appends)
        <root>/<table>/manifest.json                          (pointer)

    ``manifest.json`` lists committed snapshot dirs in commit order; a
    reader unions exactly the committed snapshots, so a crashed append
    (data written, manifest not updated) is invisible — the same
    snapshot-isolation property Iceberg gives, at tiny scale. Commit is
    a POSIX atomic rename.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- internals ---------------------------------------------------------
    def _tdir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self._tdir(table), "manifest.json")

    def _read_manifest(self, table: str) -> dict:
        p = self._manifest_path(table)
        if not os.path.exists(p):
            return {"snapshots": [], "schema": None}
        with open(p) as f:
            return json.load(f)

    def _write_manifest(self, table: str, manifest: dict) -> None:
        tmp = self._manifest_path(table) + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(table))

    # -- public surface ----------------------------------------------------
    def exists(self, table: str) -> bool:
        return bool(self._read_manifest(table)["snapshots"])

    def append(self, table: str, df: DataFrame) -> str:
        """Commit ``df`` as a new snapshot; returns the snapshot id."""
        snap = f"snap-{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}"
        data_dir = os.path.join(self._tdir(table), "data", snap)
        df.write.mode("overwrite").parquet(data_dir)
        manifest = self._read_manifest(table)
        manifest["snapshots"].append(snap)
        manifest["schema"] = df.schema.json()
        self._write_manifest(table, manifest)
        return snap

    def overwrite(self, table: str, df: DataFrame) -> str:
        """Replace table contents with ``df`` (single-snapshot commit)."""
        snap = f"snap-{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}"
        data_dir = os.path.join(self._tdir(table), "data", snap)
        df.write.mode("overwrite").parquet(data_dir)
        self._write_manifest(
            table, {"snapshots": [snap], "schema": df.schema.json()}
        )
        return snap

    def read(self, table: str, schema: StructType | None = None) -> DataFrame:
        manifest = self._read_manifest(table)
        if not manifest["snapshots"]:
            if schema is None:
                raise FileNotFoundError(f"table {table} has no snapshots")
            return self.spark.createDataFrame([], schema)
        paths = [
            os.path.join(self._tdir(table), "data", s)
            for s in manifest["snapshots"]
        ]
        return self.spark.read.parquet(*paths)

    def snapshots(self, table: str) -> list[str]:
        return list(self._read_manifest(table)["snapshots"])

    def rollback_to(self, table: str, snapshot: str) -> None:
        """Drop snapshots committed after ``snapshot`` (time travel)."""
        manifest = self._read_manifest(table)
        snaps = manifest["snapshots"]
        if snapshot not in snaps:
            raise KeyError(snapshot)
        manifest["snapshots"] = snaps[: snaps.index(snapshot) + 1]
        self._write_manifest(table, manifest)

    def drop(self, table: str) -> None:
        shutil.rmtree(self._tdir(table), ignore_errors=True)
