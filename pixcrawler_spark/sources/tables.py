"""Table layer: parquet-backed ACID-ish store with an Iceberg upgrade path.

The north rule targets Iceberg tables; this sandbox has no Iceberg jar,
so the store writes parquet snapshots under a table directory with an
atomically-renamed manifest pointer — the same append/commit/read
surface (``append``, ``read``, ``snapshot_id``) so the engine code
never branches on the backend. On a cluster, swap ``ParquetTableStore``
for ``df.writeTo(tbl).append()`` against a real catalog.

Bucketed tables: tables whose every consumer joins on one key (the
crawl engine's ``seen`` / ``pages_ext`` / ``frontier``, all url-keyed)
are stored as Spark catalog tables ``CLUSTERED BY (url) INTO N
BUCKETS``. A bucketed scan reports HashPartitioning(url, N), so the
seen anti-join, the fetch join, and the frontier-remainder anti-join
all run with ZERO exchange on the big static side — only the small
per-round delta shuffles. This is the parquet stand-in for Iceberg's
bucket partition transform (``bucket(N, url)``); at 10^10-URL scale it
is the difference between re-shuffling the full seen set every round
and shuffling only the round's discoveries. Catalog metadata is
re-registered from the manifest on session restart (external-table
DDL over the existing bucket files), so resume works across processes.

Reference analogs: the image sink + progress cache + Postgres rows
(builder/_search_engines.py:190-202, builder/progress.py:37-154,
backend/database/models.py) all collapse into this one table layer.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
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


# tables small enough that a broadcast-join plan should see the bare
# scan (repartitioning a dim would add an exchange for nothing)
_DIM_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-generated parquet table (TESTDATA.md).

    Under-split guard: the sandbox fixtures are single-row-group
    parquet files, so a narrow (shuffle-free) plan over them runs as
    ONE task no matter how many cores exist — file splits are the only
    parallelism source for scan-side work. When the file would yield
    fewer splits than the session's cores, fact tables are
    repartitioned to default parallelism (a sub-ms shuffle at fixture
    scale). On a real cluster the condition never fires: a 100 TB
    table has orders of magnitude more splits than cores, and the read
    stays a bare scan with pushdown intact (the repartition sits ABOVE
    the scan node, so filter/column pushdown still reaches parquet).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name in _DIM_TABLES:
        return df
    cores = spark.sparkContext.defaultParallelism
    raw = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    max_split = int(raw) if raw.isdigit() else 128 * 1024 * 1024
    try:
        size = os.path.getsize(path) if os.path.isfile(path) else sum(
            os.path.getsize(os.path.join(path, f))
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    except OSError:
        return df
    if (size + max_split - 1) // max_split < cores:
        return df.repartition(cores)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def _schema_ddl(schema: StructType) -> str:
    return ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
    )


class TableStore:
    """Append-only snapshot table over parquet with a manifest pointer.

    Layout::

        <root>/<table>/data/<snapshot-uuid>/part-*.parquet   (appends)
        <root>/<table>/manifest.json                          (pointer)

    ``manifest.json`` lists committed snapshot dirs in commit order
    (each entry ``{"snap": dir, "tag": optional-str}``); a reader
    unions exactly the committed snapshots, so a crashed append (data
    written, manifest not updated) is invisible — the same
    snapshot-isolation property Iceberg gives, at tiny scale. Commit is
    a POSIX atomic rename. ``drop_tagged`` removes snapshots by tag,
    which the crawl engine uses to make a re-run of a crashed round
    idempotent (drop any ``round-N`` snapshots before re-appending).

    Bucketed tables (``bucket=(cols, n)`` on overwrite/append) live as
    external Spark catalog tables instead; see module docstring. Their
    append path has weaker crash atomicity than the manifest (Spark's
    file-commit protocol only) — Iceberg restores full ACID in
    production.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        # catalog names must be unique per store root within a session
        self._cat_id = hashlib.md5(os.path.abspath(root).encode()).hexdigest()[:8]
        os.makedirs(root, exist_ok=True)

    # -- internals ---------------------------------------------------------
    def _tdir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self._tdir(table), "manifest.json")

    def _read_manifest(self, table: str) -> dict:
        p = self._manifest_path(table)
        if not os.path.exists(p):
            return {"snapshots": [], "schema": None, "bucketed": None, "meta": {}}
        with open(p) as f:
            m = json.load(f)
        # back-compat: plain-string snapshot entries
        m["snapshots"] = [
            s if isinstance(s, dict) else {"snap": s, "tag": None}
            for s in m.get("snapshots", [])
        ]
        m.setdefault("bucketed", None)
        m.setdefault("meta", {})
        return m

    def _write_manifest(self, table: str, manifest: dict) -> None:
        os.makedirs(self._tdir(table), exist_ok=True)
        tmp = self._manifest_path(table) + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(table))

    def _new_snap(self) -> str:
        return f"snap-{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}"

    # -- bucketed internals ------------------------------------------------
    def _cat_name(self, table: str, generation: int) -> str:
        return f"pixstore_{self._cat_id}_{table}_g{generation}"

    def _register_bucketed(self, table: str, manifest: dict) -> str:
        """Ensure the catalog table for the current generation exists
        (re-created from manifest DDL after a session restart)."""
        b = manifest["bucketed"]
        name = self._cat_name(table, b["generation"])
        if not self.spark.catalog.tableExists(name):
            schema = StructType.fromJson(json.loads(manifest["schema"]))
            cols = ", ".join(f"`{c}`" for c in b["cols"])
            self.spark.sql(
                f"CREATE TABLE {name} ({_schema_ddl(schema)}) USING PARQUET "
                f"CLUSTERED BY ({cols}) SORTED BY ({cols}) "
                f"INTO {b['n']} BUCKETS LOCATION '{b['location']}'"
            )
        return name

    def _drop_catalog(self, name: str) -> None:
        try:
            self.spark.sql(f"DROP TABLE IF EXISTS {name}")
        except Exception:
            pass

    # -- public surface ----------------------------------------------------
    def exists(self, table: str) -> bool:
        m = self._read_manifest(table)
        return bool(m["snapshots"]) or m["bucketed"] is not None

    def append(
        self,
        table: str,
        df: DataFrame,
        tag: str | None = None,
        bucket: tuple[tuple[str, ...], int] | None = None,
    ) -> str:
        """Commit ``df`` as a new snapshot; returns the snapshot id.
        For bucketed tables the rows are inserted into the current
        generation's bucket files. ``tag`` is not tracked per-row there
        (crash recovery for bucketed appends goes through a guard
        column + ``column_max``, see plans/crawl.py), so passing one
        raises rather than silently changing recovery behavior; same
        for a ``bucket`` request against an existing plain table."""
        manifest = self._read_manifest(table)
        if manifest["bucketed"] is not None or (
            bucket is not None and not manifest["snapshots"]
        ):
            if manifest["bucketed"] is not None and tag is not None:
                raise ValueError(
                    f"append(tag=...) is not supported for bucketed table "
                    f"{table!r}: tags live in the manifest, which bucketed "
                    f"appends bypass — guard reads by a round column instead"
                )
            if manifest["bucketed"] is None:
                return self.overwrite(table, df, bucket=bucket)
            name = self._register_bucketed(table, manifest)
            b = manifest["bucketed"]
            (
                # repartition to the bucket layout first: each reducer
                # then owns exactly one bucket and writes ONE file
                # (otherwise every task writes a file per bucket —
                # tasks*N tiny files per commit)
                df.repartition(b["n"], *[F.col(c) for c in b["cols"]])
                .write.bucketBy(b["n"], *b["cols"])
                .sortBy(*b["cols"])
                .mode("append")
                .format("parquet")
                .saveAsTable(name)
            )
            return name
        if bucket is not None:
            raise ValueError(
                f"append(bucket=...) against existing plain table {table!r}: "
                f"the layout would silently differ from the request — "
                f"overwrite() with bucket= to convert, or append plain"
            )
        snap = self._new_snap()
        data_dir = os.path.join(self._tdir(table), "data", snap)
        df.write.mode("overwrite").parquet(data_dir)
        manifest["snapshots"].append({"snap": snap, "tag": tag})
        manifest["schema"] = df.schema.json()
        self._write_manifest(table, manifest)
        return snap

    def stage_overwrite(
        self,
        table: str,
        df: DataFrame,
        bucket: tuple[tuple[str, ...], int] | None = None,
        meta: dict | None = None,
    ) -> dict:
        """Run the (expensive) data write of an overwrite WITHOUT
        committing it: readers keep seeing the old generation until
        ``commit_staged`` flips the manifest (one atomic rename). This
        is how the crawl round orders its commits — the frontier's data
        job runs concurrently with the results/seen appends, but its
        commit happens strictly after theirs, making the frontier flip
        the round's single commit point. A crash between stage and
        commit leaks only an orphan data dir (never a visible state).
        """
        old = self._read_manifest(table)
        snap = self._new_snap()
        data_dir = os.path.join(self._tdir(table), "data", snap)
        token: dict = {"table": table, "old": old, "meta": meta or {}}
        if bucket is not None:
            cols, n = bucket
            gen = (old["bucketed"]["generation"] + 1) if old["bucketed"] else 1
            name = self._cat_name(table, gen)
            self._drop_catalog(name)
            (
                df.repartition(n, *[F.col(c) for c in cols])
                .write.bucketBy(n, *cols)
                .sortBy(*cols)
                .option("path", data_dir)
                .mode("overwrite")
                .format("parquet")
                .saveAsTable(name)
            )
            token["manifest"] = {
                "snapshots": [],
                "schema": df.schema.json(),
                "bucketed": {
                    "cols": list(cols),
                    "n": n,
                    "generation": gen,
                    "location": data_dir,
                },
                "meta": meta or {},
            }
            token["name"] = name
            return token
        df.write.mode("overwrite").parquet(data_dir)
        token["manifest"] = {
            "snapshots": [{"snap": snap, "tag": None}],
            "schema": df.schema.json(),
            "bucketed": None,
            "meta": meta or {},
        }
        token["name"] = snap
        return token

    def commit_staged(self, token: dict) -> str:
        """Atomically publish a ``stage_overwrite`` result and clean up
        the previous generation."""
        table, old = token["table"], token["old"]
        self._write_manifest(table, token["manifest"])
        if old["bucketed"]:
            self._drop_catalog(self._cat_name(table, old["bucketed"]["generation"]))
            shutil.rmtree(old["bucketed"]["location"], ignore_errors=True)
        elif token["manifest"]["bucketed"] is not None:
            # plain → bucketed conversion: old plain snapshots are dead
            for s in old["snapshots"]:
                shutil.rmtree(
                    os.path.join(self._tdir(table), "data", s["snap"]),
                    ignore_errors=True,
                )
        return token["name"]

    def overwrite(
        self,
        table: str,
        df: DataFrame,
        bucket: tuple[tuple[str, ...], int] | None = None,
        meta: dict | None = None,
    ) -> str:
        """Replace table contents with ``df`` (single-snapshot commit).
        Writes to a fresh location then flips the manifest, so reading
        the old generation while writing the new one is safe. ``meta``
        is an arbitrary JSON dict stored in the manifest (the engine
        stamps the producing round into it — Iceberg snapshot-summary
        analog), readable via ``table_meta``."""
        return self.commit_staged(self.stage_overwrite(table, df, bucket, meta))

    def table_meta(self, table: str) -> dict:
        """The ``meta`` dict of the table's current generation ({} if
        absent)."""
        return self._read_manifest(table).get("meta") or {}

    def read(self, table: str, schema: StructType | None = None) -> DataFrame:
        manifest = self._read_manifest(table)
        if manifest["bucketed"] is not None:
            return self.spark.table(self._register_bucketed(table, manifest))
        if not manifest["snapshots"]:
            if schema is None:
                raise FileNotFoundError(f"table {table} has no snapshots")
            return self.spark.createDataFrame([], schema)
        paths = [
            os.path.join(self._tdir(table), "data", s["snap"])
            for s in manifest["snapshots"]
        ]
        return self.spark.read.parquet(*paths)

    def read_at(self, table: str, snapshot: str) -> DataFrame:
        """Non-destructive time travel (the Iceberg ``VERSION AS OF``
        analog): read the table as of ``snapshot`` — every snapshot up
        to and including it — without touching the manifest.
        ``rollback_to`` is the destructive variant; this one lets a
        debugging/audit reader inspect any committed state while the
        crawl keeps appending."""
        manifest = self._read_manifest(table)
        if manifest["bucketed"] is not None:
            raise ValueError("read_at is not supported for bucketed tables")
        snaps = [s["snap"] for s in manifest["snapshots"]]
        if snapshot not in snaps:
            raise KeyError(snapshot)
        paths = [
            os.path.join(self._tdir(table), "data", s)
            for s in snaps[: snaps.index(snapshot) + 1]
        ]
        return self.spark.read.parquet(*paths)

    def read_changes(
        self,
        table: str,
        since: str | None = None,
        until: str | None = None,
    ) -> DataFrame:
        """Incremental (CDC) scan — the Iceberg incremental-append-scan
        analog (``spark.read.option("start-snapshot-id", ...)``): the
        rows committed AFTER snapshot ``since`` (exclusive; ``None`` =
        from the beginning) up to and including ``until`` (``None`` =
        current head), each stamped with ``_commit_snapshot`` (the
        snapshot that committed it) and ``_change_type`` ('insert' —
        the store is append-only; deletes happen as whole-generation
        overwrites, which reset history like Iceberg's
        ``replace``-type snapshots).

        This is the O(delta) feed for downstream incremental
        consumers — per-round dedup (dedup_minhash_incremental),
        training-data export, index maintenance — reading exactly the
        new snapshot dirs instead of rescanning the table: the scan
        cost is the delta's bytes regardless of table size. Scans the
        bounded snapshot list driver-side (same as ``read``); the data
        itself never moves through the driver.

        Raises ``KeyError`` if ``since``/``until`` is not a live
        snapshot — in particular a snapshot folded away by
        ``expire_snapshots`` can no longer anchor an incremental read
        (the honest Iceberg behavior: expired history is gone; the
        consumer must fall back to a full scan)."""
        manifest = self._read_manifest(table)
        if manifest["bucketed"] is not None:
            raise ValueError(
                "read_changes is not supported for bucketed tables: "
                "bucketed appends bypass the snapshot manifest — guard "
                "incremental reads by a round column instead"
            )
        snaps = [s["snap"] for s in manifest["snapshots"]]
        lo = 0
        if since is not None:
            if since not in snaps:
                raise KeyError(since)
            lo = snaps.index(since) + 1
        hi = len(snaps)
        if until is not None:
            if until not in snaps:
                raise KeyError(until)
            hi = snaps.index(until) + 1
        if hi < lo:
            raise ValueError(
                f"until={until!r} precedes since={since!r} in commit order"
            )
        delta = snaps[lo:hi]
        if not delta:
            if manifest["schema"] is None:
                raise FileNotFoundError(f"table {table} has no snapshots")
            schema = StructType.fromJson(json.loads(manifest["schema"]))
            empty = self.spark.createDataFrame([], schema)
            return empty.select(
                "*",
                F.lit(None).cast("string").alias("_commit_snapshot"),
                F.lit("insert").alias("_change_type"),
            ).where(F.lit(False))
        parts = []
        for s in delta:
            parts.append(
                self.spark.read.parquet(
                    os.path.join(self._tdir(table), "data", s)
                ).select(
                    "*",
                    F.lit(s).alias("_commit_snapshot"),
                    F.lit("insert").alias("_change_type"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def append_local(self, table: str, rows: list[tuple], schema: StructType,
                     tag: str | None = None) -> str:
        """Commit a tiny driver-side row set as a snapshot WITHOUT a
        Spark job (pyarrow write + manifest flip) — for per-round
        metrics/telemetry tables where a full job would cost more
        driver latency than the data is worth. Readers see an ordinary
        parquet snapshot."""
        import pyarrow as pa
        import pyarrow.parquet as papq

        manifest = self._read_manifest(table)
        if manifest["bucketed"] is not None:
            raise ValueError("append_local not supported for bucketed tables")
        snap = self._new_snap()
        data_dir = os.path.join(self._tdir(table), "data", snap)
        os.makedirs(data_dir, exist_ok=True)
        arrays, names = [], []
        for i, f in enumerate(schema.fields):
            vals = [r[i] for r in rows]
            t = f.dataType.simpleString()
            pa_type = {
                "int": pa.int32(), "bigint": pa.int64(),
                "double": pa.float64(), "string": pa.string(),
                "boolean": pa.bool_(),
            }.get(t)
            arrays.append(pa.array(vals, pa_type))
            names.append(f.name)
        papq.write_table(
            pa.table(dict(zip(names, arrays))),
            os.path.join(data_dir, "part-00000.parquet"),
        )
        manifest["snapshots"].append({"snap": snap, "tag": tag})
        manifest["schema"] = schema.json()
        self._write_manifest(table, manifest)
        return snap

    def put_blob(self, name: str, data: bytes, meta: dict) -> None:
        """Atomically store an opaque sidecar blob + JSON metadata
        (used for the incremental seen-set bloom filter). Blob and meta
        commit together via one atomic rename of the meta file."""
        d = os.path.join(self.root, "_blobs")
        os.makedirs(d, exist_ok=True)
        gen = uuid.uuid4().hex[:8]
        bin_path = os.path.join(d, f"{name}.{gen}.bin")
        with open(bin_path, "wb") as f:
            f.write(data)
        meta = dict(meta, _bin=os.path.basename(bin_path))
        tmp = os.path.join(d, f"{name}.json.tmp.{gen}")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        old = self.get_blob(name)
        os.replace(tmp, os.path.join(d, f"{name}.json"))
        if old is not None:
            try:
                os.remove(os.path.join(d, old[1]["_bin"]))
            except OSError:
                pass

    def get_blob(self, name: str) -> tuple[bytes, dict] | None:
        d = os.path.join(self.root, "_blobs")
        meta_path = os.path.join(d, f"{name}.json")
        if not os.path.exists(meta_path):
            return None
        with open(meta_path) as f:
            meta = json.load(f)
        bin_path = os.path.join(d, meta["_bin"])
        if not os.path.exists(bin_path):
            return None
        with open(bin_path, "rb") as f:
            return f.read(), meta

    def count(self, table: str) -> int:
        """Exact row count from parquet footers (driver-side metadata
        read, no Spark job — the Iceberg manifest-stats analog)."""
        import pyarrow.parquet as pq

        manifest = self._read_manifest(table)
        if manifest["bucketed"] is not None:
            dirs = [manifest["bucketed"]["location"]]
        else:
            dirs = [
                os.path.join(self._tdir(table), "data", s["snap"])
                for s in manifest["snapshots"]
            ]
        total = 0
        for d in dirs:
            if not os.path.isdir(d):
                continue
            for f in os.listdir(d):
                if f.endswith(".parquet") or (
                    f.startswith("part-") and not f.endswith(".crc")
                ):
                    try:
                        total += pq.ParquetFile(os.path.join(d, f)).metadata.num_rows
                    except Exception:
                        pass
        return total

    def column_max(self, table: str, col: str):
        """Max value of ``col`` from parquet row-group statistics
        (driver-side footer read, no Spark job — the Iceberg
        manifest-stats analog). Returns None for an empty/absent table
        or when no row group carries stats for the column. The crawl
        engine uses this to detect half-committed bucketed ``seen``
        appends on crash recovery (``max(completed_round)``) without
        scanning data."""
        import pyarrow.parquet as pq

        manifest = self._read_manifest(table)
        if manifest["bucketed"] is not None:
            dirs = [manifest["bucketed"]["location"]]
        else:
            dirs = [
                os.path.join(self._tdir(table), "data", s["snap"])
                for s in manifest["snapshots"]
            ]
        best = None
        for d in dirs:
            if not os.path.isdir(d):
                continue
            for f in os.listdir(d):
                if not (
                    f.endswith(".parquet")
                    or (f.startswith("part-") and not f.endswith(".crc"))
                ):
                    continue
                try:
                    md = pq.ParquetFile(os.path.join(d, f)).metadata
                except Exception:
                    continue
                idx = None
                if md.num_row_groups:
                    rg0 = md.row_group(0)
                    for i in range(rg0.num_columns):
                        if rg0.column(i).path_in_schema == col:
                            idx = i
                            break
                if idx is None:
                    continue
                for rgi in range(md.num_row_groups):
                    st = md.row_group(rgi).column(idx).statistics
                    if st is not None and st.has_min_max:
                        if best is None or st.max > best:
                            best = st.max
        return best

    def snapshots(self, table: str) -> list[str]:
        return [s["snap"] for s in self._read_manifest(table)["snapshots"]]

    def expire_snapshots(
        self, table: str, keep_last: int, fold_tag: str = "_expired_fold"
    ) -> int:
        """Iceberg ``expire_snapshots`` + ``rewrite_data_files`` analog
        for append-mostly round tables (results, round_log, metrics).

        A crawl commits one snapshot per table per round; at 10^5
        rounds the manifest and the per-read file fan-out grow without
        bound — the metadata failure mode of any long-running ingest.
        This FOLDS every snapshot older than the newest ``keep_last``
        into one consolidated snapshot (row content preserved exactly,
        written once, coalesced), then flips the manifest atomically:
        readers see identical data before and after; only time travel
        (``read_at``/``rollback_to``) into the folded range is given
        up, exactly Iceberg's expiration semantics. The newest
        ``keep_last`` snapshots keep their snap ids and tags, so the
        crash-recovery horizon (``drop_tagged`` of the current round)
        must be <= ``keep_last``. Returns the number of snapshots
        folded (0 = nothing to do). Bucketed tables are
        single-generation already and are rejected.

        Reference analog: none — PixCrawler keeps per-keyword progress
        JSON forever (progress.json grows with the crawl); this is the
        from-scratch maintenance story the 10^10-URL north rule needs.
        """
        if keep_last < 0:
            raise ValueError("keep_last must be >= 0")
        manifest = self._read_manifest(table)
        if manifest["bucketed"] is not None:
            raise ValueError(
                f"expire_snapshots not supported for bucketed table {table!r}"
            )
        old = manifest["snapshots"][: len(manifest["snapshots"]) - keep_last]
        if len(old) < 2:
            return 0  # nothing worth folding
        paths = [
            os.path.join(self._tdir(table), "data", s["snap"]) for s in old
        ]
        fold_snap = self._new_snap()
        fold_dir = os.path.join(self._tdir(table), "data", fold_snap)
        # ~128MB target files (rewrite_data_files' default), sized from
        # the inputs' on-disk bytes — a driver-side stat, no Spark job
        nbytes = sum(
            os.path.getsize(os.path.join(r, f))
            for p in paths
            for r, _, fs in os.walk(p)
            for f in fs
        )
        nfiles = max(1, nbytes // (128 << 20))
        df = self.spark.read.parquet(*paths)
        df.coalesce(nfiles).write.mode("overwrite").parquet(fold_dir)
        manifest["snapshots"] = [
            {"snap": fold_snap, "tag": fold_tag}
        ] + manifest["snapshots"][len(old):]
        self._write_manifest(table, manifest)  # atomic flip
        for p in paths:
            shutil.rmtree(p, ignore_errors=True)
        return len(old)

    def remove_orphans(self, table: str) -> int:
        """Iceberg ``remove_orphan_files`` analog: delete data dirs not
        referenced by the committed manifest — the leftovers of writes
        that crashed between ``stage_overwrite`` and ``commit_staged``
        (the documented leak of the staged-commit protocol). Must not
        run concurrently with an in-flight staged write on the same
        table (single-driver rule, same as Iceberg's caveat that the
        retention window must exceed any in-flight commit). Returns the
        number of directories removed."""
        manifest = self._read_manifest(table)
        data_root = os.path.join(self._tdir(table), "data")
        if not os.path.isdir(data_root):
            return 0
        if manifest["bucketed"] is not None:
            live = {os.path.basename(manifest["bucketed"]["location"])}
        else:
            live = {s["snap"] for s in manifest["snapshots"]}
        removed = 0
        for d in os.listdir(data_root):
            if d not in live:
                shutil.rmtree(os.path.join(data_root, d), ignore_errors=True)
                removed += 1
        return removed

    def drop_tagged(self, table: str, tags: set[str]) -> int:
        """Remove snapshots whose tag is in ``tags`` (crash-recovery:
        drop a half-committed round before re-running it). Returns the
        number of snapshots dropped. No-op on bucketed tables."""
        manifest = self._read_manifest(table)
        if manifest["bucketed"] is not None or not manifest["snapshots"]:
            return 0
        keep = [s for s in manifest["snapshots"] if s["tag"] not in tags]
        dropped = [s for s in manifest["snapshots"] if s["tag"] in tags]
        if not dropped:
            return 0
        manifest["snapshots"] = keep
        self._write_manifest(table, manifest)
        for s in dropped:
            shutil.rmtree(
                os.path.join(self._tdir(table), "data", s["snap"]),
                ignore_errors=True,
            )
        return len(dropped)

    def rollback_to(self, table: str, snapshot: str) -> None:
        """Drop snapshots committed after ``snapshot`` (time travel)."""
        manifest = self._read_manifest(table)
        if manifest["bucketed"] is not None:
            raise ValueError("rollback_to is not supported for bucketed tables")
        snaps = [s["snap"] for s in manifest["snapshots"]]
        if snapshot not in snaps:
            raise KeyError(snapshot)
        manifest["snapshots"] = manifest["snapshots"][: snaps.index(snapshot) + 1]
        self._write_manifest(table, manifest)

    def drop(self, table: str) -> None:
        manifest = self._read_manifest(table)
        if manifest["bucketed"] is not None:
            self._drop_catalog(
                self._cat_name(table, manifest["bucketed"]["generation"])
            )
        shutil.rmtree(self._tdir(table), ignore_errors=True)
