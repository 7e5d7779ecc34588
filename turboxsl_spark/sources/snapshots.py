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
leaves no visible snapshot. On a real cluster, swap this class for
``spark.read/write.format("iceberg")`` — the engine code paths
(manifest lineage, resume, PIT reads) are unchanged.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


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
