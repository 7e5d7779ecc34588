"""Production entrypoint: the PIT feature build as a spark-submit job.

    spark-submit --py-files turboxsl_spark.zip jobs/build_features_job.py \
        --input  /path/to/transcripts_snapshot_store_or_parquet \
        --output /path/to/feature_table \
        --session-timeout 1800 --buckets 256

Reads the latest snapshot (SnapshotStore layout) or a plain parquet
path, builds the flagship feature surface, and writes it with the
resumable bucket manifest — re-running after a kill completes only the
uncommitted buckets. On a cluster, ``--master``/executors come from
spark-submit; this script never sets a master.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument(
        "--iceberg-table",
        action="store_true",
        help="treat --input as an Iceberg table name resolved through the "
        "session's spark.sql.catalog.* conf (snapshot-id time travel via "
        "--snapshot-id); requires the iceberg-spark-runtime jar",
    )
    ap.add_argument("--output", required=True)
    ap.add_argument("--session-timeout", type=int, default=1800)
    ap.add_argument("--buckets", type=int, default=256)
    ap.add_argument("--snapshot-id", type=int, default=None)
    ap.add_argument("--keep-text", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from turboxsl_spark.plans.featurespec import FeatureSpec, build_features
    from turboxsl_spark.plans.manifest import write_with_manifest
    from turboxsl_spark.sources.snapshots import IcebergSnapshotStore, SnapshotStore

    spark = SparkSession.builder.appName("turboxsl-feature-build").getOrCreate()

    snapshot = None
    if args.iceberg_table:
        store = IcebergSnapshotStore(spark, args.input)
        sid = args.snapshot_id or store.latest_id()
        df = store.read(spark, snapshot_id=sid)
        snapshot = f"iceberg:{sid}"
    elif os.path.exists(os.path.join(args.input, "_snapshots.json")):
        store = SnapshotStore(args.input)
        sid = args.snapshot_id or store.latest_id()
        df = store.read(spark, snapshot_id=sid)
        snapshot = f"snap-{sid}"
    else:
        df = spark.read.parquet(args.input)

    spec = FeatureSpec(
        session_timeout_s=args.session_timeout, keep_text=args.keep_text
    )
    out = build_features(df, spec)
    committed = write_with_manifest(
        out, args.output, n_buckets=args.buckets, input_snapshot=snapshot
    )
    print(
        json.dumps(
            {
                "committed_buckets": len(committed),
                "rows": sum(e["rows"] for e in committed),
                "input_snapshot": snapshot,
                "output": args.output,
            }
        )
    )


if __name__ == "__main__":
    main()
