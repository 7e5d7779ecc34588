"""Snapshot store: atomic commits, time travel, manifest lineage tie-in."""

from __future__ import annotations

import os

import pytest

from turboxsl_spark.plans.manifest import committed_buckets, write_with_manifest
from turboxsl_spark.sources.snapshots import SnapshotStore
from turboxsl_spark.sources.transcripts import TRANSCRIPT_SCHEMA, gen_transcripts_pdf


def test_commit_read_time_travel(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "tbl"))
    pdf1 = gen_transcripts_pdf(n_convs=10, seed=1, mega_frac=0.0)
    pdf2 = gen_transcripts_pdf(n_convs=20, seed=2, mega_frac=0.0)
    s1 = store.commit(spark.createDataFrame(pdf1, TRANSCRIPT_SCHEMA), note="v1")
    s2 = store.commit(spark.createDataFrame(pdf2, TRANSCRIPT_SCHEMA))
    assert (s1, s2) == (1, 2)
    assert store.latest_id() == 2
    assert store.read(spark).count() == len(pdf2)
    assert store.read(spark, snapshot_id=1).count() == len(pdf1)
    log = store.snapshots()
    assert log[0]["rows"] == len(pdf1) and log[1]["parent"] == 1
    with pytest.raises(KeyError):
        store.read(spark, snapshot_id=99)


def test_manifest_records_input_snapshot(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "tbl"))
    pdf = gen_transcripts_pdf(n_convs=8, seed=3, mega_frac=0.0)
    sid = store.commit(spark.createDataFrame(pdf, TRANSCRIPT_SCHEMA))
    src = store.read(spark)
    out = str(tmp_path / "out")
    write_with_manifest(src, out, n_buckets=4, input_snapshot=f"snap-{sid}")
    entries = committed_buckets(out)
    assert all(e["input_snapshot"] == "snap-1" for e in entries.values())


def test_iceberg_branch_config_detection(spark):
    """The real-Iceberg code path exists and is selected purely by
    session conf: with no Iceberg catalog configured (this sandbox) the
    detector returns None and both entry points raise the explicit
    configuration error; with jars+conf present on a cluster the same
    call sites run unchanged. If this session ever HAS a catalog, run
    the real branch instead of skipping."""
    import pytest

    from turboxsl_spark.sources.snapshots import (
        IcebergNotConfigured,
        IcebergSnapshotStore,
        iceberg_catalog,
    )
    from turboxsl_spark.sources.tables import write_bucketed_iceberg

    cat = iceberg_catalog(spark)
    if cat is not None:
        pytest.skip(f"session has Iceberg catalog {cat!r}; covered by cluster runs")
    with pytest.raises(IcebergNotConfigured):
        IcebergSnapshotStore(spark, "db.tx")
    df = spark.range(3).withColumnRenamed("id", "conv_id")
    with pytest.raises(IcebergNotConfigured):
        write_bucketed_iceberg(df, "db.tx", 4, "conv_id")


def test_iceberg_catalog_detector_matches_conf_shape():
    """Detector keys off spark.sql.catalog.<name> = *iceberg* only."""
    from turboxsl_spark.sources.snapshots import iceberg_catalog

    class FakeConf:
        def __init__(self, pairs):
            self._p = pairs
        def getAll(self):
            return self._p

    class FakeCtx:
        def __init__(self, pairs):
            self._c = FakeConf(pairs)
        def getConf(self):
            return self._c

    class FakeSpark:
        def __init__(self, pairs):
            self.sparkContext = FakeCtx(pairs)
            self.conf = object()

    assert iceberg_catalog(FakeSpark([])) is None
    assert (
        iceberg_catalog(
            FakeSpark([("spark.sql.catalog.lake",
                        "org.apache.iceberg.spark.SparkCatalog")])
        )
        == "lake"
    )
    # sub-keys of a catalog (…lake.type) must not match
    assert (
        iceberg_catalog(FakeSpark([("spark.sql.catalog.lake.type", "iceberg-ish")]))
        is None
    )
    assert iceberg_catalog(FakeSpark([("spark.sql.catalog.x", "com.other.Cat")])) is None


def test_iceberg_end_to_end_when_jars_present(spark, tmp_path):
    """REAL-Iceberg integration: auto-skips where the
    iceberg-spark-runtime jar is absent (this sandbox), and runs
    UNCHANGED on any cluster that has it — registers a hadoop catalog
    at runtime, commits twice through IcebergSnapshotStore (bucketed
    create + append), then checks snapshot listing and snapshot-id
    time travel."""
    import pytest

    from turboxsl_spark.sources.snapshots import IcebergSnapshotStore

    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
    except Exception:
        pytest.skip("iceberg-spark-runtime jars not on the classpath")

    spark.conf.set("spark.sql.catalog.it_lake", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.it_lake.type", "hadoop")
    spark.conf.set("spark.sql.catalog.it_lake.warehouse", str(tmp_path / "wh"))
    spark.sql("CREATE NAMESPACE IF NOT EXISTS it_lake.db")
    store = IcebergSnapshotStore(
        spark, "db.transcripts", bucket_col="conv_id", buckets=4, catalog="it_lake"
    )
    schema = "conv_id string, turn_idx int, text string"
    s1 = store.commit(spark.createDataFrame([("c1", 1, "hi")], schema))
    s2 = store.commit(spark.createDataFrame([("c2", 1, "yo")], schema))
    assert s1 != s2
    assert store.read(spark).count() == 2
    assert store.read(spark, snapshot_id=s1).count() == 1
    snaps = store.snapshots()
    assert len(snaps) == 2
    assert snaps[0]["parent"] is None and snaps[1]["parent"] == snaps[0]["id"]
