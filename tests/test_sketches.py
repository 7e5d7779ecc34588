"""KMV sketch vs a python hashlib reference + accuracy bounds."""

from __future__ import annotations

import hashlib

import pytest

from turboxsl_spark.operators.sketches import kmv_distinct


def _h(salt: str, key: str) -> int:
    return int(hashlib.md5(f"{salt}\x1f{key}".encode()).hexdigest()[:8], 16)


def _ref(keys, k, salt):
    hs = sorted({_h(salt, str(x)) for x in keys})[:k]
    n_kept = len(hs)
    if n_kept < k:
        return n_kept, (hs[-1] if hs else None), float(n_kept)
    return n_kept, hs[-1], float((k - 1) << 32) / hs[-1]


def test_kmv_matches_hashlib_reference_exactly(spark):
    rows = [(f"g{i % 3}", i) for i in range(5000)]
    df = spark.createDataFrame(rows, "g string, id long")
    got = {
        r["g"]: (r["n_kept"], r["kth_hash"], r["distinct_est"])
        for r in kmv_distinct(df, "g", "id", k=64, salt="s").collect()
    }
    for g in ("g0", "g1", "g2"):
        keys = [i for i in range(5000) if f"g{i % 3}" == g]
        assert got[g] == _ref(keys, 64, "s"), g


def test_kmv_small_group_is_exact_and_duplicates_ignored(spark):
    # 10 distinct keys, each repeated 7x, k=64 → exact count
    rows = [("a", i % 10) for i in range(70)]
    df = spark.createDataFrame(rows, "g string, id long")
    r = kmv_distinct(df, "g", "id", k=64).collect()[0]
    assert (r["n_kept"], r["distinct_est"]) == (10, 10.0)


def test_kmv_estimate_within_error_bound(spark):
    # 20k distinct keys, k=256 → relative error ~1/sqrt(254) ≈ 6.3%;
    # assert a loose 4-sigma band
    df = spark.range(0, 20000).withColumnRenamed("id", "key")
    r = kmv_distinct(df.selectExpr("'x' AS g", "key"), "g", "key", k=256).collect()[0]
    assert abs(r["distinct_est"] - 20000) / 20000 < 0.25


def test_kmv_is_repartition_stable(spark):
    df = spark.range(0, 3000).selectExpr("CAST(id % 2 AS STRING) AS g", "id")
    a = {r["g"]: r["distinct_est"] for r in kmv_distinct(df, "g", "id", k=32).collect()}
    b = {
        r["g"]: r["distinct_est"]
        for r in kmv_distinct(df.repartition(17), "g", "id", k=32).collect()
    }
    assert a == b


def test_kmv_validation(spark):
    df = spark.range(3).selectExpr("'a' AS g", "id")
    with pytest.raises(ValueError):
        kmv_distinct(df, "g", "id", k=1)
