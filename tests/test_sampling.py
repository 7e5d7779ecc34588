"""Deterministic hash sampling/splitting vs a python hashlib reference."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from turboxsl_spark.operators.sampling import (
    hash_sample,
    hash_split,
    mix_resample,
    stratified_hash_sample,
)


def _ref_u32(salt: str, *keys: str) -> int:
    # \x1f-joined, matching sampling.SEP (and chr(31) in the SQL oracle)
    return int(hashlib.md5("\x1f".join((salt, *keys)).encode()).hexdigest()[:8], 16)


def test_hash_sample_matches_hashlib_and_is_repartition_stable(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    kept = set(
        r[0] for r in hash_sample(df, "k", 0.3, salt="s1").select("k").collect()
    )
    want = {i for i in range(2000) if _ref_u32("s1", str(i)) < int(0.3 * 2**32)}
    assert kept == want
    # rate lands near 0.3 (binomial over 2000 keys)
    assert 0.25 < len(kept) / 2000 < 0.35
    # decision is partitioning-independent
    kept2 = set(
        r[0]
        for r in hash_sample(df.repartition(17), "k", 0.3, salt="s1")
        .select("k")
        .collect()
    )
    assert kept2 == kept


def test_hash_sample_is_join_closed_over_keys(spark):
    """Sampling a keyed fact table keeps every row of a sampled key and
    no row of an unsampled key (co-sampling consistency)."""
    rows = [(u, i) for u in range(100) for i in range(5)]
    df = spark.createDataFrame(rows, "user_id long, seq long")
    out = hash_sample(df, "user_id", 0.4, salt="x").groupBy("user_id").count()
    pdf = out.toPandas()
    assert (pdf["count"] == 5).all()


def test_hash_split_exhaustive_disjoint_and_seeded(spark):
    df = spark.range(0, 3000).withColumnRenamed("id", "k")
    out = hash_split(
        df, "k", {"train": 0.7, "val": 0.2, "test": 0.1}, salt="sp"
    ).toPandas()
    assert len(out) == 3000  # every row labeled exactly once
    frac = out["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.7) < 0.05
    assert abs(frac["val"] - 0.2) < 0.03
    assert abs(frac["test"] - 0.1) < 0.03
    # python reference agreement on the boundaries
    for _, r in out.head(200).iterrows():
        h = _ref_u32("sp", str(r["k"]))
        want = (
            "train"
            if h < int(0.7 * 2**32)
            else ("val" if h < int((0.7 + 0.2) * 2**32) else "test")
        )
        assert r["split"] == want
    # a different salt draws a different (but valid) split
    out2 = hash_split(
        df, "k", {"train": 0.7, "val": 0.2, "test": 0.1}, salt="other"
    ).toPandas()
    assert (out2["split"] != out["split"]).any()


def test_hash_sample_multikey_is_injective_over_tuples(spark):
    """('ab','c') and ('a','bc') must draw independently — the \\x1f
    separator keeps the concatenation injective."""
    df = spark.createDataFrame([("ab", "c"), ("a", "bc")], "x string, y string")
    from turboxsl_spark.operators.sampling import _hash_u32

    rows = df.select(_hash_u32(["x", "y"], "s").alias("h")).collect()
    assert rows[0]["h"] != rows[1]["h"]
    assert rows[0]["h"] == _ref_u32("s", "ab", "c")
    assert rows[1]["h"] == _ref_u32("s", "a", "bc")


def test_stratified_sample_rates_and_nesting(spark):
    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(4000)]
    df = spark.createDataFrame(rows, "k long, s string")
    lo = stratified_hash_sample(df, "k", "s", {"a": 0.2, "b": 0.6}, salt="st")
    pdf = lo.groupBy("s").count().toPandas().set_index("s")["count"]
    assert abs(pdf["a"] / 2000 - 0.2) < 0.05
    assert abs(pdf["b"] / 2000 - 0.6) < 0.05
    # unlisted strata use default_rate (0 = dropped)
    df2 = df.withColumn("s", F.when(F.col("k") < 100, "c").otherwise(F.col("s")))
    got = stratified_hash_sample(df2, "k", "s", {"a": 0.5}, salt="st")
    assert got.where("s = 'c'").count() == 0 and got.where("s = 'b'").count() == 0
    # nested: raising a rate only ADDS keys, never re-draws
    hi = stratified_hash_sample(df, "k", "s", {"a": 0.5, "b": 0.9}, salt="st")
    lo_keys = {r[0] for r in lo.select("k").collect()}
    hi_keys = {r[0] for r in hi.select("k").collect()}
    assert lo_keys <= hi_keys
    # per-stratum membership agrees with the python reference
    for r in lo.limit(50).collect():
        rate = 0.2 if r["s"] == "a" else 0.6
        assert _ref_u32("st", str(r["k"])) < int(rate * 2**32)


def test_mix_resample_water_filling(spark):
    # 3 domains with counts 3000/900/100; targets 0.5/0.3/0.2.
    # binding domain: min(n/w) = min(6000, 3000, 500) = 500 = T
    # → rates: a 500*0.5/3000, b 500*0.3/900, c 500*0.2/100 = 1.0
    rows = (
        [(i, "a") for i in range(3000)]
        + [(10000 + i, "b") for i in range(900)]
        + [(20000 + i, "c") for i in range(100)]
    )
    df = spark.createDataFrame(rows, "k long, d string")
    out = mix_resample(df, "k", "d", {"a": 0.5, "b": 0.3, "c": 0.2}, salt="m")
    pdf = out.groupBy("d").count().toPandas().set_index("d")["count"]
    assert pdf["c"] == 100  # binding domain keeps everything
    # expected kept: a=250, b=150 (binomial; 4 sigma ≈ 60 / 45)
    assert abs(pdf["a"] - 250) < 62
    assert abs(pdf["b"] - 150) < 48
    # domains not in targets are dropped
    out2 = mix_resample(df, "k", "d", {"a": 0.6, "b": 0.4}, salt="m")
    assert out2.where("d = 'c'").count() == 0
    # membership is the pure hash function at the derived rate
    t = min(3000 / 0.5, 900 / 0.3, 100 / 0.2)
    for r in out.limit(80).collect():
        n = {"a": 3000, "b": 900, "c": 100}[r["d"]]
        w = {"a": 0.5, "b": 0.3, "c": 0.2}[r["d"]]
        rate = min(1.0, t * w / n)
        assert _ref_u32("m", str(r["k"])) < int(rate * 2**32)


def test_sampling_validation(spark):
    df = spark.range(3).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        hash_sample(df, "k", 1.5)
    with pytest.raises(ValueError):
        hash_split(df, "k", {"a": 0.5, "b": 0.4})


def test_sampling_is_map_only(spark):
    df = spark.range(0, 100).withColumnRenamed("id", "k")
    out = hash_sample(df, "k", 0.5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_hash_sample_null_keys_distinct_and_deterministic(spark):
    """NULL key components must not collide positionally (concat_ws
    would skip them) and must hash deterministically — a NULL-keyed row
    is kept/dropped reproducibly, matching the hashlib re-derivation
    with the NUL-prefixed sentinel."""
    from turboxsl_spark.operators.sampling import NULL_SENTINEL, _hash_u32

    rows = [("a", None, "b"), ("a", "b", None), (None, None, None)]
    df = spark.createDataFrame(rows, "k1 string, k2 string, k3 string")
    got = [
        r[0]
        for r in df.select(_hash_u32(["k1", "k2", "k3"], "s").alias("h")).collect()
    ]
    # positional distinctness: ('a',NULL,'b') != ('a','b',NULL)
    assert got[0] != got[1]

    def py_hash(*keys):
        parts = "\x1f".join(["s"] + [NULL_SENTINEL if k is None else k for k in keys])
        return int(hashlib.md5(parts.encode()).hexdigest()[:8], 16)

    want = [py_hash(*r) for r in rows]
    assert got == want
