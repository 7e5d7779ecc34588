"""KMV (k-minimum-values) distinct-count sketch.

The deterministic sketch family: hash every key with the engine's
pure md5 function (``sampling._hash_u32`` — the same hash the
sampling operators use), keep the k SMALLEST distinct hash values per
group, and estimate distinct counts as ``(k-1) * 2^32 / h_(k)`` from
the k-th order statistic (Bar-Yossef et al. 2002). Because the hash
is a pure function, the summary and the estimate are REPRODUCIBLE in
any engine — the DuckDB oracle computes the identical numbers — and
two sketches merge by taking the k smallest of the union (used for
partition-parallel construction below; the same property serves
cross-day rollups).

Contrast with ``approx_count_distinct`` (HLL++): Spark's built-in is
the right default for one-shot counting; this sketch is the
ENGINE-PORTABLE, mergeable complement whose summary you can store
next to the data and re-verify anywhere.

Scale shape: one distinct on (group, hash) — volume bounded by the
number of distinct identities — then a per-(group, partition) prune
to k rows BEFORE the per-group order statistic, so no single task
ever sorts more than k·P rows of one group (never the group's full
distinct set). Groups with fewer than k distinct hashes report the
EXACT count (the sketch is lossless below k).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from turboxsl_spark.operators.sampling import _hash_u32

_U32 = float(1 << 32)


def kmv_distinct(
    df: DataFrame,
    group_cols: str | Sequence[str],
    key_cols: str | Sequence[str],
    k: int = 256,
    salt: str = "",
) -> DataFrame:
    """Per-group distinct-count estimate from a k-minimum-values sketch.

    Returns one row per group: ``(…group_cols, n_kept long,
    kth_hash long, distinct_est double)``. ``n_kept`` < k means the
    group's distinct count is exact (= n_kept); otherwise
    ``distinct_est = (k-1)·2^32 / kth_hash`` with relative error
    ~ 1/sqrt(k-2).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    numer = float((k - 1) << 32)  # exact in double for any sane k

    dh = df.select(*groups, _hash_u32(keys, salt).alias("_h")).distinct()
    # phase 1: prune to k per (group, physical partition) — min-k is
    # mergeable, so batch-local pruning loses nothing and caps the
    # per-group row count entering the global order statistic at k·P
    pruned = (
        dh.withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_rn", F.row_number().over(Window.partitionBy(*groups, "_pid").orderBy("_h"))
        )
        .where(F.col("_rn") <= k)
        .drop("_pid", "_rn")
    )
    # phase 2: global k smallest per group over the bounded partials
    kept = pruned.withColumn(
        "_rn", F.row_number().over(Window.partitionBy(*groups).orderBy("_h"))
    ).where(F.col("_rn") <= k)
    est: Column = F.when(
        F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
    ).otherwise(F.lit(numer) / F.max("_h"))
    return kept.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.max("_h").cast("long").alias("kth_hash"),
        est.alias("distinct_est"),
    )
