"""Memoized external-lookup maps — ``ltr:url_code`` / ``ltr:veristat``.

The reference's hottest production functions
(``/root/reference/src/functions.c:919-1059``; call profile
``:1345-1392`` — 2132 url_code + 642 veristat calls per transform)
consult an external service through a global-mutex memo hashtable: one
slow RPC per distinct key, then cache hits. That design is poison on a
cluster (per-row external calls from executors, a mutex that doesn't
exist across machines). The distributed re-expression:

  1. PRECOMPUTE the key→value table — a batch job, a dimension
     snapshot, or a plan-time dict for small static maps;
  2. broadcast-join it against the fact table — one JVM-side hash
     probe per row, no Python, no network calls in the hot path.

tests/test_plans.py pins the plan: BroadcastHashJoin, zero
Python eval nodes.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def memo_table(spark, mapping: Mapping, key_type: str = "string", val_type: str = "string") -> DataFrame:
    """Materialize a python dict as the (key, value) memo dimension."""
    return spark.createDataFrame(
        list(mapping.items()), f"_memo_key {key_type}, _memo_val {val_type}"
    )


def memo_lookup(
    df: DataFrame,
    mapping: Mapping | DataFrame,
    on: str | Column,
    out: str,
    default=None,
    key_type: str = "string",
    val_type: str = "string",
) -> DataFrame:
    """Attach ``out`` = memo[value of ``on``] to every row.

    ``mapping``: a dict (materialized plan-side) or a prepared
    DataFrame with ``_memo_key``/``_memo_val`` columns (e.g. the output
    of a previous distinct-keys batch job). Misses yield ``default``
    (the reference returns "" for unknown url codes). The memo side is
    broadcast — it is a dimension by construction (distinct keys).
    """
    if isinstance(mapping, Mapping):
        mdf = memo_table(df.sparkSession, mapping, key_type, val_type)
    else:
        mdf = mapping
    key = F.col(on) if isinstance(on, str) else on
    joined = df.join(F.broadcast(mdf), key == F.col("_memo_key"), "left")
    val = F.col("_memo_val")
    if default is not None:
        val = F.coalesce(val, F.lit(default))
    return joined.withColumn(out, val).drop("_memo_key", "_memo_val")
