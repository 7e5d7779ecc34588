"""Streaming KMV distinct-count — the deterministic sketch family under
Structured Streaming.

The batch ``operators/sketches.kmv_distinct`` summary is MERGEABLE
(min-k of a union = min-k of the min-k's), which is exactly the
property a streaming aggregate needs: the state store carries each
group's current min-k hash set, every micro-batch folds its new keys
in, and the emitted row after any prefix of the stream EQUALS the
batch sketch of that prefix (test-pinned). The reference is batch-only
(SURVEY.md §2.10); this is the incremental upgrade path for the
sketch surface, complementing the sessionize / as-of stateful ops.

Hashing is the engine's portable rule — ``int(md5(salt SEP key)[:8],
16)`` with the NULL sentinel, byte-identical to the JVM-side
``sampling._hash_u32`` — so a checkpointed state snapshot can be
re-verified against ANY engine's batch recomputation.

State size: ≤ k longs per group — O(groups · k), independent of the
stream length.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from turboxsl_spark.operators.sampling import NULL_SENTINEL, SEP

KMV_OUT_SCHEMA = (
    "grp string, seq long, n_kept long, kth_hash long, distinct_est double"
)
KMV_STATE_SCHEMA = "hashes array<long>, seq long"


def _kmv_hash(val, salt: str) -> int:
    """Python twin of ``sampling._hash_u32`` (md5 first 8 hex chars);
    parity with the Spark expression is pinned in tests."""
    enc = NULL_SENTINEL if val is None else str(val)
    return int(hashlib.md5(f"{salt}{SEP}{enc}".encode()).hexdigest()[:8], 16)


def _make_kmv_fn(k: int, salt: str):
    numer = float((k - 1) << 32)  # same literal the batch agg uses

    def fn(key, pdfs, state: GroupState):
        (grp,) = key
        if state.exists:
            carried, seq = state.get
            hashes = set(carried)
        else:
            hashes, seq = set(), 0
        for p in pdfs:
            if len(p):
                for v in p["_key"]:
                    hashes.add(_kmv_hash(v, salt))
        mins = sorted(hashes)[:k]
        seq += 1
        state.update((mins, seq))
        n = len(mins)
        est = float(n) if n < k else numer / mins[-1]
        yield pd.DataFrame(
            {
                "grp": [grp],
                "seq": [seq],
                "n_kept": [n],
                "kth_hash": [mins[-1]],
                "distinct_est": [est],
            }
        )

    return fn


def streaming_kmv_distinct(
    stream: DataFrame,
    group_col: str,
    key_col: str,
    k: int = 256,
    salt: str = "",
) -> DataFrame:
    """Per-group KMV distinct-count over a stream: one updated summary
    row per (group, micro-batch) — ``seq`` orders a group's emissions,
    so the latest row IS the sketch of everything seen so far and
    matches the batch ``kmv_distinct`` of the same prefix exactly."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    # Normalize the key JVM-SIDE to the exact string the batch hash
    # sees: Arrow→pandas upcasts a nullable int column to float64, so
    # NULLs would arrive in Python as NaN (bypassing the sentinel) and
    # ints would stringify as '5.0' vs the batch '5' — silently
    # diverging from batch kmv_distinct (ADVICE r05). After this
    # coalesce+cast, Python only ever hashes the string Spark hashes.
    keyed = stream.select(
        F.col(group_col).cast("string").alias("grp"),
        F.coalesce(F.col(key_col).cast("string"), F.lit(NULL_SENTINEL)).alias(
            "_key"
        ),
    )
    return keyed.groupBy("grp").applyInPandasWithState(
        _make_kmv_fn(k, salt),
        outputStructType=KMV_OUT_SCHEMA,
        stateStructType=KMV_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_kmv_stream_from_dir(
    spark: SparkSession,
    src_dir: str,
    schema: str,
    group_col: str,
    key_col: str,
    k: int = 256,
    salt: str = "",
    query_name: str = "kmv_out",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Drive a parquet-dir stream through the streaming sketch into a
    memory sink (one file per micro-batch so state genuinely carries)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    out = streaming_kmv_distinct(stream, group_col, key_col, k=k, salt=salt)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
