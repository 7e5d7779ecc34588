"""Structured-Streaming sessionization.

The reference is strictly batch (one document per transform call,
/root/reference/src/transform.c:633-718) and our engine is
batch-first over snapshots; this module is the streaming upgrade path:
the same gap-based session semantics expressed with ``session_window``
+ watermark, so late turns within the watermark still merge into their
session and the sink sees append-mode finalized sessions.

Local smoke path (no Kafka in the sandbox): parquet source dir →
memory sink, driven synchronously with ``processAllAvailable()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from turboxsl_spark.sources.transcripts import TRANSCRIPT_SCHEMA


def streaming_sessionize(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key: str = "conv_id",
) -> DataFrame:
    """Finalized per-session aggregates over a streaming transcript feed.

    ``session_window`` merges rows whose gaps are below ``gap`` into one
    window per key; the watermark bounds state (sessions finalize once
    event time passes end+watermark — the streaming analogue of the
    batch zero-leakage discipline).
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("session"), F.col(key))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.length("text")).alias("total_chars"),
            F.min("turn_idx").alias("first_turn"),
            F.max("turn_idx").alias("last_turn"),
        )
        .select(
            key,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_turns",
            "total_chars",
            "first_turn",
            "last_turn",
        )
    )


def run_stream_from_dir(
    spark: SparkSession,
    src_dir: str,
    gap: str = "30 minutes",
    query_name: str = "sessions_out",
) -> DataFrame:
    """Drive a parquet-dir stream to completion into a memory sink and
    return the materialized result (sandbox smoke path)."""
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(src_dir)
    )
    out = streaming_sessionize(stream, gap=gap)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
