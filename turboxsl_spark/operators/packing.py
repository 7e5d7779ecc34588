"""Sequence packing — assemble documents into fixed-size context
windows, the last mile of a training-data pipeline.

Two variants with different determinism/efficiency trades:

``pack_fixed_boundary``
    A document joins the sequence its token START OFFSET falls in:
    within a shard, ``seq = floor(cum_tokens_before / window)``. Pure
    window arithmetic — one shuffle (the per-shard sort), engine-
    independent (the DuckDB oracle reproduces every assignment), and
    order-stable under repartitioning. A document may straddle a
    boundary (consumers split/truncate at read time); waste is zero,
    overflow per sequence is bounded by the max document length.

``pack_greedy``
    Exact first-fit-contiguous: a sequence closes when the next
    document does not fit; an oversized document gets a sequence of
    its own (flagged). Inherently sequential per shard — runs as an
    Arrow-batched applyInPandas over shards, parallel ACROSS shards.

Scale note: shards are the unit of parallelism AND of sequential
state. Shard by a hash of the document key (``F.pmod(F.xxhash64(...),
n)``) sized so one shard's (doc_id, n_tok) pairs fit one worker —
~10⁷ docs/shard is a few hundred MB; 100 TB of documents at 4 KB/doc
is ~2.5×10¹⁰ docs → a few thousand shards, each independent.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def pack_fixed_boundary(
    df: DataFrame,
    order_cols: Sequence[str],
    token_col: str | Column,
    window: int,
    shard_col: str | Column | None = None,
    out: str = "seq_id",
) -> DataFrame:
    """Assign each doc the sequence containing its start offset.

    ``order_cols`` must be a deterministic total order within a shard
    (include the unique doc key). Adds ``_shard`` (the evaluated shard
    expression), ``_start`` (token offset within the shard stream) and
    ``out`` (= floor(_start / window))."""
    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    shard = (
        F.lit(0)
        if shard_col is None
        else (F.col(shard_col) if isinstance(shard_col, str) else shard_col)
    )
    d = df.withColumn("_shard", shard).withColumn("_tok", tok.cast("long"))
    w = Window.partitionBy("_shard").orderBy(*order_cols)
    start = F.sum("_tok").over(w) - F.col("_tok")
    return (
        d.withColumn("_start", start.cast("long"))
        .withColumn(out, F.floor(F.col("_start") / F.lit(float(window))).cast("long"))
        .drop("_tok")
    )


def pack_greedy(
    df: DataFrame,
    key_col: str,
    token_col: str,
    window: int,
    shard_col: str,
    out: str = "seq_id",
) -> DataFrame:
    """Exact first-fit-contiguous packing, sequential per shard.

    Returns ``(shard, key, n_tok, seq_id, seq_fill)`` where ``seq_id``
    is 0-based per shard and ``seq_fill`` the sequence's running token
    count after this doc. Docs with ``n_tok > window`` are emitted as
    singleton sequences (``seq_fill > window`` flags them)."""
    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    slim = df.select(
        F.col(shard_col).alias("shard"),
        F.col(key_col).alias("key"),
        F.col(token_col).cast("long").alias("n_tok"),
    )
    schema = StructType(
        [
            StructField("shard", slim.schema["shard"].dataType),
            StructField("key", slim.schema["key"].dataType),
            StructField("n_tok", LongType()),
            StructField(out, LongType()),
            StructField("seq_fill", LongType()),
        ]
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("key", kind="mergesort").reset_index(drop=True)
        seq_ids, fills = [], []
        seq, fill = 0, 0
        for t in pdf["n_tok"]:
            t = int(t)
            if fill > 0 and fill + t > window:
                seq += 1
                fill = 0
            fill += t
            seq_ids.append(seq)
            fills.append(fill)
        pdf[out] = pd.Series(seq_ids, dtype="int64")
        pdf["seq_fill"] = pd.Series(fills, dtype="int64")
        return pdf

    return slim.groupBy("shard").applyInPandas(_pack, schema)
