"""Structured-Streaming sessionize: session_window + watermark over a
file stream, finalized sessions must match the batch sessionizer."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from turboxsl_spark.operators.sessionize import with_session_id
from turboxsl_spark.sources.transcripts import TRANSCRIPT_SCHEMA, gen_transcripts_pdf
from turboxsl_spark.streaming.sessions import run_stream_from_dir


def test_stateful_turn_features_match_batch(spark, tmp_path):
    """applyInPandasWithState per-turn (session_id, position) must equal
    the batch window computation when turns arrive in event-time order —
    state (last ts, open session, count) carries across micro-batches
    (one file per trigger forces real cross-batch carries)."""
    from pyspark.sql import Window as W

    from turboxsl_spark.streaming.stateful import run_stateful_from_dir

    pdf = gen_transcripts_pdf(n_convs=10, seed=33, mega_frac=0.0)
    src = str(tmp_path / "stateful_src")
    os.makedirs(src)
    pdf = pdf.sort_values("ts", kind="mergesort").reset_index(drop=True)
    n_files = 5
    bounds = [int(len(pdf) * i / n_files) for i in range(n_files + 1)]
    for i in range(n_files):
        pdf.iloc[bounds[i] : bounds[i + 1]].to_parquet(
            f"{src}/part-{i:02d}.parquet", index=False
        )

    got = (
        run_stateful_from_dir(spark, src, query_name="t_turns")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )

    batch_df = spark.createDataFrame(pdf, TRANSCRIPT_SCHEMA)
    w = W.partitionBy("conv_id").orderBy("ts", "turn_idx")
    want = (
        with_session_id(batch_df, timeout_s=1800)
        .withColumn("position", F.row_number().over(w))
        .select("conv_id", "turn_idx", "session_id", "position")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert got["session_id"].tolist() == want["session_id"].tolist()
    assert got["position"].tolist() == want["position"].tolist()


def test_streaming_sessions_match_batch(spark, tmp_path):
    pdf = gen_transcripts_pdf(n_convs=12, seed=21, mega_frac=0.0)
    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    # several files in event-time order so the watermark advances,
    # plus a far-future flush row so every real session finalizes
    pdf = pdf.sort_values("ts", kind="mergesort").reset_index(drop=True)
    n_files = 4
    bounds = [int(len(pdf) * i / n_files) for i in range(n_files + 1)]
    for i in range(n_files):
        pdf.iloc[bounds[i] : bounds[i + 1]].to_parquet(f"{src}/part-{i:02d}.parquet", index=False)
    flush = pdf.head(1).copy()  # inherit exact dtypes
    flush["conv_id"] = "__flush__"
    flush["ts"] = (pdf["ts"].max() + pd.Timedelta(days=7))
    flush["ts"] = flush["ts"].astype(pdf["ts"].dtype)
    flush.to_parquet(f"{src}/part-zz-flush.parquet", index=False)

    got = run_stream_from_dir(spark, src, gap="30 minutes", query_name="t_sessions")
    got_pdf = (
        got.where("conv_id <> '__flush__'")
        .toPandas()
        .sort_values(["conv_id", "session_start"], kind="mergesort")
        .reset_index(drop=True)
    )

    batch_df = spark.createDataFrame(pdf, TRANSCRIPT_SCHEMA)
    want = (
        with_session_id(batch_df, timeout_s=1800)
        .groupBy("conv_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_turns"), F.sum(F.length("text")).alias("total_chars"))
        .toPandas()
        .sort_values(["conv_id", "session_id"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert len(got_pdf) == len(want), f"{len(got_pdf)} sessions != batch {len(want)}"
    assert got_pdf["n_turns"].tolist() == want["n_turns"].tolist()
    assert got_pdf["total_chars"].tolist() == want["total_chars"].tolist()
