"""Salt-invariance: the two-phase salted window merge must produce
exactly the plain-window result for any chunk size (the analogue of the
reference's pool-size-independent goldens)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from tests.conftest import assert_frames_match
from turboxsl_spark.operators.sessionize import with_session_id
from turboxsl_spark.operators.skew import (
    salted_cumsum,
    salted_forward_fill,
    salted_session_id,
)
from turboxsl_spark.operators.windows import conv_window
from turboxsl_spark.sources.transcripts import TRANSCRIPT_SCHEMA, gen_transcripts_pdf

KEYS = ["conv_id", "turn_idx"]


@pytest.fixture(scope="module")
def df(spark):
    # mega_frac high so several conversations are >> chunk size
    pdf = gen_transcripts_pdf(n_convs=25, seed=3, mega_frac=0.1)
    assert pdf.groupby("conv_id").size().max() >= 1000
    return spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA).cache()


@pytest.mark.parametrize("chunk", [64, 1000])
def test_salted_cumsum_matches_plain(spark, df, chunk):
    plain = df.withColumn(
        "run_len",
        F.sum(F.length("text")).over(
            conv_window().rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).select(*KEYS, "run_len")
    salted = salted_cumsum(
        df.withColumn("_len", F.length("text")), "_len", "run_len", chunk=chunk
    ).select(*KEYS, "run_len")
    assert_frames_match(salted.toPandas(), plain.toPandas(), KEYS)


@pytest.mark.parametrize("chunk", [64, 1000])
def test_salted_ffill_matches_plain(spark, df, chunk):
    plain = df.withColumn(
        "tool_ffill",
        F.last("tool", ignorenulls=True).over(
            conv_window().rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).select(*KEYS, "tool_ffill")
    salted = salted_forward_fill(df, "tool", chunk=chunk).select(*KEYS, "tool_ffill")
    assert_frames_match(salted.toPandas(), plain.toPandas(), KEYS)


@pytest.mark.parametrize("chunk", [64, 1000])
def test_salted_session_matches_plain(spark, df, chunk):
    plain = with_session_id(df, timeout_s=1800).select(*KEYS, "session_id")
    salted = salted_session_id(df, timeout_s=1800, chunk=chunk).select(
        *KEYS, "session_id"
    )
    assert_frames_match(salted.toPandas(), plain.toPandas(), KEYS)
