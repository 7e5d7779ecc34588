"""Grouped-map UDAF vs a plain-pandas oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd

from turboxsl_spark.operators.conv_udaf import _response_stats, response_latency_stats
from turboxsl_spark.sources.transcripts import TRANSCRIPT_SCHEMA, gen_transcripts_pdf


def test_response_latency_matches_pandas(spark):
    pdf = gen_transcripts_pdf(n_convs=40, seed=13, mega_frac=0.0)
    got = (
        response_latency_stats(spark.createDataFrame(pdf, TRANSCRIPT_SCHEMA))
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    want = (
        pd.concat([_response_stats(g) for _, g in pdf.groupby("conv_id")])
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert got["n_turns"].tolist() == want["n_turns"].tolist()
    assert got["n_responses"].tolist() == want["n_responses"].tolist()
    a = got["mean_response_s"].to_numpy(dtype=float)
    b = want["mean_response_s"].to_numpy(dtype=float)
    assert np.allclose(a, b, equal_nan=True)
