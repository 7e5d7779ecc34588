"""Whole-conversation custom aggregates via grouped-map pandas.

The reference has no UDAF mechanism (SURVEY.md §2.11) — multi-node
logic lives in templates walking the whole document. Our equivalent:
``groupBy(conv_id).applyInPandas`` hands each conversation to a
vectorized pandas kernel. This is the sanctioned escape hatch for
conversation-level features no window composition expresses (here:
user→assistant response-latency stats, which need *pairing* logic).

Scale notes: one shuffle on conv_id; each group must fit in a worker's
memory — mega-conversations are fine at 10^4 turns (a few MB); beyond
that the salted operators in operators/skew.py are the tool, not
grouped-map.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

RESPONSE_STATS_SCHEMA = (
    "conv_id string, n_turns long, n_responses long, "
    "mean_response_s double, p50_response_s double, max_response_s double"
)


def _response_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["ts", "turn_idx"], kind="mergesort")
    # difference integer microseconds FIRST, divide ONCE — the repo-wide
    # gap/latency discipline (module docstring of __spark_entry__): the
    # int64 subtraction is exact, so Spark and the SQL oracle round
    # identically. (Dividing each timestamp to float seconds before
    # differencing loses ULPs on large epochs and failed hash_match.)
    us = pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    role = pdf["role"].to_numpy()
    # latency of each assistant turn that directly follows a user turn
    lat = (us[1:] - us[:-1]) / 1e6
    mask = (role[1:] == "assistant") & (role[:-1] == "user")
    resp = lat[mask]
    return pd.DataFrame(
        {
            "conv_id": [pdf["conv_id"].iloc[0]],
            "n_turns": [len(pdf)],
            "n_responses": [len(resp)],
            "mean_response_s": [float(np.mean(resp)) if len(resp) else None],
            "p50_response_s": [float(np.median(resp)) if len(resp) else None],
            "max_response_s": [float(np.max(resp)) if len(resp) else None],
        }
    )


def response_latency_stats(df: DataFrame) -> DataFrame:
    """Per-conversation user→assistant response-latency statistics.

    Two measured plan properties (r06, guide §4.1/§2.2):

    * Only the four columns the kernel reads cross the JVM↔Python
      boundary — Spark cannot see which columns an opaque grouped-map
      function touches, so an un-projected ``applyInPandas`` ships
      (and shuffles) every column, including the text payload.
    * The group-key exchange is an EXPLICIT ``repartition(P, conv_id)``
      (P = the session's shuffle-partition setting — config-derived,
      not hard-coded), which ``groupBy(conv_id)`` reuses. Left to AQE,
      the now-narrow shuffle coalesces to a handful of partitions and
      the *Python worker stage* loses its parallelism — the projection
      alone measured SLOWER than shipping everything (2.7s vs 2.0s at
      sf0.1/32 cores) because wall-clock here is bounded by concurrent
      pandas workers, not shuffled bytes. Projection + pinned
      partition count measured 0.96s vs 2.35s for the r05 shape.
    """
    p = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return (
        df.select("conv_id", "turn_idx", "role", "ts")
        .repartition(p, "conv_id")
        .groupBy("conv_id")
        .applyInPandas(_response_stats, schema=RESPONSE_STATS_SCHEMA)
    )
