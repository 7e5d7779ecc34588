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
    """Per-conversation user→assistant response-latency statistics."""
    return df.groupBy("conv_id").applyInPandas(
        _response_stats, schema=RESPONSE_STATS_SCHEMA
    )
