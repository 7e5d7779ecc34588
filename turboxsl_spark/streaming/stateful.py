"""Custom stateful streaming operator — applyInPandasWithState.

``streaming/sessions.py`` emits FINALIZED session aggregates via
``session_window``; this module is the per-TURN streaming path: every
arriving turn is assigned its session_id and running position
immediately, with the cross-batch state (last timestamp, open session
counter, turn count) carried per conversation in Spark's state store.
It is the streaming analogue of the batch
``with_session_id`` + ``with_position`` pair, and the engine's exhibit
for arbitrary custom stateful operators (SURVEY.md §2.10: the
reference is batch-only; this is the upgrade path the brief names).

Semantics contract (tested vs batch in tests/test_streaming.py): if
turns arrive in event-time order (per key), the streamed
(session_id, position) stream equals the batch window computation
row-for-row. Out-of-order arrivals within one micro-batch are sorted
before state application; cross-batch regressions are a data-contract
violation (use the session_window path when late data matters).

State size: 3 scalars per live conversation — O(live keys), bounded by
the state-store TTL you configure in production.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from turboxsl_spark.sources.transcripts import TRANSCRIPT_SCHEMA

OUT_SCHEMA = (
    "conv_id string, turn_idx int, ts timestamp, session_id int, position int"
)
STATE_SCHEMA = "last_us long, session_id int, position int"


def _make_turns_fn(timeout_s: float):
    timeout_us = int(timeout_s * 1_000_000)

    def fn(key, pdfs, state: GroupState):
        (conv_id,) = key
        if state.exists:
            last_us, sess, pos = state.get
        else:
            last_us, sess, pos = None, 0, 0
        outs = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(["ts", "turn_idx"], kind="mergesort")
            us = pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()
            # vectorized gap sessionize continuing from carried state:
            # integer-microsecond gaps (the repo-wide exactness rule)
            prev = np.concatenate(
                [[last_us if last_us is not None else us[0]], us[:-1]]
            )
            flags = (us - prev) > timeout_us
            sids = sess + np.cumsum(flags)
            poss = pos + 1 + np.arange(len(us))
            sess = int(sids[-1])
            pos = int(poss[-1])
            last_us = int(us[-1])
            outs.append(
                pd.DataFrame(
                    {
                        "conv_id": pdf["conv_id"].to_numpy(),
                        "turn_idx": pdf["turn_idx"].to_numpy(),
                        "ts": pdf["ts"].to_numpy(),
                        "session_id": sids.astype("int32"),
                        "position": poss.astype("int32"),
                    }
                )
            )
        if last_us is not None:
            state.update((last_us, sess, pos))
        yield from outs

    return fn


def streaming_turn_features(
    stream: DataFrame, timeout_s: float = 1800.0
) -> DataFrame:
    """Per-turn streaming (session_id, position) with carried state."""
    return stream.groupBy("conv_id").applyInPandasWithState(
        _make_turns_fn(timeout_s),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_from_dir(
    spark: SparkSession,
    src_dir: str,
    timeout_s: float = 1800.0,
    query_name: str = "turns_out",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Drive a parquet-dir stream through the stateful operator into a
    memory sink (sandbox smoke path; one file per micro-batch so state
    genuinely carries across batches)."""
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    out = streaming_turn_features(stream, timeout_s=timeout_s)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
