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
row-for-row. ALL Arrow chunks of a key's micro-batch are concatenated
and sorted ONCE before state application (a key's rows can straddle
chunk boundaries at arrow.maxRecordsPerBatch, so per-chunk sorting
would mis-order out-of-order rows that land in different chunks).
Cross-batch event-time regressions (a row older than the carried state
watermark) are NOT silently mis-sessionized: they are emitted with
``late = true`` and NULL computed fields, and counted in the carried
state (``late_count``), so the main (``late = false``) stream stays
correct and the violation is observable. Use the session_window path
when late data must be merged rather than flagged.

State size: 4 scalars per live conversation — O(live keys), bounded by
the state-store TTL you configure in production.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from turboxsl_spark.sources.transcripts import TRANSCRIPT_SCHEMA

OUT_SCHEMA = (
    "conv_id string, turn_idx int, ts timestamp, session_id int, position int, "
    "late boolean"
)
STATE_SCHEMA = "last_us long, session_id int, position int, late_count int"


def _make_turns_fn(timeout_s: float):
    timeout_us = int(timeout_s * 1_000_000)

    def fn(key, pdfs, state: GroupState):
        (conv_id,) = key
        if state.exists:
            last_us, sess, pos, n_late = state.get
        else:
            last_us, sess, pos, n_late = None, 0, 0, 0
        # A key's micro-batch arrives as MULTIPLE Arrow chunks
        # (arrow.maxRecordsPerBatch); concatenate and sort ONCE so
        # out-of-order rows straddling a chunk boundary are ordered
        # before state application.
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        pdf = pdf.sort_values(["ts", "turn_idx"], kind="mergesort")
        us = pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        # cross-batch regression: older than the carried watermark →
        # side output (late=true, NULL fields), never mis-sessionized
        late = (
            us < last_us if last_us is not None else np.zeros(len(us), dtype=bool)
        )
        outs = []
        if late.any():
            n_late += int(late.sum())
            lp = pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"].to_numpy()[late],
                    "turn_idx": pdf["turn_idx"].to_numpy()[late],
                    "ts": pdf["ts"].to_numpy()[late],
                    "session_id": pd.array([None] * int(late.sum()), dtype="Int32"),
                    "position": pd.array([None] * int(late.sum()), dtype="Int32"),
                    "late": True,
                }
            )
            outs.append(lp)
            pdf = pdf.loc[~late]
            us = us[~late]
        if len(us):
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
                        "late": False,
                    }
                )
            )
        if last_us is not None:
            state.update((last_us, sess, pos, n_late))
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


ASOF_IN_SCHEMA = (
    "conv_id string, ts timestamp, side int, seq long, "
    "fact_value double, spine_id long"
)
ASOF_OUT_SCHEMA = (
    "conv_id string, spine_id long, ts timestamp, "
    "fact_value_asof double, ts_fact_asof timestamp, late boolean"
)
# carried per key: the latest fact seen so far (micros, side, seq,
# value) plus the running count of cross-batch late arrivals. The
# SIDE is carried so cross-batch equal-ts rows replay the batch
# operator's full (ts, side, seq) total order: a later-batch row at
# exactly the watermark ts is "before" the stored fact iff its
# (side, seq) tuple is.
ASOF_STATE_SCHEMA = (
    "fact_us long, fact_side int, fact_seq long, fact_value double, late_count int"
)


def _make_asof_fn():
    def fn(key, pdfs, state: GroupState):
        if state.exists:
            st_us, st_side, st_seq, st_val, n_late = state.get
        else:
            st_us, st_side, st_seq, st_val, n_late = None, None, None, None, 0
        # concatenate ALL Arrow chunks of the key's micro-batch before
        # the sort — a key's rows straddle chunk boundaries at
        # arrow.maxRecordsPerBatch, and per-chunk sorting would apply
        # state in the wrong event-time order
        chunks = [p for p in pdfs if len(p)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        # same total order as the batch operator's single sort:
        # (ts, side, seq) — the caller encodes strictness in `side`
        pdf = pdf.sort_values(["ts", "side", "seq"], kind="mergesort")
        us = pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        is_fact = pdf["spine_id"].isna().to_numpy()
        outs = []
        # cross-batch regression vs the carried fact watermark: a late
        # SPINE row cannot be answered from latest-only state (older
        # facts are gone) → emit late=true + NULL fill; a late FACT row
        # cannot retract already-emitted spines → count it, keep it out
        # of the state update below (it never becomes "latest" anyway,
        # but it must not poison the in-batch cumsum either).
        # EQUAL-ts rows mirror the batch (ts, side, seq) tie-break
        # against the carried fact:
        #   * a FACT that would sort at-or-before the stored fact
        #     ((side, seq) <= (st_side, st_seq)) would regress if
        #     applied → counted late, never applied;
        #   * a SPINE that sorts BEFORE the stored fact (side <
        #     st_side — e.g. strict mode, where spines sort before
        #     equal-ts facts) must NOT be served the carried fact (the
        #     batch answer is the PREVIOUS fact, which latest-only
        #     state no longer has) → late=true + NULL fill, exactly
        #     like a late spine.
        if st_us is not None:
            seq_arr = pdf["seq"].to_numpy()
            side_arr = pdf["side"].to_numpy()
            c_side = st_side if st_side is not None else -1
            c_seq = st_seq if st_seq is not None else -1
            eq = us == st_us
            fact_regress = eq & is_fact & (
                (side_arr < c_side)
                | ((side_arr == c_side) & (seq_arr <= c_seq))
            )
            spine_regress = eq & ~is_fact & (side_arr < c_side)
            late = (us < st_us) | fact_regress | spine_regress
        else:
            late = np.zeros(len(us), dtype=bool)
        if late.any():
            n_late += int(late.sum())
            l_spine = late & ~is_fact
            if l_spine.any():
                outs.append(
                    pd.DataFrame(
                        {
                            "conv_id": pdf["conv_id"].to_numpy()[l_spine],
                            "spine_id": pdf["spine_id"].to_numpy()[l_spine],
                            "ts": pdf["ts"].to_numpy()[l_spine],
                            "fact_value_asof": np.nan,
                            "ts_fact_asof": pd.NaT,
                            "late": True,
                        }
                    )
                )
            pdf = pdf.loc[~late]
            us = us[~late]
            is_fact = is_fact[~late]
        spine = ~is_fact
        if len(us):
            # fact arrays with the carried state at index 0 (index k
            # below addresses: 0 → carry, i → i-th in-batch fact)
            f_us = np.concatenate([[st_us if st_us is not None else -1], us[is_fact]])
            f_val = np.concatenate(
                [
                    [st_val if st_val is not None else np.nan],
                    pdf["fact_value"].to_numpy(dtype="float64")[is_fact],
                ]
            )
            k = np.cumsum(is_fact)[spine]  # latest fact index per spine row
            has_carry = st_us is not None
            valid = (k > 0) | has_carry
            vals = f_val[k]
            fts = f_us[k]
            out = pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"].to_numpy()[spine],
                    "spine_id": pdf["spine_id"].to_numpy()[spine],
                    "ts": pdf["ts"].to_numpy()[spine],
                    "fact_value_asof": np.where(valid, vals, np.nan),
                    "ts_fact_asof": pd.to_datetime(
                        np.where(valid, fts, -1), unit="us"
                    ),
                    "late": False,
                }
            )
            out.loc[~valid, "fact_value_asof"] = None
            out.loc[~valid, "ts_fact_asof"] = pd.NaT
            outs.append(out)
            if is_fact.any():
                last_i = np.where(is_fact)[0][-1]
                st_us = int(us[last_i])
                st_side = int(pdf["side"].to_numpy()[last_i])
                st_seq = int(pdf["seq"].to_numpy()[last_i])
                v = pdf["fact_value"].to_numpy(dtype="float64")[last_i]
                st_val = None if v != v else float(v)
        if st_us is not None:
            state.update((
                st_us,
                st_side if st_side is not None else 0,
                st_seq if st_seq is not None else 0,
                st_val,
                n_late,
            ))
        yield from outs

    return fn


def streaming_asof(unioned: DataFrame) -> DataFrame:
    """Streaming as-of join: the batch operator's union+sort form with
    the forward-fill state (latest fact per key) carried in the state
    store across micro-batches.

    Input contract = the batch ``_union_sides`` shape flattened to
    ``ASOF_IN_SCHEMA``: fact rows carry ``fact_value`` (``spine_id``
    NULL), spine rows carry ``spine_id``; ``side`` encodes tie order
    (strict: facts AFTER spine at equal ts, i.e. fact side 1/spine 0).
    Event-time-ordered arrival per key across micro-batches, as with
    ``streaming_turn_features``; equal-ts ties within one batch are
    resolved by the same (ts, side, seq) sort as the batch plan.
    Emits one row per spine row with the latest-preceding fact value
    and timestamp. Batch-parity is pinned in tests/test_streaming.py.
    Cross-batch regressions surface with ``late = true`` (NULL fill for
    spine rows; late facts are counted in state, never applied). Rows
    arriving at EXACTLY the carried watermark ts follow the batch
    (ts, side, seq) total order against the stored fact (whose side is
    carried in state): a fact at-or-before the stored tuple is counted
    late; a spine that sorts BEFORE the stored fact (strict mode) gets
    late=true + NULL fill — its batch answer is the PREVIOUS fact,
    which latest-only state no longer has.
    Caveat (floats-only surface): a fact whose value is NULL surfaces
    as NaN here (Arrow float64 batch), where the batch operator yields
    NULL — use the batch path when that distinction matters.
    """
    return unioned.groupBy("conv_id").applyInPandasWithState(
        _make_asof_fn(),
        outputStructType=ASOF_OUT_SCHEMA,
        stateStructType=ASOF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_streaming_asof_from_dir(
    spark: SparkSession,
    src_dir: str,
    query_name: str = "asof_out",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Drive a parquet-dir union stream (ASOF_IN_SCHEMA) through the
    streaming as-of into a memory sink (sandbox smoke path)."""
    stream = (
        spark.readStream.schema(ASOF_IN_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    out = streaming_asof(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


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
