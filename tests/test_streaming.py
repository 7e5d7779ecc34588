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


def test_streaming_asof_matches_batch(spark, tmp_path):
    """The streaming as-of (state = latest fact per key) must equal the
    batch asof_join (strict) row-for-row when the union stream arrives
    in event-time order; one file per trigger forces state carries."""
    import numpy as np

    from turboxsl_spark.operators.asof import asof_join
    from turboxsl_spark.streaming.stateful import run_streaming_asof_from_dir

    rng = np.random.default_rng(7)
    base = pd.Timestamp("2025-06-01")
    rows = []
    for k in range(8):
        key = f"c{k}"
        n_f, n_s = int(rng.integers(3, 25)), int(rng.integers(5, 40))
        f_ts = np.sort(rng.integers(0, 50_000, n_f))
        s_ts = np.sort(rng.integers(0, 50_000, n_s))
        # force exact ties so strictness matters
        if n_f > 2 and n_s > 2:
            f_ts[:2] = s_ts[:2]
            f_ts = np.sort(f_ts)
        for i, t in enumerate(f_ts):
            # strict: facts sort AFTER spine at equal ts → side 1
            rows.append((key, base + pd.Timedelta(seconds=int(t)), 1, i,
                         float(rng.normal()), None))
        for i, t in enumerate(s_ts):
            rows.append((key, base + pd.Timedelta(seconds=int(t)), 0, 0,
                         None, k * 1000 + i))
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "ts", "side", "seq", "fact_value", "spine_id"]
    )
    # parquet written at us precision so the stream schema's Timestamp
    # matches the physical type (ns-NTZ would mismatch)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf["side"] = pdf["side"].astype("int32")
    pdf["seq"] = pdf["seq"].astype("int64")
    pdf["spine_id"] = pdf["spine_id"].astype("Int64")
    src = str(tmp_path / "asof_src")
    os.makedirs(src)
    pdf = pdf.sort_values(["ts", "side", "seq"], kind="mergesort").reset_index(drop=True)
    n_files = 6
    bounds = [int(len(pdf) * i / n_files) for i in range(n_files + 1)]
    for i in range(n_files):
        pdf.iloc[bounds[i] : bounds[i + 1]].to_parquet(
            f"{src}/part-{i:02d}.parquet", index=False
        )

    got = (
        run_streaming_asof_from_dir(spark, src, query_name="t_asof")
        .toPandas()
        .sort_values(["conv_id", "spine_id"], kind="mergesort")
        .reset_index(drop=True)
    )

    facts = pdf[pdf["spine_id"].isna()][["conv_id", "ts", "seq", "fact_value"]]
    spine = pdf[pdf["spine_id"].notna()][["conv_id", "ts", "spine_id"]]
    want = (
        asof_join(
            spark.createDataFrame(spine),
            spark.createDataFrame(facts),
            on="conv_id",
            ts_col="ts",
            value_cols=["fact_value"],
            strict=True,
            fact_seq_col="seq",
            fact_ts_out="ts_fact_asof",
        )
        .toPandas()
        .sort_values(["conv_id", "spine_id"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    a = got["fact_value_asof"].astype("float64").to_numpy()
    b = want["fact_value_asof"].astype("float64").to_numpy()
    import numpy.testing as npt

    both_nan = pd.isna(a) & pd.isna(b)
    npt.assert_allclose(a[~both_nan], b[~both_nan], rtol=1e-12)
    assert (pd.isna(a) == pd.isna(b)).all()
    assert (
        got["ts_fact_asof"].isna().to_numpy() == want["ts_fact_asof"].isna().to_numpy()
    ).all()
    assert (got["ts_fact_asof"].dropna().to_numpy()
            == want["ts_fact_asof"].dropna().to_numpy()).all()


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


def test_stateful_chunk_boundary_out_of_order(spark, tmp_path):
    """Out-of-order rows WITHIN one micro-batch must be sorted across
    Arrow chunk boundaries: with arrow.maxRecordsPerBatch=5 a single
    key's 60 shuffled rows arrive as ~12 chunks, and a per-chunk sort
    would mis-sessionize any inversion straddling a boundary."""
    import numpy as np
    from pyspark.sql import Window as W

    from turboxsl_spark.streaming.stateful import run_stateful_from_dir

    rng = np.random.default_rng(5)
    base = pd.Timestamp("2025-06-01")
    n = 60
    ts = base + pd.to_timedelta(np.cumsum(rng.integers(1, 4000, n)), unit="s")
    pdf = pd.DataFrame(
        {
            "conv_id": "c0",
            "turn_idx": np.arange(n, dtype="int32"),
            "role": "user",
            "text": "x",
            "tool": pd.array([None] * n, dtype="string"),
            "ts": ts.astype("datetime64[us]"),
        }
    )
    shuffled = pdf.sample(frac=1.0, random_state=7).reset_index(drop=True)
    src = str(tmp_path / "chunk_src")
    os.makedirs(src)
    shuffled.to_parquet(f"{src}/part-00.parquet", index=False)  # ONE micro-batch

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "5")
    try:
        got = (
            run_stateful_from_dir(spark, src, query_name="t_chunks")
            .toPandas()
            .sort_values("turn_idx", kind="mergesort")
            .reset_index(drop=True)
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    assert not got["late"].any()
    batch_df = spark.createDataFrame(pdf, TRANSCRIPT_SCHEMA)
    w = W.partitionBy("conv_id").orderBy("ts", "turn_idx")
    want = (
        with_session_id(batch_df, timeout_s=1800)
        .withColumn("position", F.row_number().over(w))
        .select("turn_idx", "session_id", "position")
        .toPandas()
        .sort_values("turn_idx", kind="mergesort")
        .reset_index(drop=True)
    )
    assert got["session_id"].tolist() == want["session_id"].tolist()
    assert got["position"].tolist() == want["position"].tolist()


def test_stateful_late_rows_flagged_not_applied(spark, tmp_path):
    """A cross-batch event-time regression must surface as late=true
    with NULL session/position, and the main stream must equal the
    batch computation over the on-time rows only."""
    import numpy as np
    from pyspark.sql import Window as W

    from turboxsl_spark.streaming.stateful import run_stateful_from_dir

    base = pd.Timestamp("2025-06-01")
    mk = lambda rows: pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ).astype({"turn_idx": "int32", "tool": "string"})
    # batch 1: turns at t=0s, 100s; batch 2: an on-time turn at 7200s
    # plus a LATE turn at 50s (older than the carried watermark 100s)
    b1 = mk([("c0", 0, "user", "x", None, base),
             ("c0", 1, "user", "x", None, base + pd.Timedelta(seconds=100))])
    b2 = mk([("c0", 2, "user", "x", None, base + pd.Timedelta(seconds=7200)),
             ("c0", 9, "user", "late", None, base + pd.Timedelta(seconds=50))])
    for b in (b1, b2):
        b["ts"] = b["ts"].astype("datetime64[us]")
    src = str(tmp_path / "late_src")
    os.makedirs(src)
    b1.to_parquet(f"{src}/part-00.parquet", index=False)
    b2.to_parquet(f"{src}/part-01.parquet", index=False)

    got = (
        run_stateful_from_dir(spark, src, query_name="t_late")
        .toPandas()
        .sort_values("turn_idx", kind="mergesort")
        .reset_index(drop=True)
    )
    late = got[got["late"]]
    assert late["turn_idx"].tolist() == [9]
    assert late["session_id"].isna().all() and late["position"].isna().all()

    ontime = got[~got["late"]]
    pdf = pd.concat([b1, b2[b2["turn_idx"] != 9]], ignore_index=True)
    batch_df = spark.createDataFrame(pdf, TRANSCRIPT_SCHEMA)
    w = W.partitionBy("conv_id").orderBy("ts", "turn_idx")
    want = (
        with_session_id(batch_df, timeout_s=1800)
        .withColumn("position", F.row_number().over(w))
        .select("turn_idx", "session_id", "position")
        .toPandas()
        .sort_values("turn_idx", kind="mergesort")
        .reset_index(drop=True)
    )
    assert ontime["session_id"].tolist() == want["session_id"].tolist()
    assert ontime["position"].tolist() == want["position"].tolist()


def test_streaming_asof_late_spine_and_fact(spark, tmp_path):
    """Late spine rows get late=true + NULL fill (latest-only state
    cannot answer them); late facts are never applied to later spines."""
    import numpy as np

    from turboxsl_spark.streaming.stateful import run_streaming_asof_from_dir

    base = pd.Timestamp("2025-06-01")
    cols = ["conv_id", "ts", "side", "seq", "fact_value", "spine_id"]
    sec = lambda s: base + pd.Timedelta(seconds=s)
    # batch 1: fact v=1.0 @100, spine s0 @200 (fills 1.0)
    b1 = pd.DataFrame(
        [("c0", sec(100), 1, 0, 1.0, None), ("c0", sec(200), 0, 0, None, 0)],
        columns=cols,
    )
    # batch 2: LATE fact v=9.0 @50, LATE spine s1 @60, on-time spine s2 @300
    b2 = pd.DataFrame(
        [("c0", sec(50), 1, 1, 9.0, None),
         ("c0", sec(60), 0, 0, None, 1),
         ("c0", sec(300), 0, 0, None, 2)],
        columns=cols,
    )
    src = str(tmp_path / "asof_late_src")
    os.makedirs(src)
    for i, b in enumerate((b1, b2)):
        b = b.copy()
        b["ts"] = b["ts"].astype("datetime64[us]")
        b["side"] = b["side"].astype("int32")
        b["seq"] = b["seq"].astype("int64")
        b["spine_id"] = b["spine_id"].astype("Int64")
        b.to_parquet(f"{src}/part-{i:02d}.parquet", index=False)

    got = (
        run_streaming_asof_from_dir(spark, src, query_name="t_asof_late")
        .toPandas()
        .sort_values("spine_id", kind="mergesort")
        .reset_index(drop=True)
    )
    assert got["spine_id"].tolist() == [0, 1, 2]
    assert got["late"].tolist() == [False, True, False]
    assert got.loc[1, "fact_value_asof"] is None or pd.isna(got.loc[1, "fact_value_asof"])
    # the late fact (9.0 @50) must NOT displace the carried 1.0 @100
    assert got.loc[2, "fact_value_asof"] == 1.0


def test_streaming_asof_equal_ts_fact_tiebreak(spark, tmp_path):
    """A cross-batch fact at EXACTLY the carried watermark ts follows
    the batch (ts, side, seq) tie-break: seq <= stored seq → counted
    late, never applied; seq > stored seq → applied."""
    from turboxsl_spark.streaming.stateful import run_streaming_asof_from_dir

    base = pd.Timestamp("2025-06-01")
    cols = ["conv_id", "ts", "side", "seq", "fact_value", "spine_id"]
    sec = lambda s: base + pd.Timedelta(seconds=s)
    # batch 1: fact v=1.0 @100 seq=5
    b1 = pd.DataFrame([("c0", sec(100), 1, 5, 1.0, None)], columns=cols)
    # batch 2: equal-ts fact seq=3 (REGRESSION — would sort before the
    # stored fact in batch order), then a spine @200
    b2 = pd.DataFrame(
        [("c0", sec(100), 1, 3, 7.0, None), ("c0", sec(200), 0, 0, None, 0)],
        columns=cols,
    )
    # batch 3: equal-ts fact seq=9 (legitimately after), spine @300
    b3 = pd.DataFrame(
        [("c0", sec(100), 1, 9, 8.0, None), ("c0", sec(300), 0, 0, None, 1)],
        columns=cols,
    )
    src = str(tmp_path / "asof_eqts_src")
    os.makedirs(src)
    for i, b in enumerate((b1, b2, b3)):
        b = b.copy()
        b["ts"] = b["ts"].astype("datetime64[us]")
        b["side"] = b["side"].astype("int32")
        b["seq"] = b["seq"].astype("int64")
        b["spine_id"] = b["spine_id"].astype("Int64")
        b.to_parquet(f"{src}/part-{i:02d}.parquet", index=False)

    got = (
        run_streaming_asof_from_dir(spark, src, query_name="t_asof_eqts")
        .toPandas()
        .sort_values("spine_id", kind="mergesort")
        .reset_index(drop=True)
    )
    assert got["spine_id"].tolist() == [0, 1]
    # spine 0 must still see the stored 1.0, not the seq-3 regression
    assert got.loc[0, "fact_value_asof"] == 1.0
    # spine 1 sees the seq-9 equal-ts fact, which IS a legal update
    assert got.loc[1, "fact_value_asof"] == 8.0


def test_tumbling_rollup_streaming_matches_batch(spark, tmp_path):
    """The q_tumbling_rollup expression is streaming-compatible: the
    SAME F.window groupBy run as a file readStream (complete mode)
    equals the batch aggregate."""
    import numpy as np

    rng = np.random.RandomState(9)
    n = 2000
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.randint(0, 6 * 3600, n), unit="s"),
            "event_type": rng.choice(["click", "view", "error"], n),
            "value": np.round(rng.uniform(0, 50, n), 2),
        }
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    src = str(tmp_path / "roll_src")
    os.makedirs(src)
    for i in range(4):
        pdf.iloc[i * (n // 4) : (i + 1) * (n // 4)].to_parquet(
            f"{src}/part-{i}.parquet", index=False
        )

    def rollup(df):
        return (
            df.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_value"),
            )
            .select(
                F.col("w.start").alias("bucket_start"),
                "event_type",
                "n_events",
                "sum_value",
            )
        )

    batch_src = spark.read.parquet(src)
    want = (
        rollup(batch_src)
        .toPandas()
        .sort_values(["bucket_start", "event_type"])
        .reset_index(drop=True)
    )

    stream_src = spark.readStream.schema(batch_src.schema).parquet(src)
    q = (
        rollup(stream_src)
        .writeStream.format("memory")
        .queryName("t_rollup")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.table("t_rollup")
        .toPandas()
        .sort_values(["bucket_start", "event_type"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert got["n_events"].tolist() == want["n_events"].tolist()
    assert got["sum_value"].tolist() == want["sum_value"].tolist()
    assert got["bucket_start"].tolist() == want["bucket_start"].tolist()


def test_streaming_asof_equal_ts_spine_strict_vs_inclusive(spark, tmp_path):
    """A later-batch SPINE at exactly the carried watermark ts follows
    batch order against the stored fact's carried side: under the
    strict encoding (spine side 0 < fact side 1) it sorts BEFORE the
    fact, so it must get late=true + NULL (its batch answer is the
    PREVIOUS fact, gone from latest-only state); under the inclusive
    encoding (fact side 0 < spine side 1) it is served the carry."""
    from turboxsl_spark.streaming.stateful import run_streaming_asof_from_dir

    base = pd.Timestamp("2025-06-01")
    cols = ["conv_id", "ts", "side", "seq", "fact_value", "spine_id"]
    sec = lambda s: base + pd.Timedelta(seconds=s)

    def run(name, fact_side, spine_side):
        b1 = pd.DataFrame([("c0", sec(100), fact_side, 0, 1.0, None)], columns=cols)
        b2 = pd.DataFrame(
            [("c0", sec(100), spine_side, 0, None, 0)], columns=cols
        )
        src = str(tmp_path / name)
        os.makedirs(src)
        for i, b in enumerate((b1, b2)):
            b = b.copy()
            b["ts"] = b["ts"].astype("datetime64[us]")
            b["side"] = b["side"].astype("int32")
            b["seq"] = b["seq"].astype("int64")
            b["spine_id"] = b["spine_id"].astype("Int64")
            b.to_parquet(f"{src}/part-{i:02d}.parquet", index=False)
        return (
            run_streaming_asof_from_dir(spark, src, query_name=f"t_{name}")
            .toPandas()
            .reset_index(drop=True)
        )

    strict = run("eqts_strict", fact_side=1, spine_side=0)
    assert len(strict) == 1
    assert bool(strict.loc[0, "late"]) is True
    assert pd.isna(strict.loc[0, "fact_value_asof"])

    incl = run("eqts_incl", fact_side=0, spine_side=1)
    assert len(incl) == 1
    assert bool(incl.loc[0, "late"]) is False
    assert incl.loc[0, "fact_value_asof"] == 1.0


def test_streaming_kmv_matches_batch(spark, tmp_path):
    """The streamed KMV summary after the FINAL micro-batch must equal
    the batch kmv_distinct of the full data, and every intermediate
    emission must equal the batch sketch of its prefix — min-k is
    mergeable, so state-carried accumulation is exact, not
    approximate-on-top-of-approximate."""
    import numpy as np

    from turboxsl_spark.operators.sketches import kmv_distinct
    from turboxsl_spark.streaming.sketches import run_kmv_stream_from_dir

    rng = np.random.default_rng(11)
    langs = ["en", "ru", "de"]
    pdf = pd.DataFrame(
        {
            "lang": [langs[i % 3] for i in range(600)],
            "doc_id": rng.integers(0, 5000, 600),
        }
    )
    src = str(tmp_path / "kmv_src")
    os.makedirs(src)
    n_files = 4
    bounds = [int(len(pdf) * i / n_files) for i in range(n_files + 1)]
    for i in range(n_files):
        pdf.iloc[bounds[i] : bounds[i + 1]].to_parquet(
            f"{src}/part-{i:02d}.parquet", index=False
        )

    got = run_kmv_stream_from_dir(
        spark, src, "lang string, doc_id long", "lang", "doc_id",
        k=32, salt="skmv", query_name="kmv_t1",
    ).toPandas()

    # final emission per group == batch sketch of everything
    final = (
        got.sort_values("seq").groupby("grp").tail(1).set_index("grp")
    )
    full = spark.createDataFrame(pdf, "lang string, doc_id long")
    want = {
        r["lang"]: (r["n_kept"], r["kth_hash"], r["distinct_est"])
        for r in kmv_distinct(full, "lang", "doc_id", k=32, salt="skmv").collect()
    }
    assert set(final.index) == set(want)
    for g, (nk, kh, est) in want.items():
        row = final.loc[g]
        assert (row["n_kept"], row["kth_hash"]) == (nk, kh), g
        assert row["distinct_est"] == est, g

    # every intermediate emission == batch sketch of its file prefix
    for upto in range(1, n_files):
        prefix = spark.createDataFrame(
            pdf.iloc[: bounds[upto + 1]], "lang string, doc_id long"
        )
        wantp = {
            r["lang"]: (r["n_kept"], r["kth_hash"])
            for r in kmv_distinct(prefix, "lang", "doc_id", k=32, salt="skmv").collect()
        }
        gotp = got[got["seq"] == upto + 1].set_index("grp")
        for g in gotp.index:
            assert (gotp.loc[g, "n_kept"], gotp.loc[g, "kth_hash"]) == wantp[g], (
                upto, g,
            )


def test_streaming_kmv_null_and_int_keys_match_batch(spark, tmp_path):
    """Nullable int keys: Arrow→pandas upcasts them to float64, so
    without JVM-side normalization NULLs arrive as NaN (bypassing the
    sentinel) and ints stringify as '5.0' vs the batch '5' — the
    streamed sketch silently diverged from batch kmv_distinct
    (ADVICE r05). The coalesce+cast in streaming_kmv_distinct pins the
    parity for exactly this input shape."""
    from turboxsl_spark.operators.sketches import kmv_distinct
    from turboxsl_spark.streaming.sketches import run_kmv_stream_from_dir

    pdf = pd.DataFrame(
        {
            "lang": ["en"] * 6 + ["ru"] * 6,
            "doc_id": pd.array(
                [5, None, 7, 5, None, 9, 1, 2, None, 3, 4, 4], dtype="Int64"
            ),
        }
    )
    src = str(tmp_path / "kmv_null_src")
    os.makedirs(src)
    for i in range(2):
        pdf.iloc[i * 6 : (i + 1) * 6].to_parquet(
            f"{src}/part-{i:02d}.parquet", index=False
        )
    got = (
        run_kmv_stream_from_dir(
            spark, src, "lang string, doc_id long", "lang", "doc_id",
            k=4, salt="skmv_null", query_name="kmv_t_null",
        )
        .toPandas()
        .sort_values("seq")
        .groupby("grp")
        .tail(1)
        .set_index("grp")
    )
    full = spark.createDataFrame(pdf, "lang string, doc_id long")
    want = {
        r["lang"]: (r["n_kept"], r["kth_hash"], r["distinct_est"])
        for r in kmv_distinct(
            full, "lang", "doc_id", k=4, salt="skmv_null"
        ).collect()
    }
    assert set(got.index) == set(want)
    for g, (nk, kh, est) in want.items():
        assert (got.loc[g, "n_kept"], got.loc[g, "kth_hash"]) == (nk, kh), g
        assert got.loc[g, "distinct_est"] == est, g
