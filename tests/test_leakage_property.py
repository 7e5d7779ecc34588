"""Property-based zero-temporal-leakage tests (hypothesis).

The north-rule invariant: any feature computed at (conv_id, ts) may
only read rows at or before that point, so computing over a TRUNCATED
table must reproduce the full table's values for the surviving rows —
for random tables and random cut points, not just the fixture.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import assert_frames_match
from turboxsl_spark.operators.asof import asof_join
from turboxsl_spark.plans.featurespec import FLAGSHIP_FEATURE_COLS, FeatureSpec, build_features
from turboxsl_spark.sources.transcripts import TRANSCRIPT_SCHEMA, gen_transcripts_pdf

KEYS = ["conv_id", "turn_idx"]

_spark = None


@pytest.fixture(scope="module", autouse=True)
def _grab_spark(spark):
    global _spark
    _spark = spark
    yield


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(0, 10_000), frac=st.floats(0.1, 0.9))
def test_flagship_prefix_consistency(seed, frac):
    pdf = gen_transcripts_pdf(n_convs=12, seed=seed, mega_frac=0.0)
    sizes = pdf.groupby("conv_id")["turn_idx"].transform("max") + 1
    cut = (sizes * frac).astype(int).clip(lower=1)
    prefix_pdf = pdf[pdf["turn_idx"] < cut]

    def run(p):
        df = _spark.createDataFrame(p, TRANSCRIPT_SCHEMA)
        out = build_features(df, FeatureSpec())
        return out.select(*KEYS, *FLAGSHIP_FEATURE_COLS).toPandas()

    full = run(pdf).merge(prefix_pdf[KEYS], on=KEYS, how="inner")
    pref = run(prefix_pdf)
    assert_frames_match(pref, full, KEYS, float_cols=["gap_s"])


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(0, 10_000), strict=st.booleans())
def test_asof_prefix_consistency(seed, strict):
    """Truncating FUTURE facts must not change any as-of value at
    surviving spine timestamps (the PIT guarantee for the fact side)."""
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2025-06-01")
    n_s, n_f = 40, 60
    spine = pd.DataFrame(
        {
            "conv_id": [f"k{int(i)}" for i in rng.integers(0, 5, n_s)],
            "ts": [base + pd.Timedelta(seconds=int(t)) for t in rng.integers(0, 5000, n_s)],
            "turn_idx": range(n_s),
        }
    )
    facts = pd.DataFrame(
        {
            "conv_id": [f"k{int(i)}" for i in rng.integers(0, 5, n_f)],
            "ts": [base + pd.Timedelta(seconds=int(t)) for t in rng.integers(0, 5000, n_f)],
            "fact_id": range(n_f),
            "value": rng.normal(size=n_f),
        }
    )
    cut_ts = base + pd.Timedelta(seconds=2500)

    def run(sp, fa):
        return (
            asof_join(
                _spark.createDataFrame(sp),
                _spark.createDataFrame(fa),
                on="conv_id",
                ts_col="ts",
                value_cols=["value"],
                strict=strict,
                fact_seq_col="fact_id",
            )
            .toPandas()
            .sort_values(KEYS, kind="mergesort")
            .reset_index(drop=True)
        )

    full = run(spine, facts)
    # keep only spine rows before the cut; facts after the cut removed
    spine_cut = spine[spine["ts"] < cut_ts]
    facts_cut = facts[facts["ts"] < cut_ts]
    trunc = run(spine_cut, facts_cut)
    full_cut = (
        full.merge(spine_cut[KEYS], on=KEYS, how="inner")
        .sort_values(KEYS, kind="mergesort")
        .reset_index(drop=True)
    )
    trunc["value_asof"] = trunc["value_asof"].astype("float64")
    full_cut["value_asof"] = full_cut["value_asof"].astype("float64")
    assert_frames_match(trunc, full_cut, KEYS, float_cols=["value_asof"])
