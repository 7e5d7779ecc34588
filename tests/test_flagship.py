"""Golden differential tests: Spark flagship features vs the pandas
single-node reference (the analogue of the reference repo's
``.xsl × .xml → .out`` byte-compare corpus)."""

from __future__ import annotations

import pandas as pd
import pytest

from tests.conftest import assert_frames_match
from turboxsl_spark.plans.featurespec import FLAGSHIP_FEATURE_COLS, FeatureSpec, build_features
from turboxsl_spark.reference_impl import reference_features
from turboxsl_spark.sources.transcripts import TRANSCRIPT_SCHEMA, gen_transcripts_pdf

KEYS = ["conv_id", "turn_idx"]
FLOATS = ["gap_s"]


@pytest.fixture(scope="module")
def pdf():
    return gen_transcripts_pdf(n_convs=80, seed=7, mega_frac=0.0)


@pytest.fixture(scope="module")
def golden(pdf):
    return reference_features(pdf)


def _run_spark(spark, pdf, partitions=None):
    df = spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)
    if partitions:
        df = df.repartition(partitions, "conv_id")
    out = build_features(df, FeatureSpec())
    return out.select(*KEYS, *FLAGSHIP_FEATURE_COLS).toPandas()


def test_flagship_matches_reference(spark, pdf, golden):
    got = _run_spark(spark, pdf)
    assert_frames_match(got, golden, KEYS, float_cols=FLOATS)


def test_rendered_text_byte_equal(spark, pdf, golden):
    """Per-turn templated text byte-equal under stable ordering."""
    got = _run_spark(spark, pdf)
    a = got.sort_values(KEYS, kind="mergesort")["rendered"].tolist()
    b = golden.sort_values(KEYS, kind="mergesort")["rendered"].tolist()
    assert a == b


def test_parallelism_invariance(spark, pdf):
    """Same goldens at different parallelism — the analogue of
    turboxsltproc's pool-size argument having no effect on outputs."""
    a = _run_spark(spark, pdf, partitions=2)
    b = _run_spark(spark, pdf, partitions=13)
    assert_frames_match(a, b, KEYS, float_cols=FLOATS)


def test_prefix_consistency_no_leakage(spark, pdf):
    """Zero-temporal-leakage property: features on a prefix of each
    conversation equal the same rows of the full computation."""
    full = _run_spark(spark, pdf)
    # truncate every conversation to its first half (at least 1 turn)
    sizes = pdf.groupby("conv_id")["turn_idx"].transform("max") + 1
    cut = (sizes // 2).clip(lower=1)
    prefix_pdf = pdf[pdf["turn_idx"] < cut]
    prefix = _run_spark(spark, prefix_pdf)
    merged_keys = prefix_pdf[KEYS]
    full_cut = full.merge(merged_keys, on=KEYS, how="inner")
    assert_frames_match(prefix, full_cut, KEYS, float_cols=FLOATS)


def test_mega_conversation_skew(spark):
    """A heavy-tailed input (mega convs) still matches the reference."""
    pdf = gen_transcripts_pdf(n_convs=30, seed=11, mega_frac=0.07)
    assert pdf.groupby("conv_id").size().max() >= 1000
    golden = reference_features(pdf)
    got = _run_spark(spark, pdf, partitions=8)
    assert_frames_match(got, golden, KEYS, float_cols=FLOATS)
