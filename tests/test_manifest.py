"""Crash-resume semantics of the checkpoint manifest."""

from __future__ import annotations

import os

import pytest

from turboxsl_spark.plans.manifest import (
    committed_buckets,
    read_output,
    write_with_manifest,
)
from turboxsl_spark.sources.transcripts import TRANSCRIPT_SCHEMA, gen_transcripts_pdf

N_BUCKETS = 8


@pytest.fixture()
def df(spark):
    pdf = gen_transcripts_pdf(n_convs=40, seed=9, mega_frac=0.0)
    return spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)


def test_crash_then_resume(spark, df, tmp_path):
    out = str(tmp_path / "out")
    with pytest.raises(RuntimeError, match="simulated crash"):
        write_with_manifest(df, out, n_buckets=N_BUCKETS, fail_after=3)
    first = committed_buckets(out)
    assert len(first) == 3
    mtimes = {
        b: os.path.getmtime(os.path.join(out, f"bucket={b}", "_SUCCESS"))
        for b in first
    }

    # resume: only the remaining buckets are processed
    second_run = write_with_manifest(df, out, n_buckets=N_BUCKETS)
    assert {e["bucket"] for e in second_run} == set(range(N_BUCKETS)) - set(first)

    # committed buckets were NOT rewritten
    for b, m in mtimes.items():
        assert os.path.getmtime(os.path.join(out, f"bucket={b}", "_SUCCESS")) == m

    # full output equals the input, with lineage row counts adding up
    back = read_output(spark, out, N_BUCKETS)
    assert back.count() == df.count()
    total = sum(e["rows"] for e in committed_buckets(out).values())
    assert total == df.count()
    entries = committed_buckets(out)
    assert all(e["rows_per_sec"] is not None for e in entries.values())


def test_noop_when_fully_committed(spark, df, tmp_path):
    out = str(tmp_path / "out")
    write_with_manifest(df, out, n_buckets=4)
    assert write_with_manifest(df, out, n_buckets=4) == []
