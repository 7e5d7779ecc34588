"""Sequence packing vs pure-python references."""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest

from turboxsl_spark.operators.packing import pack_fixed_boundary, pack_greedy


def _docs(n=500, seed=11):
    rng = random.Random(seed)
    return [(i, rng.randint(1, 120)) for i in range(n)]


def test_fixed_boundary_matches_python(spark):
    rows = _docs()
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = (
        pack_fixed_boundary(
            df,
            ["doc_id"],
            "n_tok",
            window=256,
            shard_col=F.pmod(F.col("doc_id"), F.lit(4)),
        )
        .select("doc_id", "_shard", "_start", "seq_id")
        .collect()
    )
    # python reference: per shard, cumulative offsets in doc_id order
    want = {}
    for s in range(4):
        cum = 0
        for doc_id, t in [r for r in rows if r[0] % 4 == s]:
            want[doc_id] = (s, cum, cum // 256)
            cum += t
    assert len(out) == len(rows)
    for r in out:
        assert (r["_shard"], r["_start"], r["seq_id"]) == want[r["doc_id"]]


def test_fixed_boundary_is_repartition_stable(spark):
    rows = _docs(300, seed=5)
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    kw = dict(
        order_cols=["doc_id"],
        token_col="n_tok",
        window=128,
        shard_col=F.pmod(F.col("doc_id"), F.lit(3)),
    )
    a = {r["doc_id"]: r["seq_id"] for r in pack_fixed_boundary(df, **kw).collect()}
    b = {
        r["doc_id"]: r["seq_id"]
        for r in pack_fixed_boundary(df.repartition(13), **kw).collect()
    }
    assert a == b


def test_greedy_matches_python_and_respects_window(spark):
    rows = _docs(400, seed=7)
    df = spark.createDataFrame(rows, "doc_id long, n_tok long").withColumn(
        "shard", F.pmod(F.col("doc_id"), F.lit(3))
    )
    got = pack_greedy(df, "doc_id", "n_tok", window=200, shard_col="shard").collect()

    def ref(shard_rows):
        seq, fill, outm = 0, 0, {}
        for k, t in shard_rows:
            if fill > 0 and fill + t > 200:
                seq, fill = seq + 1, 0
            fill += t
            outm[k] = (seq, fill)
        return outm

    want = {}
    for s in range(3):
        want.update(ref(sorted((r[0], r[1]) for r in rows if r[0] % 3 == s)))
    assert len(got) == len(rows)
    for r in got:
        assert (r["seq_id"], r["seq_fill"]) == want[r["key"]]
    # no multi-doc sequence exceeds the window
    from collections import defaultdict

    per_seq = defaultdict(list)
    for r in got:
        per_seq[(r["shard"], r["seq_id"])].append(r["n_tok"])
    for toks in per_seq.values():
        if len(toks) > 1:
            assert sum(toks) <= 200


def test_greedy_oversized_doc_is_singleton(spark):
    df = spark.createDataFrame(
        [(1, 50), (2, 999), (3, 60)], "doc_id long, n_tok long"
    ).withColumn("shard", F.lit(0))
    got = {
        r["key"]: (r["seq_id"], r["seq_fill"])
        for r in pack_greedy(df, "doc_id", "n_tok", window=100, shard_col="shard").collect()
    }
    assert got[1] == (0, 50)
    assert got[2] == (1, 999)  # own sequence, flagged by fill > window
    assert got[3] == (2, 60)


def test_packing_validation(spark):
    df = spark.createDataFrame([(1, 5)], "doc_id long, n_tok long")
    with pytest.raises(ValueError):
        pack_fixed_boundary(df, ["doc_id"], "n_tok", window=0)
    with pytest.raises(ValueError):
        pack_greedy(df, "doc_id", "n_tok", window=-1, shard_col="doc_id")


def test_fixed_boundary_plan_single_window_exchange(spark):
    df = spark.createDataFrame(_docs(100), "doc_id long, n_tok long")
    out = pack_fixed_boundary(
        df, ["doc_id"], "n_tok", window=64,
        shard_col=F.pmod(F.col("doc_id"), F.lit(4)),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # exactly the per-shard window shuffle; no Python anywhere
    assert plan.count("Exchange") == 1
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
