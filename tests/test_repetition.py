"""repetition_metrics vs a pure-python Counter reference."""

from __future__ import annotations

import random
from collections import Counter

import pyspark.sql.functions as F

from turboxsl_spark.functions.text_analysis import repetition_metrics, words_of


def _ref(text: str):
    # mirror words_of: collapse whitespace, trim, lower, split on ' '
    # (empty text → [''] — same as Spark split / DuckDB string_split)
    ws = " ".join(text.split()).strip().lower().split(" ")
    n = len(ws)
    bgs = [ws[i] + "\x1f" + ws[i + 1] for i in range(n - 1)]
    c = Counter(bgs)
    nb = len(bgs)
    return (
        n,
        len(set(ws)) / n if n else 0.0,
        max(c.values()) / nb if nb else 0.0,
        sum(v for v in c.values() if v > 1) / nb if nb else 0.0,
    )


def test_repetition_metrics_match_python(spark):
    rng = random.Random(7)
    vocab = ["the", "cat", "sat", "on", "a", "mat", "dog", "ran"]
    texts = [
        "a b a b a b c",
        "x y z w q",
        "hello",
        "",
        "t t t t",
        "spam spam spam spam spam spam",
    ] + [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 60)))
        for _ in range(40)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    rows = (
        df.withColumn("w", words_of("text"))
        .select("id", "text", repetition_metrics(F.col("w")).alias("m"))
        .select("id", "text", "m.*")
        .collect()
    )
    for r in rows:
        want = _ref(r["text"])
        got = (
            r["n_words"],
            r["distinct_word_frac"],
            r["top_bigram_frac"],
            r["dup_bigram_frac"],
        )
        assert got == want, f"id={r['id']} text={r['text']!r}: {got} != {want}"


def test_repetition_metrics_plan_is_map_only(spark):
    df = spark.createDataFrame([(1, "a b a b")], "id long, text string")
    out = (
        df.withColumn("w", words_of("text"))
        .select("id", repetition_metrics(F.col("w")).alias("m"))
        .select("id", "m.*")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Generate" not in plan  # no explode — the scan is in-array
