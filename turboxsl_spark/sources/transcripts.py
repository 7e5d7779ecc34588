"""Deterministic synthetic transcript tables (FIXTURES.md §1-2).

The generator is fully seeded (numpy ``default_rng``) and vectorized, so
the same ``(n_convs, seed)`` always yields byte-identical tables — the
tabular analogue of the reference's golden test corpus
(``/root/reference/tests/general``), where a fixed input must reproduce
a fixed output at any pool size.

Shape per ``BASELINE.json.input_hint``::

    conv_id: string, turn_idx: int32, role: string, text: string,
    tool: string (nullable), ts: timestamp

Skew: conversation sizes are heavy-tailed, including a few "mega"
conversations (10^3..10^4 turns) so salting / two-phase window merges
are actually exercised (the analogue of work-stealing in
``/root/reference/src/unbounded_queue.c:101-128``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array([f"tool_{i:02d}" for i in range(12)])

# Token vocabulary: plain words, UTF-8 multibyte, XML-special chars,
# AVT-style braces, runs of whitespace — exercises normalize-space,
# translate, substring (codepoint-aware), escaping (SURVEY.md §2.9).
_VOCAB = np.array(
    [
        "alpha", "beta", "gamma", "delta", "query", "token", "result",
        "Ω-unit", "héllo", "naïve", "好的", "мир", "ok",
        "a&b", "<tag>", 'say "hi"', "it's", "{slot}", "}brace{",
        "  spaced  ", "tab\tsep", "line", "42", "3.14", "-7",
    ]
)


def _sizes(n_convs: int, rng: np.random.Generator, mega_frac: float) -> np.ndarray:
    """Heavy-tailed conversation sizes: mostly 2-50, ~9% 51-200, mega tail."""
    u = rng.random(n_convs)
    sizes = np.empty(n_convs, dtype=np.int64)
    small = u < 0.90 - mega_frac
    mid = (~small) & (u < 1.0 - mega_frac)
    mega = ~small & ~mid
    sizes[small] = rng.integers(2, 51, small.sum())
    sizes[mid] = rng.integers(51, 201, mid.sum())
    sizes[mega] = rng.integers(1000, 10001, mega.sum())
    return sizes


def gen_transcripts_pdf(
    n_convs: int = 200,
    seed: int = 42,
    mega_frac: float = 0.005,
    session_timeout_s: int = 1800,
) -> pd.DataFrame:
    """Seeded pandas transcript table, stable under (conv_id, turn_idx)."""
    rng = np.random.default_rng(seed)
    sizes = _sizes(n_convs, rng, mega_frac)
    n = int(sizes.sum())

    conv_ord = np.repeat(np.arange(n_convs), sizes)
    conv_id = np.char.add("c", np.char.zfill(conv_ord.astype("U7"), 7))
    # dense 0..k-1 turn_idx within each conversation
    starts = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    turn_idx = (np.arange(n) - np.repeat(starts, sizes)).astype(np.int32)

    # roles: user/assistant alternation with seeded system/tool noise
    role = ROLES[turn_idx % 2]
    noise = rng.random(n)
    role = np.where(noise < 0.05, "system", role)
    role = np.where((noise >= 0.05) & (noise < 0.15), "tool", role)

    # text: 1..8 tokens joined by 1-3 spaces — fully vectorized assembly
    n_tok = rng.integers(1, 9, n)
    tok_idx = rng.integers(0, len(_VOCAB), (n, 8))
    seps = np.array([" ", "  ", "   "])
    sep_arr = seps[rng.integers(0, 3, n)]
    toks = _VOCAB[tok_idx]
    text = toks[:, 0].copy()
    for j in range(1, 8):
        piece = np.where(n_tok > j, np.char.add(sep_arr, toks[:, j]), "")
        text = np.char.add(text, piece)

    # tool: ~20% non-null
    tool = np.where(rng.random(n) < 0.2, TOOLS[rng.integers(0, len(TOOLS), n)], None)

    # ts: per-conv monotone; gap classes {seconds, minutes, > timeout};
    # ~2% zero gaps force duplicate ts → turn_idx tiebreak is exercised.
    gap_u = rng.random(n)
    gaps = np.where(
        gap_u < 0.02,
        0.0,
        np.where(
            gap_u < 0.72,
            rng.uniform(1, 30, n),
            np.where(
                gap_u < 0.95,
                rng.uniform(60, 600, n),
                rng.uniform(session_timeout_s + 60, session_timeout_s * 4, n),
            ),
        ),
    )
    conv_start = rng.uniform(0, 86400 * 30, n_convs)  # within a month
    gaps[starts] = 0.0
    cum = np.cumsum(gaps)
    cum_within = cum - np.repeat(cum[starts], sizes)
    epoch = np.datetime64("2025-01-01T00:00:00", "us")
    ts = epoch + (
        (np.repeat(conv_start, sizes) + cum_within) * 1_000_000
    ).astype("timedelta64[us]")

    pdf = pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": role,
            "text": text,
            "tool": tool,
            "ts": ts,
        }
    )
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return pdf


def gen_transcripts(
    spark: SparkSession,
    n_convs: int = 200,
    seed: int = 42,
    mega_frac: float = 0.005,
    partitions: int | None = None,
) -> DataFrame:
    pdf = gen_transcripts_pdf(n_convs=n_convs, seed=seed, mega_frac=mega_frac)
    df = spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)
    if partitions:
        df = df.repartition(partitions, "conv_id")
    return df


def gen_tool_catalog_pdf(seed: int = 42) -> pd.DataFrame:
    """Dimension fixture (FIXTURES.md §2): key()/document() join target.

    Covers all generator tool values plus extras so the unmatched-probe
    case (key() → empty nodeset → NULL) is exercised.
    """
    rng = np.random.default_rng(seed + 1)
    tools = list(TOOLS) + ["tool_98", "tool_99"]
    return pd.DataFrame(
        {
            "tool": tools,
            "category": [f"cat_{i % 4}" for i in range(len(tools))],
            "cost_weight": np.round(rng.uniform(0.1, 9.9, len(tools)), 3),
        }
    )


def gen_tool_catalog(spark: SparkSession, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(gen_tool_catalog_pdf(seed))


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a transcript-shaped table from the driver's events.parquet.

    Deterministic adapter so driver-checked queries can exercise the
    conversation operators on driver data: each user's event stream
    becomes a conversation ordered by (ts, event_id).

      conv_id  = 'u' || user_id
      turn_idx = dense 0-based rank within conv (row_number - 1)
      role     = event_type
      text     = props
      tool     = event_type on every 5th event_id else NULL (sparse)
      ts       = ts
    """
    from pyspark.sql import functions as F, Window as W

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
        F.when(F.col("event_id") % 5 == 0, F.col("event_type")).alias("tool"),
        F.col("ts"),
    )
