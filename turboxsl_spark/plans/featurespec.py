"""Declarative feature plan → one DataFrame DAG.

The reference compiles a stylesheet once and applies it to every
document (``XSLTNewProcessor`` / ``XSLTProcess``,
``/root/reference/src/transform.c:507-557, 633-718``). Our analogue:
a ``FeatureSpec`` is "the stylesheet" — a declarative description of
the per-turn features — and ``build_features`` compiles it ONCE into a
lazy DataFrame DAG that Catalyst optimizes (the stand-in for turboxsl's
template precompilation + XPath memoization).

All window features share ONE window spec so the physical plan sorts
each partition once (single Exchange + Sort feeding every window
function — verified in tests/test_plans.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from turboxsl_spark.functions.strings import avt_template, md5_hex, normalize_space
from turboxsl_spark.operators.sessionize import with_session_id
from turboxsl_spark.operators.windows import (
    conv_window,
    with_forward_fill,
    with_lag_lead,
    with_position,
    with_running,
)

DEFAULT_TEMPLATE = "[{role}#{position}] {text_norm}"


@dataclass(frozen=True)
class FeatureSpec:
    """The flagship per-turn feature surface (SURVEY.md §7 phase 0).

    Every feature is point-in-time safe: only rows at or before the
    current turn in ``(ts, turn_idx)`` order are read.
    """

    session_timeout_s: int = 1800
    lag_cols: tuple[str, ...] = ("role", "text_len")
    lag_offsets: tuple[int, ...] = (1, 2)
    ffill_cols: tuple[str, ...] = ("tool",)
    template: str = DEFAULT_TEMPLATE
    extra_running: bool = True
    digest: bool = True
    leads: bool = False  # lead features are non-PIT; off by default
    # Raw text is reproducible from the source table by (conv_id,
    # turn_idx); carrying it through the window shuffle roughly doubles
    # the string bytes per row, and on bandwidth-bound hardware that
    # directly costs scaling efficiency (measured 0.65 → 0.81 at 4→16
    # cores). Off by default; flip on when the sink wants raw text.
    keep_text: bool = False


def build_features(df: DataFrame, spec: FeatureSpec = FeatureSpec()) -> DataFrame:
    """Compile the spec against a transcript-shaped DataFrame."""
    w = conv_window()

    # per-turn text stage (JVM-side codegen; no shuffle)
    df = df.withColumn("text_norm", normalize_space("text"))
    df = df.withColumn("text_len", F.length("text_norm"))
    df = df.withColumn(
        "n_tokens",
        F.when(F.col("text_len") == 0, 0).otherwise(
            F.size(F.split(F.col("text_norm"), " "))
        ),
    )

    # window navigation stage (one sort per conversation partition)
    df = with_position(df, w)
    df = with_lag_lead(df, spec.lag_cols, spec.lag_offsets, w, lead=spec.leads)
    df = with_session_id(df, spec.session_timeout_s, w, keep_gap=True)
    df = with_forward_fill(df, spec.ffill_cols, w)
    if spec.extra_running:
        df = with_running(
            df,
            {
                "turns_so_far": F.count(F.lit(1)),
                "chars_so_far": F.sum("text_len"),
            },
            w,
        )

    # templated per-turn text — the byte-equal invariant column
    df = df.withColumn(
        "rendered",
        avt_template(
            spec.template,
            role=F.col("role"),
            position=F.col("position"),
            text_norm=F.col("text_norm"),
        ),
    )
    if spec.digest:
        df = df.withColumn("digest", md5_hex("conv_id", "turn_idx", "rendered"))
    if not spec.keep_text:
        df = df.drop("text")
    return df


FLAGSHIP_FEATURE_COLS = [
    "text_norm",
    "text_len",
    "n_tokens",
    "position",
    "role_lag1",
    "role_lag2",
    "text_len_lag1",
    "text_len_lag2",
    "gap_s",
    "session_id",
    "tool_ffill",
    "turns_so_far",
    "chars_so_far",
    "rendered",
    "digest",
]
