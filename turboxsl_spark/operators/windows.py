"""Window navigations — the Spark form of the reference's XPath axes.

turboxsl's sibling axes walk prev/next pointers within one document
(``/root/reference/src/xpath.c:359-372, 394-407``); here "document" =
conversation and the axes become lag/lead and frames over ONE shared
window spec, so Catalyst plans a single sort per stage
(``Window.partitionBy(conv_id).orderBy(ts, turn_idx)``) and every
window feature rides the same exchange — check with
``df.explain("formatted")``: one Sort + one Exchange for all of them.

Leakage discipline (SURVEY.md §2.6): ``preceding-sibling`` features are
point-in-time safe; ``following-sibling`` (lead) features are emitted
only with the explicit ``_future`` suffix and are excluded from the PIT
surface by default.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

KEY = "conv_id"
ORDER = ("ts", "turn_idx")


def conv_window(key: str = KEY, order: Sequence[str] = ORDER) -> WindowSpec:
    """The one shared window: partition by conversation, document order.

    ``turn_idx`` is the stable tiebreaker for duplicate ``ts`` —
    mirrors the reference's parse-time sibling ``position``
    (``/root/reference/src/parse.c:309-320``).
    """
    return Window.partitionBy(key).orderBy(*[F.col(c) for c in order])


def with_position(df: DataFrame, w: WindowSpec | None = None, col: str = "position") -> DataFrame:
    """1-based position within the conversation — XPath ``position()``.

    Selection-relative: apply AFTER filters, matching the reference,
    which numbers the post-filter selection
    (``/root/reference/src/xpath.c:114-134``).
    """
    w = w or conv_window()
    return df.withColumn(col, F.row_number().over(w))


def with_last(df: DataFrame, key: str = KEY, col: str = "last_pos") -> DataFrame:
    """XPath ``last()`` = size of the selection = count over the group."""
    return df.withColumn(col, F.count("*").over(Window.partitionBy(key)))


def with_lag_lead(
    df: DataFrame,
    cols: Sequence[str],
    offsets: Sequence[int] = (1,),
    w: WindowSpec | None = None,
    lead: bool = False,
) -> DataFrame:
    """``preceding-sibling::``/``following-sibling::`` as lag/lead.

    Lead columns get a ``_future`` suffix: they are legitimate operators
    but leakage-prone, so the naming makes them impossible to mistake
    for PIT features.
    """
    w = w or conv_window()
    for c in cols:
        for k in offsets:
            df = df.withColumn(f"{c}_lag{k}", F.lag(c, k).over(w))
            if lead:
                df = df.withColumn(f"{c}_lead{k}_future", F.lead(c, k).over(w))
    return df


def with_forward_fill(
    df: DataFrame,
    cols: Sequence[str],
    w: WindowSpec | None = None,
    suffix: str = "_ffill",
) -> DataFrame:
    """Backfill: most recent non-null value at or before this row.

    ``F.last(c, ignorenulls=True)`` over rows (-inf, 0] — the
    point-in-time "latest known fact" primitive.
    """
    w = (w or conv_window()).rowsBetween(Window.unboundedPreceding, 0)
    for c in cols:
        df = df.withColumn(f"{c}{suffix}", F.last(c, ignorenulls=True).over(w))
    return df


def with_running(
    df: DataFrame,
    agg: dict[str, Column],
    w: WindowSpec | None = None,
) -> DataFrame:
    """Running aggregates over rows (-inf, 0] of the conv window.

    ``agg`` maps output column name → aggregate Column (e.g.
    ``{"n_turns_so_far": F.count("*"), "chars_so_far": F.sum("n")}``).
    """
    w = (w or conv_window()).rowsBetween(Window.unboundedPreceding, 0)
    for name, col in agg.items():
        df = df.withColumn(name, col.over(w))
    return df
