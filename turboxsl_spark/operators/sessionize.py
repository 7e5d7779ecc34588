"""Gap-based sessionization.

Classic two-window composition (public Spark idiom): flag rows whose
gap from the previous turn exceeds the timeout, then a running sum of
flags over rows (-inf, 0] yields a 0-based session id per conversation.
Both windows share the one conv sort, so the plan has a single Sort +
Exchange (verify with ``.explain("formatted")``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from turboxsl_spark.operators.windows import conv_window

DEFAULT_TIMEOUT_S = 1800


def with_session_id(
    df: DataFrame,
    timeout_s: int = DEFAULT_TIMEOUT_S,
    w: WindowSpec | None = None,
    ts_col: str = "ts",
    out: str = "session_id",
    keep_gap: bool = False,
) -> DataFrame:
    """0-based session id; a new session starts when gap > timeout.

    The first turn of a conversation (gap undefined) starts session 0.
    """
    w = w or conv_window()
    # integer-microsecond subtraction, then one division: bit-exact vs the
    # pandas reference (double epoch-seconds subtraction is not)
    micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = ((micros - F.lag(micros, 1).over(w)).cast("double")) / F.lit(1e6)
    is_new = F.when(gap > F.lit(float(timeout_s)), 1).otherwise(0)
    df = df.withColumn("_gap_s", gap).withColumn("_new_sess", is_new)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    df = df.withColumn(out, F.sum("_new_sess").over(run).cast("int"))
    drop = ["_new_sess"] if keep_gap else ["_new_sess", "_gap_s"]
    if keep_gap:
        df = df.withColumnRenamed("_gap_s", "gap_s")
    return df.drop(*drop)
