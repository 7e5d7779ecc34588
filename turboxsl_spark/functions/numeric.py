"""XPath-1.0 numeric semantics as Column helpers.

The reference's C edge cases (FIXTURES.md §5) are pinned here and in
``tests/test_coercions.py``:
  round(x) = floor(x + 0.5)      → round(-0.5) == 0, unlike HALF_UP
  mod truncates both operands to long
  number('') / number('abc') → NaN (not NULL)
  boolean('') → false, boolean(non-empty) → true
  integral doubles stringify without a decimal point
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# Spark's floor/ceil(double) return LongType via a raw Java cast, so
# NaN would become 0 and ±inf would saturate to ±Long.MAX — violating
# XPath 1.0 (and C floor()) semantics where non-finite values pass
# through. |x| >= 2^53 doubles are already integral (and cover ±inf),
# so they are returned unchanged, which also dodges the long overflow.
_PASS_THROUGH = 2.0**53


def _with_integral_guard(c: Column, rounded: Column) -> Column:
    return F.when(
        F.isnan(c) | (F.abs(c) >= F.lit(_PASS_THROUGH)), c
    ).otherwise(rounded)


def xpath_round(c: Column | str) -> Column:
    """XPath ``round``: floor(x + 0.5); NaN/±inf propagate unchanged."""
    c = _c(c).cast("double")
    return _with_integral_guard(c, F.floor(c + F.lit(0.5)).cast("double"))


def xpath_floor(c: Column | str) -> Column:
    c = _c(c).cast("double")
    return _with_integral_guard(c, F.floor(c).cast("double"))


def xpath_ceiling(c: Column | str) -> Column:
    c = _c(c).cast("double")
    return _with_integral_guard(c, F.ceil(c).cast("double"))


def xpath_mod(left: Column | str, right: Column | str) -> Column:
    """``mod`` truncates BOTH operands to long before the remainder.

    ANSI-safe: NaN / out-of-long-range operands become NULL via
    try_cast (the engine's NULL plays XPath's NaN for integer results)
    and a zero divisor yields NULL instead of raising
    REMAINDER_BY_ZERO — edge operands must not abort a 100-TB job.
    """
    li = _c(left).try_cast("double").try_cast("long")
    ri = _c(right).try_cast("double").try_cast("long")
    return F.when(
        li.isNull() | ri.isNull() | (ri == 0), F.lit(None).cast("long")
    ).otherwise(li % ri)


def xpath_number(c: Column | str) -> Column:
    """``number()``: unparseable / empty strings become NaN, not NULL.

    NULL input stays NULL (no XPath analogue — engine extension).
    """
    c = _c(c)
    d = F.trim(c.cast("string")).try_cast("double")
    return F.when(c.isNull(), F.lit(None).cast("double")).otherwise(
        F.coalesce(d, F.lit(float("nan")))
    )


def xpath_boolean_str(c: Column | str) -> Column:
    """``boolean(string)``: empty string → false, anything else → true."""
    c = _c(c)
    return F.when(c.isNull(), F.lit(False)).otherwise(F.length(c.cast("string")) > 0)


def xpath_number_to_string(c: Column | str) -> Column:
    """``string(number)``: integral doubles print without a decimal point.

    4.0 → "4", 4.5 → "4.5", NaN → "NaN" (XPath 1.0 number formatting).
    """
    c = _c(c).cast("double")
    as_long = c.cast("long")
    return (
        F.when(F.isnan(c), F.lit("NaN"))
        .when(c == as_long.cast("double"), as_long.cast("string"))
        .otherwise(c.cast("string"))
    )
