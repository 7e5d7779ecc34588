"""Deterministic content-keyed sampling / splitting.

``df.sample`` is seed-and-partitioning dependent: the row set changes
under repartition, between engines, and between runs over re-generated
data. Corpus builds need the opposite — a sampling decision that is a
PURE FUNCTION of the key, so that:

  * train/val/test membership is reproducible anywhere (any engine
    that can md5 computes the identical set — the DuckDB oracle does),
  * co-sampling is consistent: sample a conversation and every table
    keyed by that conversation follows (join-closed samples),
  * resuming / backfilling never re-draws the sample.

Mechanism: the first 32 bits of ``md5(salt <SEP> key1 <SEP> key2 ...)``
as a uniform integer in [0, 2^32); keep iff it falls below
``rate * 2^32``; splits partition the same axis by cumulative weights.
``SEP`` is the ASCII unit separator ``\\x1f`` so that multi-key tuples
like ('ab','c') and ('a','bc') hash differently — any engine can
reproduce it (DuckDB: ``chr(31)``, Python: ``"\\x1f"``). Map-only, no
shuffle, JVM-side (md5 + conv are codegen expressions). ``salt``
decorrelates independent draws over the same keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_U32 = float(1 << 32)
# ASCII unit separator: makes the multi-key concatenation injective for
# keys that don't themselves contain \x1f (true for ids/numeric keys).
SEP = "\x1f"


def _hash_u32(key_cols: Sequence[Column | str], salt: str) -> Column:
    cols = [F.col(c) if isinstance(c, str) else c for c in key_cols]
    digest = F.md5(F.concat_ws(SEP, F.lit(salt), *[c.cast("string") for c in cols]))
    # first 8 hex chars → 32-bit uniform integer (conv returns string)
    return F.conv(F.substring(digest, 1, 8), 16, 10).cast("long")


def hash_sample(
    df: DataFrame,
    key_cols: str | Sequence[str],
    rate: float,
    salt: str = "",
) -> DataFrame:
    """Keep rows whose key hashes below ``rate`` (Bernoulli over keys).

    All rows sharing a key are kept or dropped TOGETHER; expected kept
    fraction of distinct keys = ``rate``.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    return df.where(_hash_u32(keys, salt) < int(rate * _U32))


def hash_split(
    df: DataFrame,
    key_cols: str | Sequence[str],
    weights: dict[str, float],
    out: str = "split",
    salt: str = "",
) -> DataFrame:
    """Assign every row a deterministic split label by key.

    ``weights``: label → fraction (must sum to ~1; the LAST label
    absorbs the remainder so rounding never drops a row). Insertion
    order fixes the cumulative boundaries — keep it stable across runs.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"weights must sum to 1 (got {total})")
    h = _hash_u32(keys, salt)
    labels = list(weights)
    expr: Column | None = None
    acc = 0.0
    for label in labels[:-1]:
        acc += weights[label]
        cond = h < int(acc * _U32)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    last = F.lit(labels[-1])
    return df.withColumn(out, last if expr is None else expr.otherwise(last))
