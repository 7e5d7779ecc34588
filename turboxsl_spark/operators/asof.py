"""Point-in-time as-of join — the engine's core operator.

Semantics come from the reference's ``preceding::`` axis (most recent
thing before me in document order, ``/root/reference/src/xpath.c:374-392``)
generalized to two tables: for each spine row at ``(key, ts)``, attach
the latest fact of the same key with ``fact.ts <= ts`` (inclusive) or
``fact.ts < ts`` (strict — mirrors ``preceding-sibling`` starting at
``original->prev``, i.e. excluding self-time).

Physical strategy (scale-first): the naive formulation is a theta join
(``spine × facts WHERE fact.ts <= spine.ts`` reduced by max) — a
blowup at 100 TB. Instead we UNION the two sides, sort once within
key-hashed partitions, and forward-fill fact columns with
``last(ignorenulls=True)`` over rows (-inf, 0]: one shuffle on the key,
one sort, zero row amplification, works for any spine/fact size ratio.
This is the sort-merge as-of pass the north rule names.

Tie handling via a union-side rank in the sort key:
  inclusive → facts sort BEFORE spine rows at equal ts (fact visible)
  strict    → facts sort AFTER  spine rows at equal ts (fact hidden)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    spine: DataFrame,
    facts: DataFrame,
    on: str | Sequence[str] = "conv_id",
    ts_col: str = "ts",
    value_cols: Sequence[str] | None = None,
    strict: bool = False,
    suffix: str = "_asof",
    fact_ts_out: str | None = "ts_fact_asof",
    fact_seq_col: str | None = None,
    tolerance_s: float | None = None,
) -> DataFrame:
    """Attach latest-preceding fact values to every spine row.

    Returns the spine with ``<value><suffix>`` columns (NULL when no
    fact precedes — the analogue of ``key()`` returning an empty
    nodeset) and optionally the matched fact timestamp.

    ``fact_seq_col`` (e.g. an event id) breaks ties among facts with
    identical timestamps deterministically: the highest wins.

    ``tolerance_s`` bounds the lookback (pd.merge_asof-style): a fact
    older than ``spine.ts - tolerance_s`` is treated as absent — stale
    features become NULL instead of silently ancient.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [c for c in facts.columns if c not in keys and c != ts_col]

    spine_cols = spine.columns
    # side rank: smaller sorts first at equal ts
    fact_rank = 0 if not strict else 1
    spine_rank = 1 - fact_rank

    seq = (
        F.col(fact_seq_col).cast("long")
        if fact_seq_col
        else F.lit(0).cast("long")
    )
    # The matched fact travels as ONE struct (ts + all value columns) so
    # forward-fill attaches the latest preceding fact row ATOMICALLY.
    # Filling each value column independently would, whenever the latest
    # fact holds a NULL in one column, silently pull that column from an
    # OLDER fact — mixing columns across fact rows and breaking
    # point-in-time semantics for nullable facts (pinned by
    # tests/test_asof.py::test_null_fact_values_fill_atomically).
    fact_struct_type = T.StructType(
        [T.StructField("_fts", facts.schema[ts_col].dataType)]
        + [T.StructField(f"_v_{c}", facts.schema[c].dataType) for c in value_cols]
    )
    f_side = facts.select(
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("_asof_ts"),
        F.lit(fact_rank).alias("_side"),
        seq.alias("_seq"),
        F.struct(
            F.col(ts_col).alias("_fts"),
            *[F.col(c).alias(f"_v_{c}") for c in value_cols],
        ).alias("_fact"),
        *[F.lit(None).cast(spine.schema[c].dataType).alias(f"_s_{c}") for c in spine_cols],
    )
    s_side = spine.select(
        *[F.col(k) for k in keys],
        F.col(ts_col).alias("_asof_ts"),
        F.lit(spine_rank).alias("_side"),
        F.lit(0).cast("long").alias("_seq"),
        F.lit(None).cast(fact_struct_type).alias("_fact"),
        *[F.col(c).alias(f"_s_{c}") for c in spine_cols],
    )

    unioned = f_side.unionByName(s_side)
    w = (
        Window.partitionBy(*keys)
        .orderBy("_asof_ts", "_side", "_seq")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "*", F.last("_fact", ignorenulls=True).over(w).alias("_ff")
    )
    ff_ts = F.col("_ff._fts")
    if tolerance_s is not None:
        # freshness judged on the matched fact's own timestamp — the
        # same struct the values come from, so a stale fact nulls out
        # values AND timestamp together
        fresh = F.unix_micros(ff_ts.cast("timestamp")) >= (
            F.unix_micros(F.col("_asof_ts").cast("timestamp"))
            - F.lit(int(tolerance_s * 1_000_000))
        )
        val = lambda c: F.when(fresh, F.col(f"_ff._v_{c}"))
        ts_val = F.when(fresh, ff_ts)
    else:
        val = lambda c: F.col(f"_ff._v_{c}")
        ts_val = ff_ts
    out = filled.where(F.col("_side") == spine_rank).select(
        *[F.col(f"_s_{c}").alias(c) for c in spine_cols],
        *[val(c).alias(f"{c}{suffix}") for c in value_cols],
        *([ts_val.alias(fact_ts_out)] if fact_ts_out else []),
    )
    return out
