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
key-hashed partitions, and forward-fill ONE struct holding the entire
matched fact row with ``last(ignorenulls=True)`` over rows (-inf, 0]:
one shuffle on the key, one sort, zero row amplification, works for
any spine/fact size ratio. This is the sort-merge as-of pass the north
rule names.

The fact travels as one struct (ts + all value columns) so the fill is
ATOMIC: a NULL inside the latest fact surfaces as NULL instead of
silently borrowing that column from an older fact.

Tie handling via a union-side rank in the sort key:
  inclusive → facts sort BEFORE spine rows at equal ts (fact visible)
  strict    → facts sort AFTER  spine rows at equal ts (fact hidden)

``asof_join_salted`` is the skew-safe variant: a mega-key (the
reference's work-stealing scenario, ``src/unbounded_queue.c:101-128``,
transposed to a 10^9-turn conversation) collapses the plain form to one
task; time-bucket salting bounds every partition and merges carry-in
facts across buckets in a second, tiny phase.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _fact_struct_type(
    spine: DataFrame, facts: DataFrame, ts_col: str, value_cols: Sequence[str]
) -> T.StructType:
    return T.StructType(
        [T.StructField("_fts", facts.schema[ts_col].dataType)]
        + [T.StructField(f"_v_{c}", facts.schema[c].dataType) for c in value_cols]
    )


def _union_sides(
    spine: DataFrame,
    facts: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    strict: bool,
    fact_seq_col: str | None,
    direction: str = "backward",
) -> tuple[DataFrame, list[str], int]:
    """Tag + union both sides; the matched fact rides ONE struct column.

    Returns (unioned, spine_cols, spine_rank).
    """
    spine_cols = spine.columns
    # side rank: smaller sorts first at equal ts. Backward looks at the
    # frame (-inf, current]: an equal-ts fact is VISIBLE iff it sorts
    # before the spine row. Forward looks at [current, +inf): an
    # equal-ts fact is visible iff it sorts AFTER the spine row — so
    # the strictness→rank mapping flips with direction.
    if direction == "backward":
        fact_rank = 0 if not strict else 1
    else:
        fact_rank = 1 if not strict else 0
    spine_rank = 1 - fact_rank
    seq = (
        F.col(fact_seq_col).cast("long") if fact_seq_col else F.lit(0).cast("long")
    )
    struct_type = _fact_struct_type(spine, facts, ts_col, value_cols)
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
        F.lit(None).cast(struct_type).alias("_fact"),
        *[F.col(c).alias(f"_s_{c}") for c in spine_cols],
    )
    return f_side.unionByName(s_side), spine_cols, spine_rank


def _project_out(
    filled: DataFrame,
    spine_cols: Sequence[str],
    spine_rank: int,
    value_cols: Sequence[str],
    suffix: str,
    fact_ts_out: str | None,
    tolerance_s: float | None,
    fill_col: str = "_ff",
    direction: str = "backward",
) -> DataFrame:
    ff_ts = F.col(f"{fill_col}._fts")
    if tolerance_s is not None:
        # freshness judged on the matched fact's own timestamp — the
        # same struct the values come from, so a stale fact nulls out
        # values AND timestamp together
        tol = F.lit(int(tolerance_s * 1_000_000))
        spine_us = F.unix_micros(F.col("_asof_ts").cast("timestamp"))
        fact_us = F.unix_micros(ff_ts.cast("timestamp"))
        if direction == "backward":
            fresh = fact_us >= spine_us - tol
        else:
            fresh = fact_us <= spine_us + tol
        val = lambda c: F.when(fresh, F.col(f"{fill_col}._v_{c}"))
        ts_val = F.when(fresh, ff_ts)
    else:
        val = lambda c: F.col(f"{fill_col}._v_{c}")
        ts_val = ff_ts
    return filled.where(F.col("_side") == spine_rank).select(
        *[F.col(f"_s_{c}").alias(c) for c in spine_cols],
        *[val(c).alias(f"{c}{suffix}") for c in value_cols],
        *([ts_val.alias(fact_ts_out)] if fact_ts_out else []),
    )


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
    direction: str = "backward",
) -> DataFrame:
    """Attach the latest-preceding (or, with ``direction="forward"``,
    earliest-following) fact values to every spine row.

    ``backward`` is the ``preceding::`` axis (latest fact at/before the
    spine ts); ``forward`` is ``following::`` (reference
    ``src/xpath.c:409-428``): the EARLIEST fact at/after the spine ts —
    same single-sort union plan with the frame reversed
    (``first(ignorenulls) over [current, +inf)``). Forward features are
    non-PIT by nature (they look into the future); callers own the
    leakage discipline exactly as with ``lead``/``_future`` columns.

    Returns the spine with ``<value><suffix>`` columns (NULL when no
    fact matches — the analogue of ``key()`` returning an empty
    nodeset) and optionally the matched fact timestamp.

    ``fact_seq_col`` (e.g. an event id) breaks ties among facts with
    identical timestamps deterministically: backward picks the highest,
    forward the lowest.

    ``tolerance_s`` bounds the lookback/lookahead (pd.merge_asof-style):
    a fact farther than ``tolerance_s`` from the spine ts is treated as
    absent — stale features become NULL instead of silently ancient.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [c for c in facts.columns if c not in keys and c != ts_col]

    unioned, spine_cols, spine_rank = _union_sides(
        spine, facts, keys, ts_col, value_cols, strict, fact_seq_col, direction
    )
    ordered = Window.partitionBy(*keys).orderBy("_asof_ts", "_side", "_seq")
    if direction == "backward":
        w = ordered.rowsBetween(Window.unboundedPreceding, 0)
        fill = F.last("_fact", ignorenulls=True).over(w)
    else:
        w = ordered.rowsBetween(0, Window.unboundedFollowing)
        fill = F.first("_fact", ignorenulls=True).over(w)
    filled = unioned.select("*", fill.alias("_ff"))
    return _project_out(
        filled,
        spine_cols,
        spine_rank,
        value_cols,
        suffix,
        fact_ts_out,
        tolerance_s,
        direction=direction,
    )


def asof_join_salted(
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
    chunk_s: float = 86400.0,
    direction: str = "backward",
) -> DataFrame:
    """Skew-safe as-of join: time-bucket salted two-phase merge.

    The plain form puts a whole key in one task; a mega-conversation
    then dominates the stage. Salting by time bucket
    ``floor(unix_micros(ts) / chunk_s)`` bounds each partition:

      phase 1: the union+window as-of runs LOCALLY within
               ``(key, bucket)`` — bounded partitions;
      phase 2: each bucket's LAST fact struct (``max_by`` over the
               bucket's facts — atomic, whole row) is forward-filled
               along the per-key bucket axis (one row per bucket —
               tiny), giving every bucket the carry-in fact of all
               previous buckets; rows whose local fill is NULL take
               the carry. With ``direction="forward"`` the axes flip:
               each bucket's FIRST fact (``min_by``) is back-filled
               from FOLLOWING buckets, the local window looks ahead.

    Tie semantics stay exact: a carried fact comes from a strictly
    earlier (backward) / later (forward) bucket, so the
    strict/inclusive distinction only matters at equal timestamps,
    which always share a bucket and are resolved by phase 1's
    ``(ts, side, seq)`` order. Salt-invariance vs the plain operator is
    property-tested in tests/test_asof.py and oracle-checked by the
    driver's ``asof_salted`` / ``asof_salted_fwd`` queries against the
    SAME SQL as ``asof_join`` / ``asof_forward``.

    NULL keys / NULL ts: phase 2's equi-join is NULL-SAFE (``<=>``),
    so NULL-keyed or NULL-ts rows survive with the same NULL-group
    window semantics as the plain operator (salt invariance holds on
    them too — tested).

    ``chunk_s`` sets the skew bound: rows per task ≤ rows per
    ``(key, chunk_s)`` window. Pick it from the key's peak event rate
    (e.g. 1 day at 10^4 turns/day ≈ 10^4-row partitions).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [c for c in facts.columns if c not in keys and c != ts_col]

    unioned, spine_cols, spine_rank = _union_sides(
        spine, facts, keys, ts_col, value_cols, strict, fact_seq_col, direction
    )
    chunk_us = int(chunk_s * 1_000_000)
    unioned = unioned.withColumn(
        "_bucket",
        F.floor(
            F.unix_micros(F.col("_asof_ts").cast("timestamp")) / F.lit(chunk_us)
        ).cast("long"),
    )

    backward = direction == "backward"
    # phase 1: local as-of within (key, bucket)
    ordered_local = Window.partitionBy(*keys, "_bucket").orderBy(
        "_asof_ts", "_side", "_seq"
    )
    if backward:
        w_local = ordered_local.rowsBetween(Window.unboundedPreceding, 0)
        fill_local = F.last("_fact", ignorenulls=True).over(w_local)
    else:
        w_local = ordered_local.rowsBetween(0, Window.unboundedFollowing)
        fill_local = F.first("_fact", ignorenulls=True).over(w_local)
    local = unioned.withColumn("_ff_local", fill_local)

    # phase 2: carry-in = last fact of any PREVIOUS bucket (backward)
    # or first fact of any FOLLOWING bucket (forward).
    # bucket spine = every (key, bucket) present; buckets with facts
    # contribute their edge fact struct via max_by/min_by (atomic pick).
    pick = F.max_by if backward else F.min_by
    bucket_edge = (
        unioned.groupBy(*keys, "_bucket")
        .agg(
            pick(
                "_fact", F.when(F.col("_fact").isNotNull(), F.struct("_asof_ts", "_seq"))
            ).alias("_bucket_fact")
        )
    )
    ordered_carry = Window.partitionBy(*keys).orderBy("_bucket")
    if backward:
        w_carry = ordered_carry.rowsBetween(Window.unboundedPreceding, -1)
        fill_carry = F.last("_bucket_fact", ignorenulls=True).over(w_carry)
    else:
        w_carry = ordered_carry.rowsBetween(1, Window.unboundedFollowing)
        fill_carry = F.first("_bucket_fact", ignorenulls=True).over(w_carry)
    carry = bucket_edge.withColumn("_carry", fill_carry).select(
        *[F.col(k).alias(f"_ck_{k}") for k in keys],
        F.col("_bucket").alias("_ck_bucket"),
        "_carry",
    )

    # NULL-SAFE equi-join (still a hash/sort-merge equi-join in Spark):
    # a plain inner join on [*keys, _bucket] would DROP rows whose key
    # or ts is NULL, breaking salt invariance vs the plain operator,
    # which keeps them (window partitioning groups NULLs).
    cond = F.col("_bucket").eqNullSafe(F.col("_ck_bucket"))
    for k in keys:
        cond = cond & F.col(k).eqNullSafe(F.col(f"_ck_{k}"))
    filled = (
        local.join(carry, cond)
        .drop("_ck_bucket", *[f"_ck_{k}" for k in keys])
        .withColumn("_ff", F.coalesce("_ff_local", "_carry"))
    )
    return _project_out(
        filled,
        spine_cols,
        spine_rank,
        value_cols,
        suffix,
        fact_ts_out,
        tolerance_s,
        direction=direction,
    )
