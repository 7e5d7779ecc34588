"""Distributed global rank / total-order sort — no single-task window.

``xsl:sort`` demands a deterministic total order over the whole output
(SURVEY.md §2.7; reference ``src/transform.c`` sort handling). The
naive Spark spelling — ``row_number() OVER (ORDER BY ...)`` with no
``partitionBy`` — moves EVERY row through one task (Spark logs the
"No Partition Defined" warning): correct at sf0.1, a single-task wall
at 100 TB. This module is the two-phase form:

  1. ``repartitionByRange(P, keys)`` — ONE range exchange (Spark
     samples boundaries); each partition holds a contiguous key range;
  2. per-partition sort + ``row_number`` within ``spark_partition_id()``
     — parallel, partition sizes balanced by the range partitioner;
  3. per-partition row counts — a P-row aggregate collected to the
     driver (bounded by the PARTITION COUNT, never by the data; the
     same order of driver traffic as the range sampling itself) —
     become cumulative offsets, broadcast back and added to the local
     row numbers.

Cost: two passes over the ranked table (count job + rank job), both
fully parallel — the range-partitioned table is WRITTEN ONCE to a
scratch parquet (with its partition id embedded as a column) and read
twice. No executor-memory persist: at 100 TB a MEMORY_AND_DISK cache
of the whole table would squat on executor storage for the session
lifetime; a scratch write is linear, spill-free, and freed by the
caller when the ranked output has been materialized. The count pass
scans ONLY the embedded pid column (parquet column pruning), so the
second pass is nearly free.

The order spec MUST be total (include a unique tiebreak column):
equal keys may straddle a range boundary, so without a tiebreak the
assignment of equal rows to ranks would be nondeterministic. Every
caller in this repo ranks on (..., unique_id). Embedding the pid at
write time (not recomputing it per job) is what makes the two passes
agree even though range boundaries are SAMPLED per exchange.
"""

from __future__ import annotations

import math
import shutil
import tempfile
import uuid
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType


def cleanup_scratch(path: str, spark=None) -> None:
    """Remove a scratch directory produced by ``global_rank`` (call
    after the ranked output has been materialized/written).

    Local paths are removed directly. Remote scratch (s3://, hdfs://
    — the ``spark.turboxsl.scratchDir`` cluster path) is deleted
    through the Hadoop FileSystem API when a ``spark`` session is
    passed; WITHOUT one it is left to the storage layer's
    lifecycle/TTL rules (there is no portable way to reach remote
    storage from the driver outside the session)."""
    if "://" in path and not path.startswith("file://"):
        if spark is None:
            return
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        fs.delete(hpath, True)
        return
    shutil.rmtree(path.removeprefix("file://"), ignore_errors=True)


SCRATCH_CONF = "spark.turboxsl.scratchDir"


def _default_scratch(spark, prefix: str) -> str:
    """Resolve a scratch location every EXECUTOR can reach.

    Priority: the ``spark.turboxsl.scratchDir`` conf (point it at
    HDFS/S3/shared-FS scratch on a cluster) → a driver-local temp dir,
    which is only valid when the executors ARE the driver process
    (local[...] master). On any other master with no conf set this
    RAISES at plan-build time — a driver-local default would let each
    executor silently write to its own filesystem and drop partitions.
    """
    base = spark.conf.get(SCRATCH_CONF, None)
    if base:
        return f"{base.rstrip('/')}/{prefix}{uuid.uuid4().hex}"
    master = spark.conf.get("spark.master", "")
    if not master.startswith("local"):
        raise ValueError(
            f"global_rank scratch on master {master!r}: executors cannot "
            f"read the driver's temp dir — pass scratch_dir= or set "
            f"{SCRATCH_CONF} to a cluster-visible path (HDFS/S3/NFS)"
        )
    return tempfile.mkdtemp(prefix=prefix)


def global_rank(
    df: DataFrame,
    order: Sequence[Column],
    out: str = "rank",
    num_partitions: int | None = None,
    scratch_dir: str | None = None,
    materialize: str = "scratch",
) -> DataFrame:
    """Add a 1-based global ``row_number`` under a total order.

    ``order``: sort expressions (``F.col(...).asc()/.desc()``), used for
    both the range partitioning and the in-partition sort; must include
    a unique tiebreak. Returns ``df`` plus the ``out`` long column.

    ``materialize="scratch"`` (default, the unbounded-input path):
    write-once-read-twice via parquet. ``scratch_dir`` is where the
    intermediate lands; when omitted it resolves via
    ``spark.turboxsl.scratchDir`` (set it to HDFS/S3/shared-FS scratch
    on a cluster), falls back to a local temp dir ONLY under a
    local[...] master, and raises otherwise (executors on other nodes
    cannot read the driver's /tmp). The returned DataFrame READS from
    it lazily; free it with ``cleanup_scratch`` once the ranked output
    is materialized.

    ``materialize="memory"``: a Spark cache instead — ONLY for inputs
    already bounded by construction (``global_topk`` ranks ≤ k rows);
    never hand an unbounded table to this mode.
    """
    ranked, _ = _global_rank_counted(
        df, order, out, num_partitions, scratch_dir, materialize
    )
    return ranked


def _global_rank_counted(
    df: DataFrame,
    order: Sequence[Column],
    out: str = "rank",
    num_partitions: int | None = None,
    scratch_dir: str | None = None,
    materialize: str = "scratch",
) -> tuple[DataFrame, int]:
    """``global_rank`` plus the TOTAL row count as a by-product.

    The rank already collects per-partition counts to build the offset
    table; their sum IS n. Exposing it lets ``exact_quantiles`` skip a
    whole separate ``count()`` pass over the ranked column (VERDICT r04
    item 3) — at 100 TB that is a full extra scan saved.
    """
    spark = df.sparkSession
    order = list(order)
    # no explicit partition count → AQE sizes the range exchange to the
    # DATA (coalesces a 2k-row rank to a few partitions, spreads a
    # 10^12-row one wide); pass num_partitions only to pin a layout
    ranged = (
        df.repartitionByRange(num_partitions, *order)
        if num_partitions is not None
        else df.repartitionByRange(*order)
    ).withColumn("_gr_pid", F.spark_partition_id())
    if materialize == "memory":
        # localCheckpoint (not .cache()): RDD-backed, so the storage is
        # freed by the ContextCleaner when the DataFrame is dropped —
        # repeated calls can't accumulate session-lifetime cache entries
        part = ranged.localCheckpoint(eager=True)
    else:
        if scratch_dir is None:
            scratch_dir = _default_scratch(spark, "turboxsl_global_rank_")
        # ONE range exchange, written once; both jobs below read this —
        # partition ids are frozen in the data, immune to resample drift
        ranged.write.mode("overwrite").parquet(scratch_dir)
        # explicit schema: an EMPTY input writes no part files, and a
        # schema-inferring read of the bare directory would throw
        part = spark.read.schema(ranged.schema).parquet(scratch_dir)
    counts = part.groupBy("_gr_pid").count().collect()
    acc = 0
    offset_rows = []
    for r in sorted(counts, key=lambda r: r["_gr_pid"]):
        offset_rows.append((r["_gr_pid"], acc))
        acc += r["count"]
    if not offset_rows:
        return df.withColumn(out, F.lit(None).cast("long")).where(F.lit(False)), 0
    offsets = spark.createDataFrame(offset_rows, "_gr_pid int, _gr_off long")
    w = Window.partitionBy("_gr_pid").orderBy(*order)
    ranked = (
        part.withColumn("_gr_lrn", F.row_number().over(w))
        .join(F.broadcast(offsets), "_gr_pid")
        .withColumn(out, (F.col("_gr_lrn") + F.col("_gr_off")).cast("long"))
        .drop("_gr_pid", "_gr_lrn", "_gr_off")
    )
    return ranked, acc


def exact_quantiles(
    df: DataFrame,
    value: Column | str,
    qs: Sequence[float],
    tiebreak: Sequence[Column | str] = (),
    scratch_dir: str | None = None,
) -> DataFrame:
    """EXACT discrete quantiles (percentile_disc semantics) of a column,
    distributed — returns ``(q double, value)`` with one row per q.

    quantile_disc(q) = the value at 1-based sorted position
    ``max(1, ceil(q*n))`` — the smallest value whose cumulative
    fraction is ≥ q. ``approx_percentile`` trades error bounds for one
    pass; this is the exact complement for when the number matters
    (pricing cutoffs, SLO reporting), built on the same scale-safe
    two-phase ``global_rank`` (range exchange + local row_number +
    broadcast offsets — never a single-task window). ``tiebreak``
    columns only disambiguate WHICH duplicate row holds a rank; the
    VALUE at each position is order-independent, so any unique
    tiebreak yields the same result.

    The result is materialized eagerly (bounded by ``len(qs)`` rows —
    a driver collect of quantile values, not data) so the underlying
    rank's scratch parquet is freed before returning; pass
    ``scratch_dir`` to control where the intermediate lands (shared
    storage on a cluster) — a caller-provided dir is NOT deleted.
    """
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile must be in [0, 1], got {q}")
    spark = df.sparkSession
    v = F.col(value) if isinstance(value, str) else value
    slim = df.select(
        v.alias("_q_v"), *[F.col(c) if isinstance(c, str) else c for c in tiebreak]
    )
    order = [F.col("_q_v").asc()] + [
        (F.col(c) if isinstance(c, str) else c).asc() for c in tiebreak
    ]
    own_scratch = scratch_dir is None
    if own_scratch:
        scratch_dir = _default_scratch(spark, "turboxsl_quantiles_")
    try:
        # rank FIRST: the rank's own offset pass already sums the
        # per-partition counts, so n falls out for free — no separate
        # slim.count() scan (that was a whole extra pass at scale)
        ranked, n = _global_rank_counted(
            slim, order, out="_q_rank", scratch_dir=scratch_dir
        )
        if n == 0:
            return spark.createDataFrame(
                [],
                StructType(
                    [
                        StructField("q", DoubleType()),
                        StructField("value", slim.schema["_q_v"].dataType),
                    ]
                ),
            )
        targets = [(float(q), _ceil_rank(q, n)) for q in qs]
        tdf = spark.createDataFrame(targets, "q double, _q_r long")
        # the result is bounded by len(qs) — materialize it eagerly so
        # the rank's scratch parquet can be freed HERE instead of
        # leaking until some later action
        # sort the ≤len(qs) result rows on the DRIVER: a DataFrame
        # orderBy here would add a range exchange (plus its boundary
        # sampling pass over the rank join) to order a handful of rows
        rows = sorted(
            ranked.join(F.broadcast(tdf), ranked["_q_rank"] == tdf["_q_r"])
            .select("q", F.col("_q_v").alias("value"))
            .collect(),
            key=lambda r: r["q"],
        )
    finally:
        if own_scratch:
            cleanup_scratch(scratch_dir, spark)
    out_schema = StructType(
        [
            StructField("q", DoubleType()),
            StructField("value", slim.schema["_q_v"].dataType),
        ]
    )
    return spark.createDataFrame(rows, out_schema)


def _ceil_rank(q: float, n: int) -> int:
    return max(1, math.ceil(q * n))


def global_topk(
    df: DataFrame,
    order: Sequence[Column],
    k: int,
    out: str = "rank",
) -> DataFrame:
    """Top-k rows under a total order, with 1-based ranks attached.

    Phase 1 is Spark's own distributed limit (``TakeOrderedAndProject``:
    each partition keeps its local top-k, the driver MERGES k·P rows —
    never a full global sort, never a single-task window). Phase 2
    attaches ranks to those ≤k rows ON THE DRIVER: the limit already
    delivers them there in sorted order, so enumerating them is free
    and bounded by k — the previous distributed phase 2
    (checkpoint + offset job + window) spent ~4 extra Spark jobs
    re-ranking rows the driver had just merged (r06, guide §1.2).
    """
    spark = df.sparkSession
    rows = df.orderBy(*order).limit(k).collect()  # ≤ k rows, sorted
    schema = df.schema.add(StructField(out, LongType(), True))
    ranked = [(*r, i + 1) for i, r in enumerate(rows)]
    return spark.createDataFrame(ranked, schema)


def caseorder_keys(
    col: Column | str,
    case_order: str | None = None,
    descending: bool = False,
) -> list[Column]:
    """Sort expressions for one case-insensitive ``xsl:sort`` key with
    the XSLT 1.0 ``case-order`` attribute.

    The reference PARSES ``case-order="lower-first"`` into
    ``XML_FLAG_LOWER`` (/root/reference/src/transform.c:358-360) but
    its comparator never reads the flag — it always runs plain
    ``xml_strcasecmp`` (/root/reference/src/xpath.c:546), so ties
    between case variants come out in input order. This helper
    implements the attribute's DOCUMENTED semantics (a superset of the
    reference): primary key = ``lower(col)``; when ``case_order`` is
    given, a whole-string tiebreak on the raw column orders
    case-insensitive ties.

    Why the tiebreak works: two strings tied on ``lower()`` differ only
    by letter case position-wise, and ASCII lowercase = uppercase + 32,
    so descending byte order prefers the lowercase variant at the first
    differing position — exactly per-character lower-first. (Strictly
    ASCII reasoning; non-ASCII case pairs whose code-point order
    differs may tie-order differently.) ``order="descending"``
    reverses the WHOLE comparator, tiebreak included, matching XSLT.

    Splice the returned list into a ``global_rank``/``orderBy`` spec;
    follow it with a unique tiebreak column for a total order.
    """
    c = F.col(col) if isinstance(col, str) else col
    primary = F.lower(c)
    keys = [primary.desc() if descending else primary.asc()]
    if case_order is not None:
        if case_order not in ("lower-first", "upper-first"):
            raise ValueError(
                f"case-order must be 'lower-first' or 'upper-first', got {case_order!r}"
            )
        tie_desc = (case_order == "lower-first") != descending
        keys.append(c.desc() if tie_desc else c.asc())
    return keys
