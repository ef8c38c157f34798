"""Window / ranking / top-k operators (SURVEY.md §2.5, W1–W7)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def epoch_us(col: Column) -> Column:
    """Microseconds since 1970-01-01 00:00:00 of an NTZ wall-clock,
    computed without any timezone: pure NTZ difference arithmetic.
    (The previous ``unix_micros(cast('timestamp'))`` re-interpreted the
    wall-clock in the session zone — a fixed offset cancels in gap
    differences, but a DST transition between two events shifts their
    gap by an hour, so sessionization boundaries depended on
    ``spark.sql.session.timeZone``.) Equals UTC ``unix_micros`` for the
    fixtures, under every session timezone."""
    return F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        # no-op for NTZ input (the fixture path); for LTZ input (tests
        # building frames from naive datetimes) this reads the session
        # wall-clock, preserving the old cast semantics.
        col.cast("timestamp_ntz"),
    )


# --- W1: contiguous per-group index (transformer.py:173)
def per_group_index(
    df: DataFrame, group: str, order: Sequence[str], out: str = "pyg_id"
) -> DataFrame:
    """``groupby(type).cumcount()`` — dense 0..n-1 per group. Needs an
    explicit order (pandas uses row order, which Spark doesn't have);
    the reference's downstream only requires density + determinism.
    """
    w = Window.partitionBy(group).orderBy(*[F.col(c).asc() for c in order])
    return df.withColumn(out, F.row_number().over(w) - F.lit(1))


# --- W2: global top-k (NB cells 95,97,100)
def top_k(df: DataFrame, order_col: str, k: int = 10, tiebreak: Sequence[str] = ()) -> DataFrame:
    """``orderBy(desc).limit(k)`` — Spark plans TakeOrderedAndProject:
    each task keeps a k-heap, the driver merges k*numPartitions rows.
    No full sort at any scale.
    """
    order = [F.col(order_col).desc()] + [F.col(c).asc() for c in tiebreak]
    return df.orderBy(*order).limit(k)


# --- W3: per-group top-k (predicter.py:229-291 shape)
def top_k_per_group(
    df: DataFrame,
    group: str | Sequence[str],
    order_col: str,
    k: int,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    groups = [group] if isinstance(group, str) else list(group)
    order = [F.col(order_col).desc()] + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(*groups).orderBy(*order)
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .drop("__rank")
    )


# --- corpus-frame global row numbering (VERDICT r7 item 2)
def global_row_number(
    df: DataFrame,
    order_col: str | Column | Sequence[str | Column],
    out: str = "__rn",
    n_parts: int | None = None,
) -> tuple[DataFrame, int]:
    """1-based dense global row number ordered by ``order_col``,
    WITHOUT a single-task global sort — the 100 TB replacement for
    ``row_number() OVER (ORDER BY x)`` on frames that grow with the
    corpus. The ml/linksplit.py:116 device, generalized: one
    ``repartitionByRange`` shuffle on the order column (ranges are
    contiguous and ordered across partition ids), a per-partition
    ``row_number`` window (parallel, bounded by the partition), then
    the P partition counts — P tiny rows — collect to the driver and
    rejoin as a literal offset map. Output is identical to the global
    window for every ``n_parts`` because within-partition order plus
    range-contiguous partitions equals global order. ``order_col``
    values (the full key tuple when a sequence is passed) must be
    unique for per-row rank IDENTITY — the same contract the global
    window callers already carry. Tied keys are still safe for
    rank-based VALUE selection (medians, quantile cutpoints, CDF
    thresholds): RangePartitioner assigns equal keys to one
    partition, so ties form one contiguous rank block and the value
    at any rank is deterministic — only WHICH tied row carries WHICH
    rank within the block is not (interarrival_burstiness_users
    relies on this blessing).

    ``n_parts`` defaults to the session's ``defaultParallelism``
    (floor 32): the offset map stays P tiny driver rows either way,
    and a corpus-sized frame must spread across the cluster's
    actual slot count — a fixed 32-partition ranged shuffle would
    itself be the bottleneck at 100 TB.

    Returns ``(frame + out column, total row count)``; the count rides
    along free from the offset collect (callers like exact ntile need
    n anyway, and this avoids a second job).

    Storage note: the eager checkpoint's blocks are retained until the
    returned frame becomes unreachable (Spark's ContextCleaner frees
    checkpointed RDD blocks on GC); a long-lived session sweeping
    hundreds of queries reclaims them between queries, so retention is
    bounded by the live query, not the session.
    """
    if n_parts is None:
        n_parts = max(df.sparkSession.sparkContext.defaultParallelism, 32)
    raw = (
        [order_col]
        if isinstance(order_col, (str, Column))
        else list(order_col)
    )
    # str -> asc column; Column passes through (incl. .desc() sort
    # orders — repartitionByRange places partition 0 on the FIRST
    # range of the given sort order, so the offset arithmetic is
    # direction-agnostic).
    order_cols = [F.col(c) if isinstance(c, str) else c for c in raw]
    # EAGER localCheckpoint: repartitionByRange picks its range
    # boundaries from a reservoir SAMPLE of its input, and that sample
    # is not stable across re-executions of the same plan — the
    # counts collect below and the window scan would otherwise
    # evaluate the shuffle TWICE and can land rows in different
    # partitions than the offsets were computed from (caught by the
    # r8 sf0.1 sweep: duplicate/missing row numbers). Checkpointing
    # pins ONE materialized partitioning for both consumers and
    # fails loudly (instead of silently renumbering) if storage is
    # lost.
    ranged = (
        df.repartitionByRange(n_parts, *order_cols)
        .withColumn("__gp", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    within = ranged.withColumn(
        "__grn",
        F.row_number().over(Window.partitionBy("__gp").orderBy(*order_cols)),
    )
    part_counts = sorted(
        (r["__gp"], r["cnt"])
        for r in ranged.groupBy("__gp").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offsets, acc = {}, 0
    for p, cnt in part_counts:
        offsets[p] = acc
        acc += cnt
    offset_map = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    return (
        within.withColumn(
            out, (offset_map[F.col("__gp")] + F.col("__grn")).cast("long")
        ).drop("__gp", "__grn"),
        acc,
    )


def exact_ntile(rn: Column, n: int, k: int) -> Column:
    """SQL ``ntile(k)`` over a precomputed 1-based global row number
    ``rn`` of an ``n``-row frame: the first ``n % k`` buckets take
    ``n // k + 1`` rows, the rest ``n // k`` — bit-identical to the
    window function, but composable with :func:`global_row_number`
    so corpus-sized frames never pay the single-task sort."""
    size_small, n_big = divmod(n, k)
    size_big = size_small + 1
    cutoff = n_big * size_big
    return F.when(
        F.lit(n_big > 0) & (rn <= F.lit(cutoff)),
        F.ceil(rn / F.lit(size_big)),
    ).otherwise(
        F.lit(n_big) + F.ceil((rn - F.lit(cutoff)) / F.lit(max(size_small, 1)))
    ).cast("long")


# --- W5: cumulative sum (NB cell 87) — see aggregates.degree_distribution
def cumulative_sum(
    df: DataFrame, order: str, value: str, out: str = "cumsum", exclusive: bool = False
) -> DataFrame:
    upper = -1 if exclusive else Window.currentRow
    w = Window.orderBy(order).rowsBetween(Window.unboundedPreceding, upper)
    return df.withColumn(out, F.coalesce(F.sum(value).over(w), F.lit(0.0)))


# --- W6: sortedness verification (train_model.py:497-561)
def is_sorted(df: DataFrame, cols: Sequence[str]) -> bool:
    """Property check: rows (in current order within a struct sort key)
    are lexicographically non-decreasing. Implemented as a lag-window
    comparison — returns True iff no inversions exist.
    """
    key = F.struct(*[F.col(c) for c in cols])
    w = Window.orderBy(F.monotonically_increasing_id())
    inversions = (
        df.withColumn("__key", key)
        .withColumn("__prev", F.lag("__key").over(w))
        .filter(F.col("__prev").isNotNull() & (F.col("__key") < F.col("__prev")))
        .limit(1)
        .count()
    )
    return inversions == 0


def sortedness_audit(
    df: DataFrame,
    part_cols: Sequence[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """W6 distributed form: within each partition key, is ``value_col``
    non-decreasing when ordered by ``order_col``? One lag window, one
    aggregation; returns a 1-row (n_rows, n_violations, is_sorted)
    audit frame (the reference's is_edge_index_sorted property check,
    train_model.py:497-561, as a scalable query)."""
    w = Window.partitionBy(*part_cols).orderBy(order_col)
    viol = F.when(
        F.col(value_col) >= F.lag(value_col).over(w), F.lit(0)
    ).otherwise(F.lit(1))
    seq = df.select(F.coalesce(viol, F.lit(0)).alias("viol"))
    return seq.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("viol").alias("n_violations"),
        (F.sum("viol") == 0).alias("is_sorted"),
    )


# --- lag/lead sessionization (events table; streaming-adjacent batch op)
def sessionize(
    df: DataFrame,
    user: str,
    ts: str,
    gap_seconds: int = 1800,
    out: str = "session_id",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Assign session ids: a new session starts when the gap to the
    previous event of the same user exceeds ``gap_seconds``. One
    shuffle (partitionBy user), then two windows over it. ``tiebreak``
    columns make the within-user order deterministic when two events
    share a timestamp (same-ts events always share a session, but the
    lag/cumsum pair needs a stable order to be reproducible).
    """
    w = Window.partitionBy(user).orderBy(ts, *tiebreak)
    # microsecond precision: second-level casts would mis-bucket gaps
    # that straddle the threshold by a fraction of a second
    us = epoch_us(F.col(ts))
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), F.lit(1)).otherwise(F.lit(0))
    return df.withColumn("__new", is_new).withColumn(
        out, F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    ).drop("__new")
