"""Join helpers (SURVEY.md §2.3, J1–J10).

Most reference joins are plain equi-joins Catalyst handles natively;
these helpers encode the join *strategy* decisions (broadcast the
dimension, semi/anti for membership) that matter at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from social_link_prediction_spark.operators.windows import epoch_us


def enrich(
    fact: DataFrame, dim: DataFrame, on: str | Sequence[str], broadcast_dim: bool = True
) -> DataFrame:
    """J1/J2/J3: left-join enrichment. Dimension side broadcast by
    default — at 100 TB the fact table must never shuffle for a lookup
    that fits in executor memory.
    """
    right = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(right, on=on, how="left")


def exists_in(df: DataFrame, other: DataFrame, on: Sequence[str]) -> DataFrame:
    """J8: membership probe = left semi join (no row multiplication,
    right side only ships join keys)."""
    return df.join(other, on=list(on), how="left_semi")


def not_exists_in(df: DataFrame, other: DataFrame, on: Sequence[str]) -> DataFrame:
    """J9: taboo filter = left anti join."""
    return df.join(other, on=list(on), how="left_anti")


def symmetric_exists(
    pairs: DataFrame,
    edges: DataFrame,
    pair_src: str,
    pair_dst: str,
    edge_src: str,
    edge_dst: str,
) -> DataFrame:
    """J8 symmetric case: does an edge exist in either orientation?
    Canonicalize both sides with least/greatest, then semi-join once —
    half the probes of the reference's forward+backward double lookup.
    """
    p = pairs.withColumn("__a", F.least(F.col(pair_src), F.col(pair_dst))).withColumn(
        "__b", F.greatest(F.col(pair_src), F.col(pair_dst))
    )
    e = edges.select(
        F.least(F.col(edge_src), F.col(edge_dst)).alias("__a"),
        F.greatest(F.col(edge_src), F.col(edge_dst)).alias("__b"),
    ).dropDuplicates()
    return p.join(e, on=["__a", "__b"], how="left_semi").drop("__a", "__b")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    tolerance_seconds: int | None = None,
    right_order: str | None = None,
    matched_ts: str | None = None,
) -> DataFrame:
    """Backward as-of join: for every left row, attach the single
    latest right row with ``right_ts <= left_ts`` on the same key
    (optionally within ``tolerance_seconds``). Rows with no match keep
    nulls (left-join semantics).

    Not in the reference (SURVEY §2.3 notes it has only equi-joins) —
    added as the temporal primitive a training-data/event pipeline
    needs (attribution, last-known-state lookup).

    Implemented as union + last-non-null carry-forward window: ONE
    shuffle on the key and a single sort, with state bounded by the
    window frame. This is the scale path — a range join explodes into
    per-pair probes, and a per-key merge in ``applyInPandas`` drags
    every row through Python. The right row's timestamp and payload
    travel in one struct so the carried values can never mix rows.

    Ties: a right row at exactly ``left_ts`` is visible (<=); among
    right rows sharing a timestamp the one with the greatest
    ``right_order`` wins (pass an id column for determinism).
    """
    keys = list(on)
    rstruct = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(p) for p in payload]
    )
    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        (F.col(right_order) if right_order else F.lit(0)).alias("__tie"),
        rstruct.alias("__r"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).alias("__tie"),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side", "__tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("__r", ignorenulls=True).over(w)
    out = u.withColumn("__c", carried).filter(F.col("__side") == 1)
    valid = F.col("__c").isNotNull()
    if tolerance_seconds is not None:
        valid = valid & (
            epoch_us(F.col("__c.__rts"))
            >= epoch_us(F.col("__ts")) - tolerance_seconds * 1_000_000
        )
    cols = [F.col(c) for c in left.columns]
    if matched_ts:
        cols.append(F.when(valid, F.col("__c.__rts")).alias(matched_ts))
    cols.extend(F.when(valid, F.col(f"__c.{p}")).alias(p) for p in payload)
    return out.select(*cols)


def bucketed_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: int = 3600,
    extra_on: Sequence[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join WITHOUT an equi key: decompose the time
    axis into fixed buckets, explode each interval to the buckets it
    covers, equi-join points on the bucket id, then apply the exact
    containment predicate.

    Turns what Catalyst would otherwise plan as a broadcast
    nested-loop / cartesian join into a plain shuffled hash join —
    the standard big-data interval-join trick (used by every
    spatial/temporal engine; cf. Spark's own range-join hints in
    Databricks runtime, absent in OSS). Fan-out is
    ``interval_width / bucket_seconds`` rows per interval, so pick a
    bucket near the median interval width.

    Each matched (point, interval) pair is produced exactly once — a
    point lives in exactly one bucket and an interval's bucket list
    never repeats — so no dedup pass is needed.
    """
    b = F.lit(bucket_seconds * 1_000_000)
    pb = points.withColumn("__bucket", (epoch_us(F.col(point_ts)) / b).cast("long"))
    ib = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (epoch_us(F.col(start_ts)) / b).cast("long"),
                (epoch_us(F.col(end_ts)) / b).cast("long"),
            )
        ),
    )
    on = ["__bucket", *(list(extra_on) if extra_on else [])]
    joined = pb.join(ib, on=on, how=how)
    return joined.filter(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts))
    ).drop("__bucket")
