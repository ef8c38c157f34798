"""Warehouse layout: bucketed tables and co-located (shuffle-free)
joins.

The reference keeps its whole graph in RAM and re-joins by rebuilding
Python dicts per run (transformer.py:287-317 id->index maps). At
100 TB the equivalent is a PHYSICAL layout decision: big tables that
are repeatedly joined or aggregated on the same key (edges by src,
nodes by id, lineitem by orderkey) are written ONCE as bucketed
parquet, after which every equi-join / groupBy on the bucket key runs
with NO Exchange — the per-bucket files are read by matching tasks.

Bucketing beats `repartition()` because it survives the session: the
shuffle is paid at write time, not per query. Pick bucket counts so
one bucket ≈ 100-200 MB at the target scale (100 TB / 128 MB ≈ 800k
buckets is too many files — bucket the TABLE at e.g. 4096 and rely on
maxPartitionBytes splitting within buckets for scan parallelism).
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: str | Sequence[str],
    n_buckets: int,
    sort_cols: str | Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) parquet
    table in the session catalog. Sorting within buckets additionally
    removes the per-task Sort from sort-merge joins on the key.
    """
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    if mode == "overwrite":
        # a previous session's managed-table files survive the
        # in-memory catalog; saveAsTable refuses to reuse the location
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        wh_dir = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        leftover = os.path.join(wh_dir.removeprefix("file:"), table)
        if os.path.isdir(leftover):
            shutil.rmtree(leftover)
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: str | Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style directory partitioning — the other half of the
    physical layout story next to :func:`write_bucketed`: partition by
    the coarse pruning dimension (almost always the date/hour column
    at 100 TB), bucket by the join key within it. A reader whose
    predicate binds the partition column never opens the other
    directories at all — the FileIndex prunes them before any parquet
    footer is read, which is what makes a year-long table cheap to
    query for one day. Keep partition cardinality in the thousands
    (a partition per day/hour/country), never per-user — millions of
    tiny directories destroy listing time and the small-file budget.
    """
    cols = (
        [partition_cols]
        if isinstance(partition_cols, str)
        else list(partition_cols)
    )
    df.write.mode(mode).partitionBy(*cols).parquet(path)


def partition_filters(df: DataFrame) -> list[str]:
    """Extract the scan's PartitionFilters from the physical plan —
    the assertion primitive for 'this predicate prunes directories,
    not rows' (the pruning twin of :func:`n_exchanges`)."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    return [m for m in re.findall(r"PartitionFilters: \[([^\]]*)\]", plan) if m]


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a catalog table (bucket metadata comes with it — a plain
    ``spark.read.parquet(path)`` would NOT see the bucketing and would
    reintroduce shuffles)."""
    return spark.table(table)


def n_exchanges(df: DataFrame) -> int:
    """Count Exchange operators in the physical plan — the assertion
    primitive for 'this join/agg is co-located'."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "Reused" not in line
    )


def zorder_key(*cols: Column, bits: int = 16) -> Column:
    """Z-order (Morton) interleave of up to 4 non-negative integer
    columns into one BIGINT sort key — the multi-dimensional
    clustering layout (Databricks OPTIMIZE ZORDER BY, Hudi/Iceberg
    z-ordering) built from public bit arithmetic: writing a table
    sorted by z(key_a, key_b) makes min/max file statistics selective
    for range predicates on EITHER column, so data skipping prunes
    files for both access paths from one layout.

    Each column contributes its low ``bits`` bits (cap values first if
    they can exceed 2^bits - 1); bits * n_cols must fit in 63. All
    JVM expressions (shiftleft / shiftright / bitwise or), no UDF.
    Usage: df.repartitionByRange(N, z).sortWithinPartitions(z).write...
    """
    n = len(cols)
    if not 1 <= n <= 4:
        raise ValueError("zorder_key takes 1-4 columns")
    if bits * n > 63:
        raise ValueError(f"bits*cols = {bits * n} exceeds a signed 64-bit key")
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            cc = F.col(c) if isinstance(c, str) else c
            bit = F.shiftright(cc.cast("long"), b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + i))
    return key


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> int:
    """Small-file compaction for an append-heavy parquet table (the
    maintenance half of the streaming ingest-then-compact layout in
    streaming/ingest.py): size the output file count from the actual
    on-disk bytes, rewrite once (optionally re-sorted so min/max file
    stats become selective — pair with :func:`zorder_key`), then swap
    directories atomically-enough for a single-writer maintenance
    window. Returns the new file count.

    At warehouse scale this is the nightly OPTIMIZE job; concurrent
    readers during the swap need a real table format's snapshot commit
    (the parquet-directory layout here has no manifest), so run it in
    the ingest's quiet window — the streaming checkpoint itself is
    unaffected because the SINK directory is what's rewritten.
    """
    tmp = path.rstrip("/") + "__compact_tmp"
    old = path.rstrip("/") + "__compact_old"
    # Recover a previous run that died mid-swap: `old` holding the only
    # copy means the second rename never happened — put it back; `old`
    # alongside `path` means only the cleanup was missed. A leftover
    # `tmp` is always a partial write.
    if os.path.exists(old):
        if not os.path.exists(path):
            os.rename(old, path)
        else:
            shutil.rmtree(old)
    if os.path.exists(tmp):
        shutil.rmtree(tmp)

    total_bytes = 0
    for root, _dirs, files in os.walk(path):
        for fname in files:
            if fname.endswith(".parquet"):
                total_bytes += os.path.getsize(os.path.join(root, fname))
    n_files = max(1, (total_bytes + target_file_bytes - 1) // target_file_bytes)
    df = spark.read.parquet(path)
    if sort_cols:
        df = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        # coalesce cannot RAISE the partition count; fall back to a
        # repartition when the input has fewer partitions than asked for
        # (splitting oversized files is as much OPTIMIZE's job as
        # merging small ones).
        current = df.rdd.getNumPartitions()
        df = df.coalesce(n_files) if current >= n_files else df.repartition(n_files)
    df.write.mode("overwrite").parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    # Report what actually landed, not the target.
    actual = 0
    for root, _dirs, files in os.walk(path):
        actual += sum(1 for fname in files if fname.endswith(".parquet"))
    return actual


def skew_report(
    df: DataFrame, key_cols: str | Sequence[str], k: int = 20
) -> DataFrame:
    """Key-skew diagnostic — run this BEFORE choosing a join/agg
    strategy on a 100 TB table: the output is the top-``k`` heaviest
    keys with their row share and the ratio of each key's weight to
    the mean key weight (`x_mean`). A top key with x_mean in the
    thousands is the signal to salt (operators/joins.salted_join), to
    isolate the key into its own broadcast pass, or to rely on AQE
    skew-join splitting; a flat report says plain hash partitioning
    is fine. One groupBy + one 1-row aggregate broadcast — safe to run
    on the full table.
    """
    cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    counts = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("_total"), F.avg("n_rows").alias("_mean")
    )
    return (
        counts.join(F.broadcast(totals))
        .select(
            *cols,
            "n_rows",
            F.round(F.col("n_rows") / F.col("_total"), 6).alias("share"),
            F.round(F.col("n_rows") / F.col("_mean"), 2).alias("x_mean"),
        )
        .orderBy(F.col("n_rows").desc(), *cols)
        .limit(k)
    )


def column_profile(
    df: DataFrame, reprs: dict[str, Column] | None = None
) -> DataFrame:
    """Per-column data profile in ONE table scan: (n_rows, column,
    n_nulls, n_distinct, min_repr, max_repr, avg_repr_len). The
    profile every layout decision in this file starts from — which
    columns are high-cardinality (bucket/z-order keys), which are
    null-heavy (sort nulls last, prune early), how wide values run
    (dictionary-encoding candidates).

    ``reprs`` maps column → canonical string representation; default
    is CAST AS STRING. Pass explicit formats for doubles/timestamps
    when cross-engine repr stability matters (float-to-string is the
    one place engines disagree). All metrics fold into a single
    aggregate (count_distinct per column expands it k-fold — one pass
    over the table either way, exactly what a profiler costs), then
    one inline() unpivots driver-side — the wide row is 6 values per
    column, nowhere near data scale."""
    reprs = reprs or {c: F.col(c).cast("string") for c in df.columns}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c, r in reprs.items():
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nn"),
            F.countDistinct(F.col(c)).alias(f"{c}__nd"),
            F.min(r).alias(f"{c}__mn"),
            F.max(r).alias(f"{c}__mx"),
            F.round(F.avg(F.length(r)), 6).alias(f"{c}__al"),
        ]
    wide = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__nn").alias("n_nulls"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__mn").alias("min_repr"),
                F.col(f"{c}__mx").alias("max_repr"),
                F.col(f"{c}__al").alias("avg_repr_len"),
            )
            for c in reprs
        ]
    )
    return wide.select(F.col("__n").alias("n_rows"), F.inline(entries))
