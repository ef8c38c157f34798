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

from pyspark.sql import DataFrame, SparkSession


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
