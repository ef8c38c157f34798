"""Candidate: hits with (a) distinct_edges flag — the part-supplier
edge view is distinct by construction and already persisted, so the
operator's dropDuplicates().persist() re-shuffles and re-materializes
2.4M rows for nothing — and (b) the final raw (id, hub, auth) frame
pinned: its two-join subtree otherwise executes twice (the normalizer
broadcast and the final projection). Note hub/auth rounded to 6 like
the catalog query."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from social_link_prediction_spark.catalog.c01 import (
    _fmt_node, _partsupp_edges_int,
)


def _hits_cand(edges, iterations=5, src="src", dst="dst",
               broadcast_max_rows=2_000_000, distinct_edges=False):
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if not distinct_edges:
        e = e.dropDuplicates()
    e = e.persist()
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionAll(e.select(F.col("dst").alias("id")))
        .dropDuplicates()
        .cache()
    )
    n = nodes.count()
    maybe_bc = (lambda df: F.broadcast(df)) if n <= broadcast_max_rows else (lambda df: df)
    n_part = max(1, min(e.sparkSession.sparkContext.defaultParallelism, n // 500_000 + 1))

    hub = nodes.withColumn("hub", F.lit(1.0)).coalesce(n_part).localCheckpoint()
    auth = None
    for i in range(iterations):
        auth = (
            e.join(maybe_bc(hub.select(F.col("id").alias("src"), "hub")), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("hub").alias("auth"))
            .coalesce(n_part)
        )
        if i == iterations - 1:
            auth = auth.localCheckpoint()
        hub = (
            e.join(maybe_bc(auth.select(F.col("id").alias("dst"), "auth")), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("auth").alias("hub"))
            .coalesce(n_part)
            .localCheckpoint()
        )
    raw = (
        nodes.join(maybe_bc(hub), "id", "left")
        .join(maybe_bc(auth), "id", "left")
        .select(
            "id",
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
            F.coalesce("auth", F.lit(0.0)).alias("auth"),
        )
        .localCheckpoint()  # feeds the normalizer AND the projection
    )
    sums = F.broadcast(raw.agg(F.sum("hub").alias("hs"), F.sum("auth").alias("as_")))
    return raw.crossJoin(sums).select(
        "id",
        (F.col("hub") / F.col("hs")).alias("hub"),
        (F.col("auth") / F.col("as_")).alias("auth"),
    )


def candidate(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _partsupp_edges_int(spark, sf_dir)
    out = _hits_cand(edges, iterations=3, distinct_edges=False)
    return out.select(
        _fmt_node(F.col("id")).alias("id"),
        F.round("hub", 6).alias("hub"),
        F.round("auth", 6).alias("auth"),
    ).orderBy("id")
