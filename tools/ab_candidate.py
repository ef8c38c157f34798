"""Candidate: scc_suppliers with tg.sampled_edges patched to
repartition the NLJ stream side to defaultParallelism — the probe is
otherwise the 1-task supplier scan, so the O(N^2) pair fan-out and its
md5 thinning hash run single-threaded for every sampled-graph query."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import social_link_prediction_spark.graph.testgraph as tg
from social_link_prediction_spark import queries as catalog
from social_link_prediction_spark.ml.linksplit import hash60


def _patched(nodes, rate_bp, seed, directed=False):
    cond = (
        F.col("src") != F.col("dst") if directed else F.col("src") < F.col("dst")
    )
    sp = nodes.sparkSession.sparkContext.defaultParallelism
    return (
        nodes.select(F.col("id").alias("src"))
        .repartition(sp)
        .join(nodes.select(F.col("id").alias("dst")), cond)
        .filter(
            hash60(F.format_string("%d-%d", "src", "dst"), F.lit(seed)) % 10000
            < rate_bp
        )
    )


def candidate(spark: SparkSession, sf_dir: str) -> DataFrame:
    orig = tg.sampled_edges
    tg.sampled_edges = _patched
    try:
        return catalog.QUERIES["scc_suppliers"](spark, sf_dir)
    finally:
        tg.sampled_edges = orig
