"""Candidate: pair_features_suppliers with the supplier-pair NLJ's
stream side repartitioned to defaultParallelism (the distinct-suppkey
frame AQE-coalesces to ~1 partition, so the 500k-pair fan-out and the
persisted pair cache build run nearly single-threaded)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from social_link_prediction_spark.catalog.c01 import (
    _fmt_node,
    _partsupp_edges_int,
    _t,
)
from social_link_prediction_spark.ml import predict as mlp


def candidate(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _partsupp_edges_int(spark, sf_dir)
    sups = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_suppkey").cast("long").alias("id"))
        .dropDuplicates()
    )
    sp = spark.sparkContext.defaultParallelism
    a, b = sups.repartition(sp).alias("a"), sups.alias("b")
    pairs = (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"))
        .persist()
    )
    out = mlp.pair_features(pairs, edges, edges_symmetric=True)
    return out.select(
        _fmt_node(F.col("src")).alias("src"),
        _fmt_node(F.col("dst")).alias("dst"),
        "common_neighbors",
        F.round("adamic_adar", 6).alias("adamic_adar"),
        F.round("neighbor_jaccard", 6).alias("neighbor_jaccard"),
        "pref_attachment", "src_deg", "dst_deg",
    )
