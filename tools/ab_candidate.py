"""Candidate: jl_projection_audit with the 16x64-fold projection
lifted off the 1-3-task scan stage (repartition embeddings to
defaultParallelism before computing pv / the checkpoint)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from social_link_prediction_spark.catalog.c04 import _t, tg


def candidate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from social_link_prediction_spark.pipelines import similarity as _sim

    P = _sim.random_hyperplanes(64, 16, seed=7)
    emb = _t(spark, sf_dir, "embeddings")
    sp = spark.sparkContext.defaultParallelism
    v = F.col("embedding").cast("array<double>")
    pv = F.array(
        *[
            _sim.dot(v, F.array(*[F.lit(float(x)) for x in p])) / 4.0
            for p in P
        ]
    )
    e = (
        emb.select("vec_id", "embedding")
        .repartition(sp)
        .select(F.col("vec_id").alias("id"), v.alias("v"), pv.alias("pv"))
        .localCheckpoint()
    )
    pairs = tg.sampled_edges(e.select("id"), 40, "jl")
    a = e.select(
        F.col("id").alias("src"), F.col("v").alias("va"), F.col("pv").alias("pa")
    )
    b = e.select(
        F.col("id").alias("dst"), F.col("v").alias("vb"), F.col("pv").alias("pb")
    )
    d = (
        pairs.join(a, "src")
        .join(b, "dst")
        .select(
            (
                _sim.dot(F.col("va"), F.col("va"))
                - 2 * _sim.dot(F.col("va"), F.col("vb"))
                + _sim.dot(F.col("vb"), F.col("vb"))
            ).alias("d2"),
            (
                _sim.dot(F.col("pa"), F.col("pa"))
                - 2 * _sim.dot(F.col("pa"), F.col("pb"))
                + _sim.dot(F.col("pb"), F.col("pb"))
            ).alias("p2"),
        )
    )
    r = d.filter(F.col("d2") > 0).select(
        F.round(F.col("p2") / F.col("d2"), 6).alias("ratio")
    )
    return r.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.avg("ratio"), 6).alias("mean_ratio"),
        F.round(F.max(F.abs(F.col("ratio") - 1)), 6).alias("max_abs_err"),
        F.round(
            F.avg(F.when(F.abs(F.col("ratio") - 1) <= 0.5, 1.0).otherwise(0.0)),
            6,
        ).alias("frac_within_half"),
    )
