"""Candidate: median_bootstrap_ci with the replicate fan-out lifted off
the single-row-group scan stage — repartition v by defaultParallelism
before the 20x crossJoin so the 3M hash60 (md5) evaluations use every
core instead of the <=3 scan tasks."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from social_link_prediction_spark.catalog.c06 import _t, st, _POIS1_CDF
from social_link_prediction_spark.ml.linksplit import hash60


def candidate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    v = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("x"),
    )
    nn = v.agg(F.count(F.lit(1)).cast("long").alias("n"))
    dv = v.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("c"))
    cdf = st.bucketed_prefix_sums(dv, "x", ["c"], n_buckets=32).select(
        "x",
        F.col("cum_c").cast("long").alias("cum"),
        (F.col("cum_c") - F.col("c")).cast("long").alias("prev"),
    )
    mrank = F.expr("(n + 1) div 2")
    pt = (
        cdf.crossJoin(F.broadcast(nn))
        .filter((F.col("cum") >= mrank) & (F.col("prev") < mrank))
        .agg(F.min("x").alias("medx"))
    )
    reps = spark.range(20).select(F.col("id").cast("long").alias("b"))
    u = (
        hash60(
            F.col("o_orderkey").cast("string"),
            F.concat(F.lit("boot"), F.col("b").cast("string")),
        )
        % 1000000
    ) / 1000000e0
    cuts = [float(c_) for c_ in _POIS1_CDF]
    wexpr = (
        F.when(u < cuts[0], 0)
        .when(u < cuts[1], 1)
        .when(u < cuts[2], 2)
        .when(u < cuts[3], 3)
        .when(u < cuts[4], 4)
        .when(u < cuts[5], 5)
        .otherwise(6)
    )
    sp = spark.sparkContext.defaultParallelism
    wts = (
        v.repartition(sp)
        .crossJoin(F.broadcast(reps))
        .select("b", "x", wexpr.alias("w"))
        .groupBy("b", "x")
        .agg(F.sum("w").cast("long").alias("wt"))
    )
    tot = wts.groupBy("b").agg(F.sum("wt").cast("long").alias("tw"))
    wcb = Window.partitionBy("b").orderBy("x").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wpb = Window.partitionBy("b").orderBy("x").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cdfb = wts.select(
        "b", "x",
        F.sum("wt").over(wcb).cast("long").alias("cum"),
        F.coalesce(F.sum("wt").over(wpb), F.lit(0))
        .cast("long")
        .alias("prev"),
    )
    brank = F.expr("(tw + 1) div 2")
    meds = (
        cdfb.join(F.broadcast(tot), "b")
        .filter((F.col("cum") >= brank) & (F.col("prev") < brank))
        .groupBy("b")
        .agg(F.min("x").alias("m"))
    )
    se = meds.agg(
        F.count(F.lit(1)).cast("long").alias("bn"),
        F.sum("m").cast("long").alias("sm"),
        F.sum(F.col("m").cast("decimal(38,0)") * F.col("m")).alias("smm"),
        F.min("m").cast("long").alias("mn"),
        F.max("m").cast("long").alias("mx"),
    )
    sd = F.sqrt(
        (
            F.col("smm").cast("double")
            - F.col("sm").cast("double") * F.col("sm") / F.col("bn")
        )
        / (F.col("bn") - 1)
    )
    return (
        nn.crossJoin(F.broadcast(pt))
        .crossJoin(F.broadcast(se))
        .select(
            F.col("n").alias("n_orders"),
            F.round(F.col("medx") / 100e0, 2).alias("median_price"),
            F.col("bn").alias("n_replicates"),
            F.round(sd / 100e0, 4).alias("boot_se"),
            F.round((F.col("medx") - 1.96e0 * sd) / 100e0, 2).alias("ci_lo"),
            F.round((F.col("medx") + 1.96e0 * sd) / 100e0, 2).alias("ci_hi"),
            F.round(F.col("mn") / 100e0, 2).alias("boot_min"),
            F.round(F.col("mx") / 100e0, 2).alias("boot_max"),
        )
    )
