"""Candidate: lad_regression_grid with med+atm collapsed to one cdf
pass — exactly one row per slope satisfies prev < mrank <= cum (the
median row) and it already carries cum/cums, so the min-agg, the medr
join, and the second execution of the cdf window subtree all drop."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from social_link_prediction_spark.catalog.c06 import _t
from social_link_prediction_spark.ml.linksplit import hash60


def candidate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    v = li.select(
        F.round("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
        F.when(
            hash60(
                F.concat_ws(
                    "-",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                ),
                F.lit("ladg"),
            )
            % 5
            == 0,
            1,
        ).otherwise(0).alias("smp"),
    ).persist()
    s = v.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x").cast("decimal(30,0)") * F.col("y")).alias("sxy"),
    )
    ols = (
        F.col("n") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy")
    ) / (
        F.col("n") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx")
    )
    ctr = s.select(
        "n", "sx", "sy", "sxx", "sxy",
        F.round(ols).cast("long").alias("bc"),
    ).localCheckpoint()
    grid = ctr.select(
        F.explode(F.sequence(F.lit(0), F.lit(40))).alias("k"), "bc"
    ).select(
        (
            F.col("bc")
            + (F.col("k") - 20) * F.greatest(F.lit(1), F.expr("bc div 20"))
        ).alias("b")
    )
    sp = spark.sparkContext.defaultParallelism

    def _loss_per_slope(
        rows: DataFrame, slopes: DataFrame, fan: bool = False
    ) -> DataFrame:
        if fan:
            rows = rows.repartition(sp)
        res = rows.crossJoin(F.broadcast(slopes)).select(
            "b", (F.col("y") - F.col("b") * F.col("x")).alias("r")
        )
        rc = res.groupBy("b", "r").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        ).withColumn(
            "rcs", (F.col("r") * F.col("c")).cast("long")
        ).localCheckpoint()
        wc = Window.partitionBy("b").orderBy("r").rowsBetween(
            Window.unboundedPreceding, 0
        )
        wp = Window.partitionBy("b").orderBy("r").rowsBetween(
            Window.unboundedPreceding, -1
        )
        cdf = rc.select(
            "b", "r",
            F.sum("c").over(wc).cast("long").alias("cum"),
            F.coalesce(F.sum("c").over(wp), F.lit(0))
            .cast("long")
            .alias("prev"),
            F.sum("rcs").over(wc).cast("long").alias("cums"),
        )
        tot = rc.groupBy("b").agg(
            F.sum("c").cast("long").alias("tn"),
            F.sum("rcs").cast("long").alias("s_tot"),
        )
        mrank = F.expr("(tn + 1) div 2")
        atm = (
            cdf.join(F.broadcast(tot), "b")
            .filter((F.col("cum") >= mrank) & (F.col("prev") < mrank))
            .select(
                "b", F.col("r").alias("medr"),
                F.col("cum").alias("c_le"), F.col("cums").alias("s_le"),
                "tn", "s_tot",
            )
        )
        return atm.select(
            "b", "medr",
            (
                F.col("medr") * (2 * F.col("c_le") - F.col("tn"))
                + F.col("s_tot")
                - 2 * F.col("s_le")
            ).cast("long").alias("l1"),
        )

    sloss = _loss_per_slope(v.filter(F.col("smp") == 1), grid, fan=True)
    wbest = Window.orderBy("l1", "b")  # 41-row frame
    pick = sloss.withColumn("rr", F.row_number().over(wbest)).filter(
        F.col("rr") == 1
    ).select(F.col("b").alias("b")).localCheckpoint()
    two = pick.unionAll(ctr.select(F.col("bc").alias("b"))).distinct()
    floss = _loss_per_slope(v, two).localCheckpoint()
    best = pick.join(floss, "b").select(
        F.col("b").alias("bb"), F.col("medr").alias("bmed"),
        F.col("l1").alias("bl1"),
    )
    center = ctr.select(F.col("bc").alias("b")).join(floss, "b").select(
        F.col("l1").alias("cl1")
    )
    return (
        ctr.crossJoin(F.broadcast(best))
        .crossJoin(F.broadcast(center))
        .select(
            "n",
            F.round(ols / 100e0, 4).alias("ols_slope"),
            F.round(F.col("bb") / 100e0, 2).alias("lad_slope"),
            F.round(F.col("bmed") / 100e0, 2).alias("lad_intercept"),
            F.round(F.col("bl1") / 100e0, 2).alias("lad_loss"),
            F.round(F.col("cl1") / 100e0, 2).alias("center_loss"),
        )
    )
