"""Candidate: decision_tree_depth2 with the lineitem side PRE-AGGREGATED
before the join (guide §2.3 'aggregate before you shuffle'): the
fast-ship label max(shipdate <= orderdate+30) over an order's lines is
exactly min(shipdate) <= orderdate+30, so the per-order line stats
(nl, sq, min_ship) reduce map-side on lineitem alone and the join
moves 150k pre-aggregated rows instead of 600k raw lines through the
orders join + re-aggregation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from social_link_prediction_spark.catalog.c01 import _t


def candidate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_shipdate"
    )
    lag = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("nl"),
        F.sum(F.round("l_quantity").cast("long")).cast("long").alias("sq"),
        F.min(F.to_date("l_shipdate")).alias("minship"),
    )
    base = (
        o.join(lag, o["o_orderkey"] == lag["l_orderkey"])
        .select(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("pc"),
            "nl", "sq",
            F.when(
                F.col("minship")
                <= F.date_add(F.to_date("o_orderdate"), 30),
                1,
            ).otherwise(0).cast("long").alias("pos"),
        )
        .persist()
    )

    def _lng(df: DataFrame, keys: list) -> DataFrame:
        parts = []
        for name, col in (("price", "pc"), ("lines", "nl"),
                          ("quantity", "sq")):
            parts.append(
                df.select(
                    *keys, F.lit(name).alias("feature"),
                    F.col(col).alias("v"), "pos",
                )
            )
        out = parts[0]
        for pp in parts[1:]:
            out = out.unionAll(pp)
        return out

    def _best(lng: DataFrame, keys: list) -> DataFrame:
        grp = lng.groupBy(*keys, "feature", "v").agg(
            F.sum("pos").cast("long").alias("p"),
            F.count(F.lit(1)).cast("long").alias("c"),
        )
        pw = Window.partitionBy(*keys, "feature").orderBy("v").rowsBetween(
            Window.unboundedPreceding, 0
        )
        tw = Window.partitionBy(*keys, "feature")
        cum = grp.select(
            *keys, "feature", "v",
            F.sum("p").over(pw).cast("long").alias("cp"),
            F.sum("c").over(pw).cast("long").alias("cc"),
            F.sum("p").over(tw).cast("long").alias("tp"),
            F.sum("c").over(tw).cast("long").alias("tc"),
        ).filter(F.col("cc") < F.col("tc"))
        score = (
            (
                F.col("cp") * F.col("cp")
                + (F.col("cc") - F.col("cp")) * (F.col("cc") - F.col("cp"))
            )
            * 1e0
            / F.col("cc")
            + (
                (F.col("tp") - F.col("cp")) * (F.col("tp") - F.col("cp"))
                + ((F.col("tc") - F.col("cc")) - (F.col("tp") - F.col("cp")))
                * ((F.col("tc") - F.col("cc")) - (F.col("tp") - F.col("cp")))
            )
            * 1e0
            / (F.col("tc") - F.col("cc"))
        )
        scored = cum.withColumn("score", score)
        if not keys:
            return scored.orderBy(F.desc("score"), "feature", "v").limit(
                1
            ).select("feature", "v", "score", "tp", "tc")
        wb = Window.partitionBy(*keys).orderBy(
            F.desc("score"), "feature", "v"
        )
        return scored.withColumn("rr", F.row_number().over(wb)).filter(
            F.col("rr") == 1
        ).select(*keys, "feature", "v", "score", "tp", "tc")

    root = _best(_lng(base, []), []).select(
        F.col("feature").alias("rf"), F.col("v").alias("rv"),
        F.col("score").alias("rscore"),
    )
    roottot = base.agg(
        F.sum("pos").cast("long").alias("rtp"),
        F.count(F.lit(1)).cast("long").alias("rtc"),
    )
    sided = base.crossJoin(F.broadcast(root)).withColumn(
        "side",
        F.when(
            F.when(F.col("rf") == "price", F.col("pc"))
            .when(F.col("rf") == "lines", F.col("nl"))
            .otherwise(F.col("sq"))
            <= F.col("rv"),
            F.lit("left"),
        ).otherwise(F.lit("right")),
    )
    children = _best(_lng(sided, ["side"]), ["side"])
    root_row = root.crossJoin(F.broadcast(roottot)).select(
        F.lit("root").alias("node"),
        F.col("rf").alias("feature"),
        F.col("rv").alias("threshold"),
        F.col("rtc").alias("n"),
        F.col("rtp").alias("n_pos"),
        F.col("rscore").alias("score"),
    )
    child_rows = children.select(
        F.col("side").alias("node"), "feature",
        F.col("v").alias("threshold"),
        F.col("tc").alias("n"), F.col("tp").alias("n_pos"), "score",
    )
    nodes = root_row.unionAll(child_rows)
    gini_before = 1e0 - (
        F.col("n_pos") * 1e0 * F.col("n_pos")
        + (F.col("n") - F.col("n_pos")) * 1e0 * (F.col("n") - F.col("n_pos"))
    ) / (F.col("n") * 1e0 * F.col("n"))
    return nodes.select(
        "node", "feature",
        F.round(
            F.when(
                F.col("feature") == "price", F.col("threshold") / 100e0
            ).otherwise(F.col("threshold") * 1e0),
            2,
        ).alias("threshold"),
        "n", "n_pos",
        F.round(F.col("n_pos") * 1e0 / F.col("n"), 6).alias("pos_rate"),
        F.round(gini_before, 6).alias("gini_before"),
        F.round(1e0 - F.col("score") / F.col("n"), 6).alias("gini_after"),
    ).orderBy(
        F.when(F.col("node") == "root", 0)
        .when(F.col("node") == "left", 1)
        .otherwise(2)
    )
