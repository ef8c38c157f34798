"""Candidate: betweenness backward phase with (a) eager localCheckpoint
on each level's delta (truncates the growing backward plan that shows
up as ~1.1s driver gaps before the final jobs) and (b) a tighter
100k-row cap on the succ broadcast hint (the level-3 succ frame is
~400k rows at sf0.1 — collecting it to the driver for a broadcast is
driver time, not executor time)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from social_link_prediction_spark.catalog.c01 import (
    _fmt_node, _partsupp_edges_int,
)
from social_link_prediction_spark.ml import linksplit as mls

_BROADCAST_GUARD = 2_000_000
_SUCC_GUARD = 100_000


def _betweenness_cand(edges, seeds, max_depth=3, src="src", dst="dst"):
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).persist()
    lv0 = (
        seeds.select(F.col("source"), F.col("source").alias("node"))
        .dropDuplicates()
        .select("source", "node", F.lit(0).alias("dist"), F.lit(1.0).alias("sigma"))
        .persist()
    )
    levels = [lv0]
    counts = [lv0.count()]
    visited = lv0.select("source", "node")
    frontier = lv0
    for d in range(1, max_depth + 1):
        f = F.broadcast(frontier) if counts[-1] <= _BROADCAST_GUARD else frontier
        nxt = (
            f.join(e, f["node"] == e["src"])
            .groupBy("source", F.col("dst").alias("node"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(visited, ["source", "node"], "left_anti")
            .select("source", "node", F.lit(d).alias("dist"), "sigma")
            .persist()
        )
        levels.append(nxt)
        counts.append(nxt.count())
        visited = visited.unionByName(nxt.select("source", "node"))
        frontier = nxt

    delta = levels[max_depth].select(
        "source", "node", "sigma", F.lit(0.0).alias("delta")
    )
    deps = []
    for d in range(max_depth - 1, 0, -1):
        succ = delta.select(
            F.col("source").alias("w_source"),
            F.col("node").alias("w_node"),
            F.col("sigma").alias("w_sigma"),
            F.col("delta").alias("w_delta"),
        )
        lv = levels[d]
        lvh = F.broadcast(lv) if counts[d] <= _SUCC_GUARD else lv
        such = F.broadcast(succ) if counts[d + 1] <= _SUCC_GUARD else succ
        contrib = (
            lvh.join(e, lvh["node"] == e["src"])
            .join(
                such,
                (F.col("source") == F.col("w_source"))
                & (F.col("dst") == F.col("w_node")),
            )
            .groupBy("source", "node")
            .agg(
                F.sum(
                    F.col("sigma") / F.col("w_sigma") * (F.lit(1.0) + F.col("w_delta"))
                ).alias("dep")
            )
        )
        delta = (
            lv.join(contrib, ["source", "node"], "left")
            .select(
                "source",
                "node",
                "sigma",
                F.coalesce("dep", F.lit(0.0)).alias("delta"),
            )
            .localCheckpoint()
        )
        deps.append(delta)

    acc = deps[0]
    for part in deps[1:]:
        acc = acc.unionByName(part)
    return (
        acc.filter(F.col("delta") > 0)
        .groupBy(F.col("node").alias("id"))
        .agg(F.sum("delta").alias("betweenness"))
    )


def candidate(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _partsupp_edges_int(spark, sf_dir)
    seeds = (
        edges.filter(F.col("src") >= 0)
        .select(F.col("src").alias("source"))
        .dropDuplicates()
        .filter(
            mls.hash60(F.format_string("s%d", "source"), F.lit("bc")) % 100 < 2
        )
    )
    bc = _betweenness_cand(edges, seeds, max_depth=3)
    return (
        bc.select(
            _fmt_node(F.col("id")).alias("id"),
            F.round("betweenness", 6).alias("betweenness"),
        )
        .orderBy(F.col("betweenness").desc(), "id")
        .limit(20)
    )
