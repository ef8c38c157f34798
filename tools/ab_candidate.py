"""Candidate: six_degrees_summary with the tiny meet (50 rows) and
half-path (~100 rows) frames localCheckpointed — the final job's plan
shows the meet subtree (SMJs over the ~1M-row best table) executed ~3x
and the reconstruct chain 2x because the fpaths/bpaths branches
duplicate it (only 2 ReusedExchange fire)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from social_link_prediction_spark.catalog.c01 import _partsupp_edges
from social_link_prediction_spark.graph import paths as gp


def _bfs_static_bcast(edges, sources, hops):
    """_bfs_static with the frontier broadcast into each level join
    (local candidate; the frontier is sources x reach, bounded by the
    50-pair sample at this scale)."""
    id_type = dict(sources.dtypes)["source"]
    e = edges.select("src", "dst")
    lvl = sources.select(
        "source",
        F.col("source").alias("id"),
        F.lit(None).cast(id_type).alias("parent"),
    )
    levels = [lvl.withColumn("dist", F.lit(0.0))]
    for h in range(1, hops + 1):
        lvl = (
            F.broadcast(lvl).join(e.withColumnRenamed("src", "id"), "id")
            .groupBy("source", F.col("dst").alias("nid"))
            .agg(F.min("id").alias("parent"))
            .select("source", F.col("nid").alias("id"), "parent")
        )
        levels.append(lvl.withColumn("dist", F.lit(float(h))))
    allv = levels[0]
    for d in levels[1:]:
        allv = allv.unionByName(d)
    return (
        allv.select(
            "source", "id", F.struct("dist", "parent").alias("c")
        )
        .groupBy("source", "id")
        .agg(F.min("c").alias("c"))
        .select(
            "source", "id",
            F.col("c.dist").alias("dist"), F.col("c.parent").alias("parent"),
        )
    )


def _static_reconstruct_bcast(best, targets, max_hops):
    """_static_reconstruct with the tiny accumulating chain broadcast
    (right-outer build-left form of the same left join)."""
    cur = (
        F.broadcast(targets).join(best, ["source", "id"])
        .select(
            "source",
            F.col("id").alias("target"),
            "dist",
            F.array("id").alias("path"),
            "parent",
        )
    )
    b = best.select(
        F.col("source").alias("b_source"),
        F.col("id").alias("b_id"),
        F.col("parent").alias("b_parent"),
    )
    for _ in range(max_hops):
        cur = (
            b.join(
                F.broadcast(cur),
                (F.col("source") == F.col("b_source"))
                & (F.col("parent") == F.col("b_id")),
                "right",
            )
            .select(
                "source",
                "target",
                "dist",
                F.when(
                    F.col("parent").isNotNull(),
                    F.concat(F.array("parent"), F.col("path")),
                )
                .otherwise(F.col("path"))
                .alias("path"),
                F.col("b_parent").alias("parent"),
            )
        )
    return cur.select("source", F.col("target").alias("id"), "dist", "path")


def _pair_paths_bidi_ckpt(
    edges: DataFrame, pairs: DataFrame, max_hops: int
) -> DataFrame:
    f_hops = (max_hops + 1) // 2
    b_hops = max_hops // 2
    und = gp.undirected(edges)
    srcs = pairs.select(F.col("src").alias("source")).dropDuplicates()
    dsts = pairs.select(F.col("dst").alias("source")).dropDuplicates()
    both = srcs.unionByName(dsts).dropDuplicates()
    if f_hops <= 4:
        best = _bfs_static_bcast(und, both, f_hops).localCheckpoint()
    else:
        best = gp.multi_source_shortest_paths(und, both, None, f_hops, directed=True)
    bb = best.filter(F.col("dist") <= b_hops)

    meet = (
        pairs.join(
            best.select(
                F.col("source").alias("src"), F.col("id").alias("m"),
                F.col("dist").alias("df"),
            ),
            "src",
        )
        .join(
            bb.select(
                F.col("source").alias("dst"), F.col("id").alias("m"),
                F.col("dist").alias("db"),
            ),
            ["dst", "m"],
        )
        .select(
            "src", "dst",
            F.struct(
                (F.col("df") + F.col("db")).alias("dist"), F.col("m").alias("m")
            ).alias("c"),
        )
        .groupBy("src", "dst")
        .agg(F.min("c").alias("c"))
        .select(
            "src", "dst", F.col("c.dist").alias("dist"), F.col("c.m").alias("m")
        )
        .localCheckpoint()
    )
    half_targets = (
        meet.select(F.col("src").alias("source"), F.col("m").alias("id"))
        .unionByName(
            meet.select(F.col("dst").alias("source"), F.col("m").alias("id"))
        )
        .dropDuplicates()
    )
    half = _static_reconstruct_bcast(best, half_targets, f_hops).localCheckpoint()
    fpaths = half.select(
        F.col("source").alias("src"), F.col("id").alias("m"),
        F.col("path").alias("fpath"),
    )
    bpaths = half.select(
        F.col("source").alias("dst"), F.col("id").alias("m"),
        F.col("path").alias("bpath"),
    )
    stitched = (
        meet.join(fpaths, ["src", "m"])
        .join(bpaths, ["dst", "m"])
        .withColumn(
            "path",
            F.concat(
                F.col("fpath"),
                F.expr("slice(reverse(bpath), 2, greatest(size(bpath) - 1, 0))"),
            ),
        )
        .select("src", "dst", "dist", "path")
    )
    return pairs.join(stitched, ["src", "dst"], "left")


def candidate(spark: SparkSession, sf_dir: str) -> DataFrame:
    orig = gp._pair_paths_bidirectional
    gp._pair_paths_bidirectional = _pair_paths_bidi_ckpt
    try:
        edges = _partsupp_edges(spark, sf_dir)
        vertices = (
            edges.select(F.col("src").alias("id"))
            .dropDuplicates()
            .withColumn(
                "type",
                F.when(F.col("id").startswith("s:"), F.lit("human")).otherwise(
                    F.lit("part")
                ),
            )
        )
        return gp.six_degrees_experiment(
            edges, vertices, n_pairs=50, seed=7, max_hops=4, exact=True
        )
    finally:
        gp._pair_paths_bidirectional = orig
