"""Candidate: six_degrees_summary on the INT-keyed part-supplier graph.

Narrower types (guide §2.3): every BFS/meet/reconstruct shuffle, sort
and join currently keys on 'p:<k>'/'s:<k>' strings; the int twin
halves the key bytes and removes string comparisons. The PAIR SAMPLE
hashes the public string form via _fmt_node, so the selected node set
is bit-identical; every declared output (dist / humans-on-path
aggregates) is invariant to node relabeling: distances are label-free
and the graph is strictly bipartite, so humans-on-path is a function
of (endpoint types, path length) — path CHOICE may differ (min-parent
over ints), its statistics cannot. Also pins the 4x-referenced
vertices frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from social_link_prediction_spark.catalog.c01 import (
    _fmt_node, _partsupp_edges_int,
)
from social_link_prediction_spark.graph import paths as gpaths
from social_link_prediction_spark.graph.build import undirected
from social_link_prediction_spark.ml.linksplit import hash60


def candidate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    edges = _partsupp_edges_int(spark, sf_dir)
    vertices = (
        edges.select(F.col("src").alias("id"))
        .dropDuplicates()
        .withColumn(
            "type",
            F.when(F.col("id") >= 0, F.lit("human")).otherwise(F.lit("part")),
        )
        .persist()
    )
    n_pairs, seed, max_hops = 50, 7, 4

    if edges.storageLevel == StorageLevel.NONE:
        edges = edges.localCheckpoint()
    bfs_edges = (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .dropDuplicates()
        .localCheckpoint()
    )
    ids = vertices.select("id")
    n_nodes = vertices.count()
    K = 1 << 30
    target = n_pairs + 4.0 * (n_pairs ** 0.5) + 10.0
    thresh = int(min(1.0, target / max(n_nodes, 1)) * K)

    def _sample(s: int, out: str) -> DataFrame:
        key = _fmt_node(F.col("id"))  # hash the PUBLIC string form
        cand = ids.filter(F.pmod(hash60(key, F.lit(s)), F.lit(K)) < thresh)
        w = Window.orderBy(hash60(key, F.lit(s + 1_000_003)), "id")
        return (
            cand.withColumn("k", F.row_number().over(w))
            .filter(F.col("k") <= n_pairs)
            .select(F.col("id").alias(out), "k")
        )

    a = _sample(seed, "src")
    b = _sample(seed + 1, "dst")
    pairs = (
        a.join(b, "k")
        .select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .localCheckpoint()
    )
    deg = gpaths.degrees_of_separation(
        bfs_edges, pairs, vertices, weight=None, max_hops=max_hops
    )
    degree_sum = undirected(edges).count()
    return deg.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("dist").isNull().cast("long")).alias("unreachable"),
        F.sum("dist").cast("long").alias("sum_dist"),
        F.max("dist").cast("long").alias("max_dist"),
        F.sum("degree").cast("long").alias("sum_degree_sep"),
        (F.expr("percentile(degree, 0.5)") * 2).cast("long")
        .alias("median_degree_sep_x2"),
        F.max("degree").cast("long").alias("max_degree_sep"),
    ).select(
        "*",
        F.lit(n_nodes).cast("long").alias("n_nodes"),
        F.lit(degree_sum).cast("long").alias("degree_sum"),
    )
