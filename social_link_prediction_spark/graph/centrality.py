"""Sampled betweenness centrality (Brandes) over an edge list.

Brandes, "A faster algorithm for betweenness centrality" (J. Math.
Soc. 2001), in the source-sampled estimator form (Brandes & Pich 2007):
run the forward BFS + backward dependency accumulation from a seed
SAMPLE and sum the per-source dependencies. Paired with the
hash-threshold sampler the seed set is deterministic, so a SQL oracle
can replay both phases level by level.

Depth-bounded: only shortest paths of length <= max_depth contribute
(k-betweenness) — the standard truncation for huge graphs, where full
BFS from every sample is the cost driver and short paths carry most of
the centrality signal on small-world networks.

Phases, all sources sharing every shuffle (one frame keyed by
(source, node)):

  forward   level d: frontier ⋈ edges, sigma summed over parents,
            minus already-visited (left_anti) — path counts per node.
  backward  level d: dependency delta(v) = Σ_{v→w, w at d+1}
            sigma(v)/sigma(w) · (1 + delta(w)), accumulated from the
            deepest level up (BFS DAG edges always go level d → d+1).

Betweenness(v) = Σ_sources delta(v) over non-seed levels. Scale by
n/|seeds| for the unbiased estimate if absolute values matter; the
ranking (what top-k consumers use) is scale-invariant.

Scale shape: the edge table is persisted once, every join keys on the
node id so its partitioning is reused; per-level frames localCheckpoint
(lineage truncation, same discipline as graph/pagerank.py). Memory is
one (source, node) row per visited pair — the sample size bounds it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def betweenness_sampled(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Depth-bounded Brandes betweenness from the ``source`` column of
    ``seeds``. Returns (id, betweenness) for every vertex with a
    positive accumulated dependency (interior vertices of some
    sampled shortest path)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).persist()
    lv0 = (
        seeds.select(F.col("source"), F.col("source").alias("node"))
        .dropDuplicates()
        .select("source", "node", F.lit(0).alias("dist"), F.lit(1.0).alias("sigma"))
        .localCheckpoint()
    )
    levels = [lv0]
    visited = lv0.select("source", "node")
    frontier = lv0
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .groupBy("source", F.col("dst").alias("node"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(visited, ["source", "node"], "left_anti")
            .select("source", "node", F.lit(d).alias("dist"), "sigma")
            .localCheckpoint()
        )
        levels.append(nxt)
        visited = visited.unionByName(nxt.select("source", "node")).localCheckpoint()
        frontier = nxt

    # Backward accumulation, deepest level first (its delta is 0).
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
        contrib = (
            lv.join(e, lv["node"] == e["src"])
            .join(
                succ,
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

    if not deps:
        return lv0.sparkSession.createDataFrame([], "id long, betweenness double")
    acc = deps[0]
    for part in deps[1:]:
        acc = acc.unionByName(part)
    return (
        acc.filter(F.col("delta") > 0)
        .groupBy(F.col("node").alias("id"))
        .agg(F.sum("delta").alias("betweenness"))
    )
