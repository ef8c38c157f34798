"""Transitive closure (path doubling) and time-respecting reachability.

Two recursion-shaped graph operators the relational core can't express
in one pass, built as unrolled/doubling iterative DataFrame plans:

- ``transitive_closure``: all (descendant, ancestor, depth) pairs of a
  parent-pointer forest (org charts, category trees, BOM structures —
  the reference's taxonomy refactor walks exactly such a type
  hierarchy by hand, NB cells 70-78). Path DOUBLING, not level-by-
  level: round k holds every ancestor link of length <= 2^k, so a
  depth-D hierarchy closes in ceil(log2(D)) self-joins instead of D
  chained joins — at 100 TB that is 5-6 shuffles for a depth-40 BOM
  rather than 40.
- ``temporal_reachability``: earliest-arrival BFS over timestamped
  edges where an edge (u, v, t) is traversable only if u was reached
  by time t (Holme & Saramäki, Phys. Rep. 519). Each round is one
  keyed join + min-aggregation — the SSSP relaxation shape with the
  time constraint as a join filter.

Both operators cut lineage per round with localCheckpoint (the same
discipline as pagerank/katz/scc) so the unrolled plan never doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    parent_edges: DataFrame,
    max_depth: int = 64,
    child: str = "child",
    parent: str = "parent",
) -> DataFrame:
    """All ancestor pairs of a parent-pointer forest.

    ``parent_edges`` has one row per non-root node: (child, parent).
    Returns (desc, anc, depth) with depth >= 1 — every proper
    ancestor of every node. Forest assumption: one parent per child
    (each (desc, anc) pair then has exactly one path, so the doubling
    union dedupes on the pair alone).

    Path doubling: L_0 = direct links (depth 1); L_{k+1} = L_k UNION
    (L_k JOIN L_k) — after round k every link of length <= 2^k is
    present. ceil(log2(max_depth)) rounds bound the work; the loop
    exits early as soon as a round adds no new pairs (one count per
    round on the checkpointed frame, not an extra job).
    """
    if max_depth < 1:
        raise ValueError(f"max_depth must be >= 1, got {max_depth}")
    links = (
        parent_edges.select(
            F.col(child).cast("long").alias("desc"),
            F.col(parent).cast("long").alias("anc"),
            F.lit(1).cast("int").alias("depth"),
        )
        .dropDuplicates(["desc", "anc"])
        .localCheckpoint()
    )
    n = links.count()
    rounds = max(1, (max_depth - 1).bit_length())
    for _ in range(rounds):
        hops = (
            links.alias("a")
            .join(
                links.select(
                    F.col("desc").alias("anc"),
                    F.col("anc").alias("anc2"),
                    F.col("depth").alias("d2"),
                ).alias("b"),
                "anc",
            )
            .select(
                F.col("desc"),
                F.col("anc2").alias("anc"),
                (F.col("depth") + F.col("d2")).alias("depth"),
            )
        )
        links = (
            links.unionByName(hops)
            .dropDuplicates(["desc", "anc"])
            .localCheckpoint()
        )
        n2 = links.count()
        if n2 == n:
            break
        n = n2
    return links


def temporal_reachability(
    edges: DataFrame,
    sources: DataFrame,
    max_rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
    ts: str = "t",
) -> DataFrame:
    """Earliest-arrival set over timestamped edges.

    ``edges``: (src, dst, t); ``sources``: (id) seed nodes, arrival 0.
    An edge (u, v, t) is usable iff arrival(u) <= t, and taking it
    sets a candidate arrival(v) = t — the time-respecting path
    semantics (you cannot ride an edge that departed before you got
    there). Returns (id, arrival) for every node reached within
    ``max_rounds`` hops, arrival = minimum over all time-respecting
    paths (earliest-arrival is hop-monotone, so round r holds the
    exact earliest arrival among paths of <= r edges).

    Per round: one equi-join of the arrival frame onto edge sources
    with the time constraint as a join filter, one min-agg by
    destination, one outer merge — the SSSP relaxation shape. The
    arrival frame is |reached| rows, checkpointed per round.
    """
    e = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v"), F.col(ts).alias("t")
    ).persist()
    arrival = sources.select(
        F.col("id").cast("long").alias("id"),
        F.lit(0).cast("long").alias("arrival"),
    ).localCheckpoint()
    for _ in range(max_rounds):
        cand = (
            e.join(arrival.withColumnRenamed("id", "u"), "u")
            .filter(F.col("t") >= F.col("arrival"))
            .groupBy(F.col("v").alias("id"))
            .agg(F.min("t").alias("cand"))
        )
        arrival = (
            arrival.join(cand, "id", "full")
            .select(
                "id",
                F.least(
                    F.coalesce("arrival", F.lit(2**62)),
                    F.coalesce("cand", F.lit(2**62)),
                ).alias("arrival"),
            )
            .localCheckpoint()
        )
    e.unpersist()
    return arrival


def bfs_rounds(
    edges: DataFrame,
    seeds: DataFrame,
    max_rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Earliest-activation rounds of a multi-seed BFS: (id, round)
    with round 0 = seed, round r = first reached in r hops (within
    ``max_rounds``). The collective-frontier twin of the per-source
    ``multi_source_shortest_paths`` — one frontier for ALL seeds, so
    an independent-cascade / reachability job is max_rounds keyed
    joins + min-merges regardless of seed count. Per round the
    frontier joins the edge list, subtracts already-activated nodes
    (one merge agg), and is checkpointed."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).persist()
    act = seeds.select(
        F.col("id").cast("long").alias("id"),
        F.lit(0).cast("int").alias("round"),
    ).localCheckpoint()
    frontier = act
    for r in range(1, max_rounds + 1):
        nxt = (
            e.join(frontier.withColumnRenamed("id", "u"), "u")
            .select(F.col("v").alias("id"))
            .distinct()
            .join(act.select("id"), "id", "left_anti")
            .select("id", F.lit(r).cast("int").alias("round"))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        act = act.unionByName(nxt).localCheckpoint()
        frontier = nxt
    e.unpersist()
    return act
