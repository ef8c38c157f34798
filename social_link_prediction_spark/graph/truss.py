"""k-truss decomposition — triangle-support edge peeling.

A k-truss (Cohen 2008, "Trusses: cohesive subgraphs for social
network analysis") is the maximal subgraph in which every edge is
supported by at least k-2 triangles. Peeling alternates triangle
counting and edge dropping until a fixed point — the edge-level
analog of k-core's vertex peeling (graph/../queries kcore), and the
standard community-core extractor for dense social graphs.

Round shape, all DataFrame algebra on the canonical (src < dst)
edge list:

  triangles  compact-forward enumeration (a<b<c exactly once, the
             same discipline as graph/motifs.py): (a,b) ⋈ (a,c) with
             b<c, closed by (b,c) membership.
  support    each triangle contributes to its three edges; one
             groupBy over the union of the three projections.
  peel       keep edges with support >= k-2 (left join + coalesce 0,
             so triangle-free edges drop too).

Scale shape: the triangle join is the cost driver and shrinks
monotonically every round (edges only ever drop). Per-round frames
persist lazily; the loop exits when the edge count reaches a fixed
point — on small-world graphs the peel depth is a handful of rounds.
At 100 TB pre-bucket the edge table by src so the (a,a) self-join
stage reuses the layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical(edges: DataFrame, src: str, dst: str) -> DataFrame:
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("src"),
            F.greatest(F.col(src), F.col(dst)).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates()
    )


def edge_support(e: DataFrame) -> DataFrame:
    """Per-edge triangle support over a canonical (src<dst) edge list:
    (src, dst, support) — edges in no triangle get no row."""
    ab = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    ac = e.select(F.col("src").alias("a2"), F.col("dst").alias("c"))
    bc = e.select(F.col("src").alias("b2"), F.col("dst").alias("c2"))
    tri = (
        ab.join(ac, (F.col("a") == F.col("a2")) & (F.col("b") < F.col("c")))
        .join(bc, (F.col("b2") == F.col("b")) & (F.col("c2") == F.col("c")))
        .select("a", "b", "c")
    )
    sides = (
        tri.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionAll(tri.select(F.col("a").alias("src"), F.col("c").alias("dst")))
        .unionAll(tri.select(F.col("b").alias("src"), F.col("c").alias("dst")))
    )
    return sides.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("support"))


def ktruss(
    edges: DataFrame,
    k: int = 4,
    max_rounds: int = 30,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Peel to the k-truss fixed point; returns the surviving canonical
    edges with their within-truss triangle support
    (src, dst, support)."""
    if k < 3:
        raise ValueError(f"k-truss requires k >= 3, got {k}")
    e = _canonical(edges, src, dst).persist()
    n = e.count()
    sup = None
    converged = False
    for _ in range(max_rounds):
        sup = edge_support(e)
        kept = (
            e.join(sup, ["src", "dst"], "left")
            .filter(F.coalesce(F.col("support"), F.lit(0)) >= k - 2)
            .select("src", "dst")
            .localCheckpoint()
        )
        n2 = kept.count()
        if n2 == n:
            e = kept
            converged = True
            break
        e = kept
        n = n2
    # On the converged exit the last sup was computed over exactly the
    # settled edge set (kept == e), so reuse it — the triangle join is
    # the operator's cost driver. Recompute only when the round cap
    # cut the peel short (e shrank after sup was taken).
    if sup is None or not converged:
        sup = edge_support(e)
    return e.join(sup, ["src", "dst"], "left").select(
        "src", "dst", F.coalesce(F.col("support"), F.lit(0)).alias("support")
    )
