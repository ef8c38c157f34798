"""Semantic deduplication (SemDeDup-style) over an embedding column.

Cluster the corpus coarsely, then compare embeddings ONLY within a
cluster and drop all but one representative of every near-identical
group (Abbas et al., "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication", arXiv:2303.09540). The cluster stage
bounds the pair join exactly like LSH banding bounds MinHash: the
cross product is per-cell, never corpus-wide, so a 100 TB embedding
table with a balanced K-way partition costs sum_k C(n_k, 2) instead
of C(N, 2).

Two clusterers are provided:

- :func:`ivf_cells` — deterministic nearest-centroid assignment over a
  FIXED centroid list (pipelines.similarity.ivf_assign). Deterministic
  and SQL-expressible, so the oracle gate can replay it; this is what
  the registered queries use.
- :func:`kmeans_cells` — MLlib KMeans for real workloads where
  centroids are learned, not fixed. Same downstream shape; seeded, but
  not oracle-replayable (iterative argmin is not reasonable SQL).

At 100 TB: write the corpus ``partitionBy(cell)`` once, then the
within-cell join is partition-local (no shuffle of the big side), and
each cell's pair block is independently parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from social_link_prediction_spark.pipelines.similarity import (
    dot,
    ivf_assign,
    l2_norm,
)


def ivf_cells(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic cell assignment: nearest fixed centroid by cosine
    (first-best-wins on ties). Output: (id, v, cell) where v is the
    L2-NORMALIZED vector — normalizing once per row lets the pair
    stage score with a single dot product instead of dot + two norms
    per pair (3x less per-pair HOF work; the pair stage, not this
    projection, is the quadratic part)."""
    out = ivf_assign(emb, centroids, id_col=id_col, vec_col=vec_col)
    v = F.col(vec_col).cast("array<double>")
    # hoist the norm to a column BEFORE the transform: referencing
    # l2_norm(v) inside the per-element lambda would re-evaluate the
    # 64-term aggregate once per element (64 norms per row)
    out = out.withColumn("__n", l2_norm(v))
    return out.select(
        F.col(id_col).alias("id"),
        F.transform(v, lambda x: x / F.col("__n")).alias("v"),
        F.col("ivf_cell").alias("cell"),
    )


def kmeans_cells(
    emb: DataFrame,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
) -> DataFrame:
    """Learned cell assignment via MLlib KMeans (the production path
    when no centroid codebook exists). One fit (sampled internally by
    MLlib), one transform; output matches :func:`ivf_cells`."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("features", array_to_vector("v"))
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(feat)
    out = model.transform(feat).withColumn("__n", l2_norm(F.col("v")))
    return out.select(
        "id",
        F.transform("v", lambda x: x / F.col("__n")).alias("v"),
        F.col("prediction").alias("cell"),
    )


def semantic_pairs(
    cells: DataFrame, threshold: float = 0.4, impl: str = "blas"
) -> DataFrame:
    """All within-cell pairs (id_a < id_b) with cosine >= threshold.
    Input: (id, v, cell) from a cell assigner, v L2-normalized. The
    cell bounds the pair blowup — size cells (more centroids) before
    raising this threshold.

    impl='blas' (default): one shuffle on cell, then a vectorized
    numpy Gram matrix per cell inside applyInPandas — dense linear
    algebra is the documented fast case for Arrow-batched pandas UDFs
    (a JVM higher-order-function dot runs the 64-term lambda
    INTERPRETED per pair: measured 3-10x slower than the matmul even
    at sf0.1). Row-blocked matmul bounds memory at O(block x n_cell).

    impl='sql': the pure-DataFrame self-join — no Python anywhere,
    useful where Arrow is unavailable; same output (pytest pins
    equality on the test corpus; both round to 6 decimals before the
    threshold so the float paths agree)."""
    if impl == "sql":
        a, b = cells.alias("a"), cells.alias("b")
        cos = dot(F.col("a.v"), F.col("b.v"))
        return (
            a.join(b, F.col("a.cell") == F.col("b.cell"))
            .filter(F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.cell").alias("cell"),
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.round(cos, 6).alias("cosine"),
            )
            .filter(F.col("cosine") >= threshold)
        )

    import numpy as np
    import pandas as pd

    id_field = cells.schema["id"].dataType.simpleString()
    out_schema = (
        f"cell int, id_a {id_field}, id_b {id_field}, cosine double"
    )

    def _score(pdf: pd.DataFrame) -> pd.DataFrame:
        # dtype-preserving empty frame (id may be int64 or string)
        empty = pd.DataFrame(
            {
                "cell": pd.Series(dtype="int64"),
                "id_a": pdf["id"].iloc[:0],
                "id_b": pdf["id"].iloc[:0],
                "cosine": pd.Series(dtype="float64"),
            }
        )
        n = len(pdf)
        if n < 2:
            return empty
        order = np.argsort(pdf["id"].to_numpy(), kind="stable")
        ids = pdf["id"].to_numpy()[order]
        m = np.vstack(pdf["v"].to_numpy()[order]).astype(np.float64)
        cell = int(pdf["cell"].iloc[0])
        outs = []
        block = 1024  # bounds the slab at O(block x n_cell)
        for lo in range(0, n, block):
            hi = min(lo + block, n)
            sims = np.round(m[lo:hi] @ m.T, 6)
            bi, bj = np.nonzero(sims >= threshold)
            keep = (bi + lo) < bj  # strict upper triangle: id_a < id_b
            bi, bj = bi[keep], bj[keep]
            if len(bi):
                outs.append(
                    pd.DataFrame(
                        {
                            "cell": cell,
                            "id_a": ids[bi + lo],
                            "id_b": ids[bj],
                            "cosine": sims[bi, bj],
                        }
                    )
                )
        if not outs:
            return empty
        return pd.concat(outs, ignore_index=True)

    return cells.groupBy("cell").applyInPandas(_score, out_schema)


def semantic_dedup(
    cells: DataFrame, threshold: float = 0.4
) -> DataFrame:
    """SemDeDup keep/drop decision: within each cell, a vector is
    DROPPED if any lower-id vector in the same cell is within
    ``threshold`` cosine — i.e. each near-group keeps exactly its
    minimum id (the same keep-lowest convention as neardup_clusters'
    ``is_canonical``). Output: (id, cell, keep) for every input row.

    The drop set derives from :func:`semantic_pairs` by projecting the
    larger id — one distinct over pair rows, no transitive closure
    needed for the keep-min-per-group rule under a fixed comparison
    radius (any dropped id has SOME kept-or-dropped lower neighbor;
    chained groups degrade to keep-per-chain-head, which is the
    documented SemDeDup epsilon-greedy behavior, not true clustering).
    """
    dropped = (
        semantic_pairs(cells, threshold)
        .select(F.col("id_b").alias("id"))
        .dropDuplicates()
        .withColumn("__drop", F.lit(1))
    )
    return (
        cells.join(dropped, "id", "left")
        .select(
            "id",
            "cell",
            F.when(F.col("__drop").isNull(), F.lit(1)).otherwise(F.lit(0)).alias("keep"),
        )
    )
