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
    cosine_similarity,
    ivf_assign,
)


def ivf_cells(
    emb: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic cell assignment: nearest fixed centroid by cosine
    (first-best-wins on ties). Output: (id, v, cell)."""
    out = ivf_assign(emb, centroids, id_col=id_col, vec_col=vec_col)
    return out.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
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
    return model.transform(feat).select(
        "id", "v", F.col("prediction").alias("cell")
    )


def semantic_pairs(
    cells: DataFrame, threshold: float = 0.4
) -> DataFrame:
    """All within-cell pairs (id_a < id_b) with cosine >= threshold.
    Input: (id, v, cell) from a cell assigner. The join key is the
    cell, so the pair blowup is bounded by the largest cell — size
    cells (more centroids) before raising this threshold."""
    a, b = cells.alias("a"), cells.alias("b")
    cos = cosine_similarity(F.col("a.v"), F.col("b.v"))
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
