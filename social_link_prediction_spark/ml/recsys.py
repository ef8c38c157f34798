"""Matrix-factorization recommendations (MLlib ALS) — the model-based
twin of the memory-based item_item_cosine_topk catalog query.

Reference analog: the reference's recommender surface is a learned
link-prediction model ranked per node (ml/predict.recommend_topk /
scripts/predict.py top-k); ALS is the behavior-only counterpart a
large deployment runs when it has interactions but no features. MLlib
ALS is the distributed implementation (block-partitioned normal
equations), so the engine side is a thin, deterministic-seeded wrapper
plus the two serving shapes a product needs:

  - per-user top-k (recommendForUserSubset, flattened to rows);
  - item-item neighbors from the learned item factors (cosine over a
    broadcastable |items| x rank frame — rank is ~10-100, so the
    factor table is dimension-table sized even at 100 TB of
    interactions).

Model persistence goes through MLlib save/load like the link model
(M12 embedding store discipline). Seeded fits are deterministic, so
tests pin ranking structure, not just shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def train_als(
    ratings: DataFrame,
    rank: int = 8,
    max_iter: int = 10,
    reg: float = 0.1,
    implicit: bool = False,
    seed: int = 7,
    user_col: str = "user",
    item_col: str = "item",
    rating_col: str = "rating",
):
    """Fit MLlib ALS with a pinned seed. ``implicit=True`` switches to
    the implicit-feedback objective (Hu/Koren/Volinsky 2008) for
    view/click-strength matrices with no explicit ratings."""
    from pyspark.ml.recommendation import ALS

    als = ALS(
        rank=rank,
        maxIter=max_iter,
        regParam=reg,
        implicitPrefs=implicit,
        seed=seed,
        userCol=user_col,
        itemCol=item_col,
        ratingCol=rating_col,
        coldStartStrategy="drop",
        nonnegative=False,
    )
    return als.fit(ratings)


def recommend_items(model, users: DataFrame, k: int = 5) -> DataFrame:
    """Per-user top-k as flat (user, item, score, rk) rows — the
    nested recommendForUserSubset array exploded and re-ranked with a
    deterministic (score desc, item asc) tie-break, scores rounded
    BEFORE ranking (the ranking_metrics discipline)."""
    recs = model.recommendForUserSubset(users, k)
    user_col = model.getUserCol()
    flat = recs.select(
        F.col(user_col).alias("user"),
        F.explode("recommendations").alias("r"),
    ).select(
        "user",
        F.col("r.*"),
    )
    item_col, score_col = [c for c in flat.columns if c != "user"]
    flat = flat.select(
        "user",
        F.col(item_col).alias("item"),
        F.round(F.col(score_col), 6).alias("score"),
    )
    w = Window.partitionBy("user").orderBy(F.col("score").desc(), F.col("item"))
    return flat.withColumn("rk", F.row_number().over(w))


def similar_items(model, k: int = 5) -> DataFrame:
    """Item-item neighbors by cosine over the learned item factors.
    The factor frame is |items| x rank — dimension-table sized — so
    the pair join broadcasts one side; top-k per item with rounded
    scores and a deterministic tie-break."""
    f = model.itemFactors.select(
        F.col("id").alias("item"), F.col("features").alias("v")
    )
    norm = F.sqrt(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x))
    f = f.withColumn("n", norm)
    a = f.select(
        F.col("item").alias("ia"), F.col("v").alias("va"), F.col("n").alias("na")
    )
    b = f.select(
        F.col("item").alias("ib"), F.col("v").alias("vb"), F.col("n").alias("nb")
    )
    pairs = a.join(F.broadcast(b), F.col("ia") != F.col("ib"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda a_, x: a_ + x
    )
    scored = pairs.select(
        F.col("ia").alias("item"),
        F.col("ib").alias("neighbor"),
        F.round(dot / (F.col("na") * F.col("nb")), 6).alias("cosine"),
    )
    w = Window.partitionBy("item").orderBy(F.col("cosine").desc(), F.col("neighbor"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
