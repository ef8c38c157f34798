"""Trajectory / event-sequence similarity.

The distributed-top-k-trajectory-similarity problem (cf. REPOSE,
ICDE 2021) reduced to its Spark-native core: represent each entity's
ordered event sequence by its set of order-preserving k-grams
(k=3 here), then score pairs by set Jaccard through an inverted-index
join — candidate pairs come only from shared grams, never from a
cross join.

Scale shape: the gram extraction is a per-entity window (one shuffle
keyed by entity); the pair stage is the same inverted-index +
stop-gram-cap discipline as pipelines/dedup.ngram_jaccard — with a
low-cardinality alphabet (few event types) gram posting lists are
dense, so EITHER sample entities deterministically (hash-threshold,
what the registered query does) OR cap posting lists / switch to
MinHash signatures over grams (pipelines/dedup.minhash) before the
join at full population scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sequence_trigrams(
    df: DataFrame,
    entity_col: str = "user_id",
    token_col: str = "event_type",
    order_cols: tuple[str, str] = ("ts", "event_id"),
) -> DataFrame:
    """Distinct order-preserving trigrams of each entity's token
    sequence: one window (partition entity, order by the deterministic
    order columns) + two leads + a distinct. Returns (id, tg)."""
    w = Window.partitionBy(entity_col).orderBy(*order_cols)
    g = df.select(
        F.col(entity_col).alias("id"),
        F.concat_ws(
            "|",
            F.col(token_col),
            F.lead(token_col, 1).over(w),
            F.lead(token_col, 2).over(w),
        ).alias("tg"),
        F.lead(token_col, 2).over(w).alias("__third"),
    )
    return g.filter(F.col("__third").isNotNull()).select("id", "tg").dropDuplicates()


def jaccard_pairs_topk(grams: DataFrame, k: int = 10) -> DataFrame:
    """Top-k most similar entity pairs by gram-set Jaccard. Inverted
    index: shared-gram counts per (a < b) pair, sizes attached by two
    small joins, jac = shared / (|A| + |B| - shared). Rounded to 6
    BEFORE ranking so the top-k cut is reproducible across engines.
    Returns (id_a, id_b, n_shared, jaccard) ordered desc."""
    sizes = grams.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a = grams.select(F.col("id").alias("id_a"), "tg")
    b = grams.select(F.col("id").alias("id_b"), "tg")
    shared = (
        a.join(b, "tg")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    na = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb"))
    return (
        shared.join(F.broadcast(na), "id_a")
        .join(F.broadcast(nb), "id_b")
        .select(
            "id_a",
            "id_b",
            "n_shared",
            F.round(
                F.col("n_shared") / (F.col("na") + F.col("nb") - F.col("n_shared")), 6
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "id_a", "id_b")
        .limit(k)
    )
