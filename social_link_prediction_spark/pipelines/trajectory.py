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


def enriched_tokens(
    df: DataFrame,
    entity_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    max_gap_bucket: int = 9,
) -> DataFrame:
    """Event tokens enriched with a log2 inter-arrival bucket:
    ``type#b`` where b = min(floor(log2(gap_seconds + 1)), cap), and
    ``type#s`` for each entity's first event. With a handful of raw
    event types, plain type-trigrams live in a tiny (|types|³) gram
    universe — every active entity shares most grams and MinHash
    buckets degenerate. The timing bucket multiplies the alphabet by
    ~(cap+2) while staying deterministic and integer-derived, so the
    gram space is sparse enough for LSH to discriminate. floor(log2)
    over integers is cross-engine stable: an integer's log2 is only
    ulp-close to an integer at exact powers of two, where it is exact.

    Returns (id, tok) plus the pass-through order columns."""
    from social_link_prediction_spark.operators.windows import epoch_us

    w = Window.partitionBy(entity_col).orderBy(*order_cols)
    gap_s = (epoch_us(F.col(ts_col)) - F.lag(epoch_us(F.col(ts_col)), 1).over(w)) / F.lit(
        1_000_000
    )
    bucket = F.least(
        F.floor(F.log2(F.floor(gap_s) + F.lit(1))), F.lit(max_gap_bucket)
    ).cast("int")
    tok = F.when(
        F.lag(ts_col, 1).over(w).isNull(), F.concat(F.col(type_col), F.lit("#s"))
    ).otherwise(F.concat(F.col(type_col), F.lit("#"), bucket.cast("string")))
    return df.select(
        F.col(entity_col).alias("id"), tok.alias("tok"), *[F.col(c) for c in order_cols]
    )


def minhash_trajectory_topk(
    grams: DataFrame,
    k_hashes: int = 8,
    rows_per_band: int = 2,
    max_bucket: int = 1000,
    k: int = 10,
) -> DataFrame:
    """Full-population top-k trajectory similarity: MinHash signatures
    over each entity's gram set, banded LSH candidate generation with
    the stop-bucket cap, then EXACT Jaccard verification on the
    candidates only and a deterministic top-k cut (round to 6 before
    ranking; ties broken by ids). This is the scale path the sampled
    inverted-index query documents: no step ever touches all pairs —
    signatures are one map-side-combinable min-aggregate per entity
    (K hex strings of shuffle per entity), candidates come from band
    buckets bounded by ``max_bucket``, and the verify join runs only
    over candidate pairs' gram sets.

    ``grams``: (id, tg) distinct rows (from :func:`sequence_trigrams`,
    ideally over :func:`enriched_tokens`). Returns
    (id_a, id_b, n_shared, jaccard)."""
    from social_link_prediction_spark.pipelines.dedup import lsh_candidate_pairs

    sig = grams.groupBy("id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("tg")))).alias(f"mh{i}")
            for i in range(k_hashes)
        ]
    )
    cand = lsh_candidate_pairs(
        sig, id_col="id", k=k_hashes, rows_per_band=rows_per_band, max_bucket=max_bucket
    )
    sizes = grams.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    # shared grams of each candidate pair: fan the pair list out to
    # id_a's grams, then equi-join id_b's grams on (id_b, tg).
    a = grams.select(F.col("id").alias("id_a"), "tg")
    b = grams.select(F.col("id").alias("id_b"), "tg")
    shared = (
        cand.join(a, "id_a")
        .join(b, ["id_b", "tg"])
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
