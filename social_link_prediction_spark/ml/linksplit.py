"""Leakage-safe link splits + negative sampling (M4/M5).

Reference: RandomLinkSplit with reverse-pair removal so an edge and
its rev_* twin never straddle train/test (train_model.py:371-402);
LinkNeighborLoader negative sampling at ratio 1.0-3.0
(train_model.py:203-214).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# node-count pivot between the one-task window index (cheapest when the
# table fits one sort) and the range-partitioned scalable index
_SCALABLE_INDEX_MIN = 1_000_000


def hash60(*cols: Column) -> Column:
    """Deterministic 60-bit uniform hash from md5 — chosen over
    xxhash64 because DuckDB computes the identical value, keeping the
    split and the sampler oracle-checkable end-to-end. The single
    engine-side twin of queries._DUCK_H60 — every oracle-replayable
    hash (link split, negative/weighted/stratified samplers, k-fold,
    harmonic seed set) goes through here."""
    return F.conv(
        F.substring(F.md5(F.concat_ws("\x1f", *cols)), 1, 15), 16, 10
    ).cast("bigint")


def link_split(
    edges: DataFrame,
    val_frac: float = 0.005,
    test_frac: float = 0.005,
    seed: int = 42,
    src: str = "src",
    dst: str = "dst",
    rel: str = "rel",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """M4: split edges into train/val/test with reverse-leakage safety:
    the split key is the CANONICAL undirected pair, so A->B and B->A
    land in the same bucket. Deterministic via hash(key, seed), not
    randSplit — re-runs and retries produce identical splits.
    """
    key = hash60(
        F.least(F.col(src), F.col(dst)),
        F.greatest(F.col(src), F.col(dst)),
        F.col(rel),
        F.lit(str(seed)),
    )
    tagged = edges.withColumn("__frac", (key % F.lit(1_000_000)) / 1_000_000.0)
    test = tagged.filter(F.col("__frac") < test_frac).drop("__frac")
    val = tagged.filter(
        (F.col("__frac") >= test_frac) & (F.col("__frac") < test_frac + val_frac)
    ).drop("__frac")
    train = tagged.filter(F.col("__frac") >= test_frac + val_frac).drop("__frac")
    return train, val, test


def negative_sample(
    positives: DataFrame,
    nodes: DataFrame,
    ratio: float = 1.0,
    seed: int = 42,
    src: str = "src",
    dst: str = "dst",
    rel: str = "rel",
    node_id: str = "id",
) -> DataFrame:
    """M5: corrupt the dst endpoint of each positive with a uniformly
    sampled node, then anti-join against true edges so no negative is
    secretly positive. One shuffle for the sample join (both sides
    keyed by a random index), one anti-join.

    The dense node index (rank by id) has two physically different
    builds with identical output: below ``_SCALABLE_INDEX_MIN`` nodes,
    a plain global ``Window.orderBy`` (one task sorting a small table —
    cheapest, no extra jobs); above it, range partitioning +
    per-partition row_number + driver-side offsets, because the global
    window funnels every node through ONE task — a non-starter on a
    billion-node table. Ranges are disjoint and ordered, so both equal
    ``row_number() OVER (ORDER BY id)`` and the oracle is unchanged.
    """
    n_nodes = nodes.count()
    k = max(int(ratio), 1)
    # each DISTINCT (src, rel) spawns k corruption attempts with
    # deterministic randomness. Dedup BEFORE the explode: the pick is a
    # pure function of (src, rel, try, seed), so duplicated positives
    # would generate byte-identical attempts only to be dropped by the
    # final dropDuplicates — deduping first shrinks every downstream
    # join/anti-join from |positives| to |distinct srcs| rows.
    attempts = positives.select(src, rel).dropDuplicates().withColumn(
        "__try", F.explode(F.sequence(F.lit(0), F.lit(k - 1)))
    )
    attempts = attempts.withColumn(
        "__pick",
        hash60(F.col(src), F.col(rel), F.col("__try"), F.lit(str(seed))) % F.lit(n_nodes),
    )
    if n_nodes < _SCALABLE_INDEX_MIN:
        indexed = F.broadcast(
            nodes.select(node_id).withColumn(
                "__idx", F.row_number().over(Window.orderBy(node_id)) - 1
            )
        )
    else:
        n_parts = max(
            nodes.sparkSession.sparkContext.defaultParallelism,
            32,
            n_nodes // 2_000_000,
        )
        # eager localCheckpoint: the ranged frame is consumed twice
        # (per-partition counts + the window scan) and
        # repartitionByRange's sampled boundaries are not stable
        # across re-executions — without pinning one materialization
        # the offsets can disagree with the assignment (the r8
        # global_row_number lesson; see operators/windows.py)
        ranged = (
            nodes.select(node_id)
            .repartitionByRange(n_parts, F.col(node_id))
            .withColumn("__p", F.spark_partition_id())
            .localCheckpoint(eager=True)
        )
        rn = F.row_number().over(Window.partitionBy("__p").orderBy(node_id))
        within = ranged.withColumn("__rn", rn)
        # partition offsets: P tiny rows to the driver, re-joined as a literal map
        part_counts = sorted(
            (r["__p"], r["cnt"])
            for r in ranged.groupBy("__p").agg(F.count(F.lit(1)).alias("cnt")).collect()
        )
        offsets, acc = {}, 0
        for p, cnt in part_counts:
            offsets[p] = acc
            acc += cnt
        offset_map = F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        )
        indexed = within.select(
            node_id, (offset_map[F.col("__p")] + F.col("__rn") - 1).alias("__idx")
        )
    negs = (
        attempts.join(indexed, attempts["__pick"] == indexed["__idx"])
        .select(F.col(src), F.col(node_id).alias(dst), F.col(rel))
        .join(positives.select(src, dst, rel), [src, dst, rel], "left_anti")
        .dropDuplicates([src, dst, rel])
        .withColumn("label", F.lit(0))
    )
    return positives.select(src, dst, rel).withColumn("label", F.lit(1)).unionByName(negs)
