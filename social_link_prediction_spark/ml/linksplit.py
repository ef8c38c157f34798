"""Leakage-safe link splits + negative sampling (M4/M5).

Reference: RandomLinkSplit with reverse-pair removal so an edge and
its rev_* twin never straddle train/test (train_model.py:371-402);
LinkNeighborLoader negative sampling at ratio 1.0-3.0
(train_model.py:203-214).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hash60(*cols: Column) -> Column:
    """Deterministic 60-bit uniform hash from md5 — chosen over
    xxhash64 because DuckDB computes the identical value, keeping the
    split and the sampler oracle-checkable end-to-end."""
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
    key = _hash60(
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
    """
    n_nodes = nodes.count()
    k = max(int(ratio), 1)
    # each positive spawns k corruption attempts with deterministic randomness
    attempts = positives.select(src, rel).withColumn(
        "__try", F.explode(F.sequence(F.lit(0), F.lit(k - 1)))
    )
    attempts = attempts.withColumn(
        "__pick",
        _hash60(F.col(src), F.col(rel), F.col("__try"), F.lit(str(seed))) % F.lit(n_nodes),
    )
    indexed = nodes.select(node_id).withColumn(
        "__idx", F.row_number().over(Window.orderBy(node_id)) - 1
    )
    negs = (
        attempts.join(indexed, attempts["__pick"] == indexed["__idx"])
        .select(F.col(src), F.col(node_id).alias(dst), F.col(rel))
        .join(positives.select(src, dst, rel), [src, dst, rel], "left_anti")
        .dropDuplicates([src, dst, rel])
        .withColumn("label", F.lit(0))
    )
    return positives.select(src, dst, rel).withColumn("label", F.lit(1)).unionByName(negs)
