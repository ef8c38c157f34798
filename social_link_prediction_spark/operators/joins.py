"""Join helpers (SURVEY.md §2.3, J1–J10).

Most reference joins are plain equi-joins Catalyst handles natively;
these helpers encode the join *strategy* decisions (broadcast the
dimension, semi/anti for membership) that matter at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def enrich(
    fact: DataFrame, dim: DataFrame, on: str | Sequence[str], broadcast_dim: bool = True
) -> DataFrame:
    """J1/J2/J3: left-join enrichment. Dimension side broadcast by
    default — at 100 TB the fact table must never shuffle for a lookup
    that fits in executor memory.
    """
    right = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(right, on=on, how="left")


def exists_in(df: DataFrame, other: DataFrame, on: Sequence[str]) -> DataFrame:
    """J8: membership probe = left semi join (no row multiplication,
    right side only ships join keys)."""
    return df.join(other, on=list(on), how="left_semi")


def not_exists_in(df: DataFrame, other: DataFrame, on: Sequence[str]) -> DataFrame:
    """J9: taboo filter = left anti join."""
    return df.join(other, on=list(on), how="left_anti")


def symmetric_exists(
    pairs: DataFrame,
    edges: DataFrame,
    pair_src: str,
    pair_dst: str,
    edge_src: str,
    edge_dst: str,
) -> DataFrame:
    """J8 symmetric case: does an edge exist in either orientation?
    Canonicalize both sides with least/greatest, then semi-join once —
    half the probes of the reference's forward+backward double lookup.
    """
    p = pairs.withColumn("__a", F.least(F.col(pair_src), F.col(pair_dst))).withColumn(
        "__b", F.greatest(F.col(pair_src), F.col(pair_dst))
    )
    e = edges.select(
        F.least(F.col(edge_src), F.col(edge_dst)).alias("__a"),
        F.greatest(F.col(edge_src), F.col(edge_dst)).alias("__b"),
    ).dropDuplicates()
    return p.join(e, on=["__a", "__b"], how="left_semi").drop("__a", "__b")
