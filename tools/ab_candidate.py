"""Candidate: trajectory_minhash_topk with the trigram frame persisted
— it is referenced four times (signatures, sizes, both sides of the
verify join) and each branch otherwise re-executes the events scan +
two windows + distinct chain."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from social_link_prediction_spark.catalog.c01 import _t
from social_link_prediction_spark.pipelines import trajectory as ptraj


def candidate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    toks = ptraj.enriched_tokens(ev)
    grams = ptraj.sequence_trigrams(
        toks, entity_col="id", token_col="tok", order_cols=("ts", "event_id")
    ).persist()
    return ptraj.minhash_trajectory_topk(grams, k_hashes=8, rows_per_band=2, k=10)
