"""Candidate rewrite under A/B test: coloring_suppliers with every
eager localCheckpoint in the MIS loop replaced by a lazy persist —
measures how much of the entry is per-round job-launch overhead."""

from __future__ import annotations

from pyspark.sql import DataFrame

from social_link_prediction_spark import queries as q


def candidate(spark, sf_dir):
    orig = DataFrame.localCheckpoint
    DataFrame.localCheckpoint = lambda self, eager=True: self.persist()
    try:
        return q.QUERIES["coloring_suppliers"](spark, sf_dir)
    finally:
        DataFrame.localCheckpoint = orig
