"""Continuous (streaming) ETL ingestion of the raw-bindings landing
zone — the Structured Streaming face of the batch transformer.

The reference extracts, then transforms, in separate one-shot runs
(etl_run.py). Here the same clean/filter column expressions
(pipelines.transformer: clean_bindings + filter_edges) run as a file
stream over the landing directory: every new ``raw_data_*.json`` that
the extractor (or the sparql_paginated DataSource job) drops is picked
up exactly once (checkpointed file index), cleaned, and appended to a
parquet edges table.

Dedup discipline: the stream APPENDS; cross-file dedup (D3 key
distinct + D5 reverse-edge canonicalization) runs as the periodic
batch compaction (``pipelines.transformer.build_edges``) over the
appended table — window-function dedup isn't expressible inside a
streaming query, and at 100 TB you want it amortized over many
micro-batches anyway (classic ingest-then-compact lakehouse layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from social_link_prediction_spark.pipelines.transformer import (
    clean_bindings,
    filter_edges,
)


def envelope_schema(spark: SparkSession, sample_path: str) -> StructType:
    """File streams require a fixed schema; infer it ONCE from a
    recorded sample batch (offline), then pin it for the stream."""
    return spark.read.option("multiLine", "true").json(sample_path).schema


def stream_raw_bindings(
    spark: SparkSession, landing_dir: str, schema: StructType
) -> DataFrame:
    """readStream over SPARQL result envelopes: one row per binding,
    ``var.value``-style columns — the streaming twin of
    sources.json_flatten.read_sparql_json."""
    raw = (
        spark.readStream.schema(schema)
        .option("multiLine", "true")
        .json(landing_dir)
    )
    rows = raw.select(F.explode(F.col("results.bindings")).alias("b"))
    b_schema = rows.schema["b"].dataType
    cols = []
    for field in b_schema.fields:  # type: ignore[union-attr]
        cols.append(F.col(f"b.{field.name}.value").alias(f"{field.name}.value"))
    return rows.select(*cols)


def clean_stream(bindings: DataFrame) -> DataFrame:
    """The transformer's P1-P7 clean/filter stages — pure column
    expressions, so the identical code path serves batch and stream."""
    return filter_edges(clean_bindings(bindings))


def start_ingest(
    bindings: DataFrame,
    out_path: str,
    checkpoint: str,
):
    """Append cleaned bindings to the parquet landing table with
    exactly-once file semantics (checkpointed source index + sink
    manifest). Returns the StreamingQuery."""
    return (
        clean_stream(bindings)
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
