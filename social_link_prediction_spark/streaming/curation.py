"""Streaming corpus curation: the batch curation funnel (quality gate
→ PII scrub → exact dedup) as a continuous pipeline over a document
landing zone.

Layout mirrors streaming/ingest.py's ingest-then-compact discipline:
the STREAM runs the stages that are pure column expressions or
bounded-state (quality rules, scrub regexes, watermarked exact dedup
on the content hash); the unbounded-state stages (near-dup pair
joins, clustering) run as the periodic batch compaction over the
appended table — pipelines.dedup / pipelines.semdedup unchanged.
That split is the 100 TB shape too: per-micro-batch work stays
O(batch), corpus-wide joins amortize over many batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from social_link_prediction_spark.pipelines.text import quality_filter, scrub_pii

DOC_SCHEMA = "doc_id long, text string, lang string, source string, event_ts timestamp"


def read_document_stream(
    spark: SparkSession, landing_dir: str, schema: str = DOC_SCHEMA
) -> DataFrame:
    """File stream over JSONL document drops (one JSON doc per line).
    Schema is pinned (file streams can't infer)."""
    return spark.readStream.schema(schema).json(landing_dir)


def curate_stream(
    docs: DataFrame,
    watermark: str = "1 hour",
) -> DataFrame:
    """Quality gate → PII scrub → exact dedup, streaming-safe:

    - quality_filter / scrub_pii are stateless projections (identical
      code path as batch — Structured Streaming's core contract);
    - exact dedup keys on md5 of the SCRUBBED text via
      ``dropDuplicatesWithinWatermark``, so redelivered or re-crawled
      identical documents within the watermark collapse while state
      stays bounded (a hash is remembered only until the watermark
      passes its event time — never forever).

    Returns the curated append stream: kept, scrubbed, deduplicated
    documents with their quality features. Batch inputs take the
    plain ``dropDuplicates`` path, so the same call is the backfill.
    """
    scrubbed = scrub_pii(docs, col="text", out="text_scrubbed")
    gated = (
        quality_filter(scrubbed.withColumn("text", F.col("text_scrubbed")))
        .filter(F.col("keep") == 1)
        .withColumn("content_hash", F.md5("text_scrubbed"))
        .drop("text")
    )
    if gated.isStreaming:
        return gated.withWatermark("event_ts", watermark).dropDuplicatesWithinWatermark(
            ["content_hash"]
        )
    return gated.dropDuplicates(["content_hash"])


def start_curation(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
):
    """Wire the curated stream to an exactly-once parquet append
    (checkpointed file index + sink commit log). Compaction —
    near-dup dedup over the appended table with pipelines.dedup /
    semdedup — runs as a separate periodic batch job."""
    curated = curate_stream(read_document_stream(spark, landing_dir), watermark)
    return (
        curated.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
