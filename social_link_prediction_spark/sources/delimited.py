"""Delimited / JSONL ingestion with explicit schemas and corrupt-row
capture.

The reference ingests only its own SPARQL JSON exports; a production
extraction pipeline also lands third-party CSV/JSONL drops, and at
100 TB the two non-negotiables are (1) an EXPLICIT schema — schema
inference is a full extra pass over the data and can silently flip a
column's type between drops — and (2) PERMISSIVE parsing with the
corrupt raw line captured in a side column, so one bad row quarantines
instead of failing the job (badRecords quarantine pattern).

Both readers return (clean_df, quarantine_df): quarantine carries the
raw offending line + input file for triage, clean is schema-typed with
the capture column dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _with_capture(schema: StructType) -> StructType:
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"schema already contains {CORRUPT_COL}")
    return StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])


def _split(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    # Spark only materializes _corrupt_record if the frame is
    # materialized from the source with the column selected; cache the
    # raw parse once so clean/quarantine are two filters on one scan.
    raw = raw.withColumn("_input_file", F.input_file_name()).cache()
    quarantine = raw.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line"), "_input_file"
    )
    clean = raw.filter(F.col(CORRUPT_COL).isNull()).drop(
        CORRUPT_COL, "_input_file"
    )
    return clean, quarantine


def read_csv_clean(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """CSV with explicit schema; malformed rows (wrong arity, untypable
    values) land in the quarantine frame instead of failing the job."""
    raw = (
        spark.read.schema(_with_capture(schema))
        .option("header", header)
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )
    return _split(raw)


def read_jsonl_clean(
    spark: SparkSession, path: str, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines with explicit schema and corrupt-line quarantine."""
    raw = (
        spark.read.schema(_with_capture(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    return _split(raw)
