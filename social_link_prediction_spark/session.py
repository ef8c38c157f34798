"""SparkSession factory tuned for both local testing and cluster scale.

The reference has no engine configuration at all (an eager pandas
pipeline); here the session IS the engine. Defaults follow the
100 TB design notes:

- AQE on: runtime coalescing of shuffle partitions, skew-join
  splitting, and dynamic broadcast decisions replace every hand-tuned
  batch size in the reference (``extractor.py:42-109`` page sizing,
  ``predicter.py:230`` decoder batching).
- Arrow on: every pandas-UDF boundary (unidecode, fuzzy scoring,
  embedding) is vectorized.
- shuffle partitions default to cores locally; on a real cluster set
  ``spark.sql.shuffle.partitions`` ~ 2-3x total cores (AQE coalesces
  down, it never splits up a too-small setting).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "social-link-prediction-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine session.

    ``master``/``shuffle_partitions`` default from ``SPARK_GRAFT_CPUS``
    so the driver's bench harness and local tests share one code path.
    On a real cluster, pass ``master=None`` with ``spark.master`` set
    by the submitter and a shuffle-partition count sized to the fleet.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "4"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: coalesce small shuffle partitions, split skewed ones,
        # convert to broadcast joins at runtime when a side turns out small.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for every pandas UDF / toPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Sane scan granularity: 128 MB splits keep 100 TB ≈ 800k tasks,
        # large enough to amortize task overhead, small enough to fit
        # executor memory with room for shuffle buffers.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Timestamps in parquet written/read as microseconds, UTC.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    # Deployment-specific overrides without a code change (e.g. cluster
    # shuffle sizing, join-strategy preferences): semicolon-separated
    # key=value pairs. Applied before extra_conf so programmatic callers
    # still win.
    # Note: values containing ';' cannot be expressed through this hook.
    env_conf = os.environ.get("SPARK_GRAFT_CONF", "")
    for pair in filter(None, (p.strip() for p in env_conf.split(";"))):
        key, sep, value = pair.partition("=")
        if not sep or not key.strip() or not value.strip():
            # a bare key would silently set the conf to "" and
            # misconfigure Spark with no diagnostic — fail loudly
            raise ValueError(
                f"SPARK_GRAFT_CONF: malformed pair {pair!r} "
                "(expected ';'-separated key=value entries)"
            )
        builder = builder.config(key.strip(), value.strip())
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()


def read_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one of the warehouse parquet tables (TESTDATA.md layout)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register every warehouse parquet table as a temp view so the
    whole catalog is queryable through plain ``spark.sql`` — the SQL
    twin of the DataFrame API (same Catalyst plans either way)."""
    from social_link_prediction_spark.queries import _t

    for name in tables:
        _t(spark, sf_dir, name).createOrReplaceTempView(name)
