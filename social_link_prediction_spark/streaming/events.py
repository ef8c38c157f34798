"""Streaming event processing.

Design: transformations are written once against a DataFrame and work
for both batch (spark.read) and streaming (spark.readStream) inputs —
the Structured Streaming contract. Watermarks bound state for late
data; windowed aggregations use event time, never arrival time.

At scale: the file source here stands in for Kafka; swap
``spark.readStream.format("kafka")`` and the pipeline below is
unchanged (the reference's incremental paginated extraction, S1-S3,
maps to exactly this shape — each page/interval is a micro-batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType, TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str, fmt: str = "json") -> DataFrame:
    """File-based event stream (one file per micro-batch in tests;
    a Kafka topic in production)."""
    return spark.readStream.format(fmt).schema(EVENT_SCHEMA).load(path)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time window counts per event type. The watermark
    bounds aggregation state: events later than ``watermark`` are
    dropped, everything else is handled correctly — the late-data
    semantics the reference never had."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def high_value_alerts(events: DataFrame, threshold: float = 100.0) -> DataFrame:
    """Stateless streaming filter+projection (works identically in batch)."""
    return events.filter(F.col("value") > threshold).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


def dedup_event_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """At-least-once source → effectively-once events: drop redelivered
    duplicates by key. Streaming uses ``dropDuplicatesWithinWatermark``
    so the dedup state is bounded — a key is remembered only until the
    watermark passes its event time, not forever (plain streaming
    ``dropDuplicates`` state grows without bound on an infinite stream).
    Batch input takes the ordinary ``dropDuplicates`` path, so the same
    call is the replay/backfill job.

    The reference's analog is the page-overlap dedup between paginated
    SPARQL fetches (transformer.py dedup of re-fetched rows, SURVEY
    §2.6 D2/D3) — here it is incremental instead of a full-table pass.
    """
    keys = keys or ["event_id"]
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def enrich_with_dimension(
    events: DataFrame,
    dim: DataFrame,
    on: str = "user_id",
    how: str = "left",
) -> DataFrame:
    """Stream-static join: decorate the event stream with a slowly
    changing dimension table (user profile, node attributes). The static
    side is re-read per micro-batch and broadcast — no streaming state
    at all, which is why this beats stream-stream joins whenever the
    dimension fits the broadcast budget. Same J1-J4 enrichment semantics
    as ``operators/joins.enrich`` (SURVEY §2.3), lifted to streams.
    """
    return events.join(F.broadcast(dim), on, how)


SESSION_STATE_SCHEMA = "user_id LONG, n_events LONG, total_value DOUBLE, last_ts TIMESTAMP"
SESSION_OUTPUT_SCHEMA = (
    "user_id LONG, n_events LONG, total_value DOUBLE, session_closed BOOLEAN"
)


def stateful_user_sessions(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running session accumulator (event count + value sum). A session
    closes when the processing-time timeout fires after ``gap_seconds``
    of silence — the custom-state analog of the batch ``sessionize``
    operator (operators/windows.py), for semantics a windowed agg can't
    express (open-ended sessions emitted on close).

    State per key is a single small tuple; the watermark bounds how
    long late events can mutate it. Output: one row per update, with
    ``session_closed`` marking timeout emissions.
    """
    import pandas as pd  # arrow-batched; only runs inside the operator
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            n, total, _ = state.get
            state.remove()
            yield pd.DataFrame(
                [{"user_id": user_id, "n_events": n, "total_value": total,
                  "session_closed": True}]
            )
            return
        n, total = 0, 0.0
        if state.exists:
            n, total, _ = state.get
        last_ts = None
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
            mx = pdf["ts"].max()
            last_ts = mx if last_ts is None else max(last_ts, mx)
        state.update((n, total, last_ts.to_pydatetime() if last_ts is not None else None))
        state.setTimeoutDuration(gap_seconds * 1000)
        yield pd.DataFrame(
            [{"user_id": user_id, "n_events": n, "total_value": total,
              "session_closed": False}]
        )

    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA.replace("user_id LONG, ", ""),
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def run_to_memory_sink(stream_df: DataFrame, name: str, mode: str = "complete"):
    """Test/debug sink: materialize a streaming aggregation into an
    in-memory table. Returns the StreamingQuery (caller awaits +
    stops)."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )


def sliding_event_rates(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding event-time windows: each event lands in window/slide
    overlapping windows (4 here), giving a smoothed per-type rate the
    tumbling variant can't. State size scales with windows-per-event ×
    active keys and is bounded by the watermark. Batch/stream parity by
    construction — ``F.window`` is the same expression in both."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # SUM, not avg: 2-dp-quantized values sum with ~1e-13 drift,
            # so round(,2) is engine-stable at any scale; an avg sits on
            # .xxxx5 rounding boundaries whenever counts divide evenly
            # and flips between engines' half-up/half-even modes
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def correlate_streams(
    clicks: DataFrame,
    purchases: DataFrame,
    join_window_seconds: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: pair each purchase with the same
    user's click that preceded it by at most ``join_window_seconds``
    (attribution). Both sides are watermarked and the join condition
    carries an explicit event-time range — that range is what lets
    Spark expire buffered rows, so state stays bounded; an equi-only
    stream-stream join would buffer both streams forever."""
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        F.col("user_id"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("user_id"),
        F.col("value").alias("purchase_value"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if purchases.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    return c.join(
        p,
        [
            c["user_id"] == p["user_id"],
            p["purchase_ts"] >= c["click_ts"],
            p["purchase_ts"] <= c["click_ts"] + F.expr(f"INTERVAL {join_window_seconds} SECONDS"),
        ],
    ).select(
        c["user_id"].alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


def session_window_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Native gap-session aggregation (F.session_window): one session
    row per (user, burst of activity), start = first event, end = last
    event + gap. Streaming mode is stateful with watermark-driven
    state eviction — sessions close when the watermark passes their
    end, which is how unbounded per-user state stays bounded at scale.
    Identical expression body batch and streaming (parity tested)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def trending_topk(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    k: int = 3,
) -> DataFrame:
    """Per-window trending top-k event types. Streaming top-k can't
    rank inside the incremental aggregation (ranks are only final when
    the window closes), so this is the standard two-stage shape: the
    watermarked windowed count IS the streaming stateful stage, and
    the rank-k cut runs on its APPEND output — here fused for batch
    and availableNow micro-batch runs, where every emitted window is
    already final. On a continuous stream, run windowed_event_counts
    as the stream and apply this ranking in foreachBatch (each closed
    window arrives exactly once past the watermark).

    Deterministic rank tie-break: (count desc, event_type asc).
    """
    counts = windowed_event_counts(events, window=window, watermark=watermark)
    return rank_windowed_counts(counts, k=k)


def rank_windowed_counts(counts: DataFrame, k: int = 3) -> DataFrame:
    """The rank-k cut of :func:`trending_topk`, separated so it can run
    over a sink table / inside foreachBatch (ranking is not a streaming
    operator — Structured Streaming rejects non-time windows on a
    streaming frame)."""
    w = Window.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("event_type").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("window_start", "rank", "event_type", "n_events")
    )


def start_upsert_sink(
    stream: DataFrame,
    path: str,
    key: str,
    order_col: str,
    checkpoint: str,
):
    """Streaming type-1 merge: maintain a keyed current-state parquet
    table from an append stream via foreachBatch — per micro-batch,
    reduce to the latest row per key (order_col desc, deterministic),
    then operators.merge.upsert into the table (anti-join + union,
    rewritten with a directory swap). Idempotent per batch — replaying
    a checkpointed batch re-applies the same latest-per-key rows, so
    exactly-once state follows from foreachBatch's at-least-once
    contract. The lakehouse CDC-apply shape; a real table format swaps
    the directory dance for a snapshot commit.
    """
    import os as _os
    import shutil as _shutil

    from social_link_prediction_spark.operators.merge import upsert

    tmp = path.rstrip("/") + "__upsert_tmp"
    old = path.rstrip("/") + "__upsert_old"

    def _recover() -> None:
        # Crash points in the swap below leave exactly two signatures:
        #   (a) died between rename(path→old) and rename(tmp→path):
        #       `old` holds the only copy of the state — put it back.
        #       The interrupted batch replays from the checkpoint, and
        #       the merge is idempotent, so no state is lost.
        #   (b) died before rmtree(old): the swap completed; `old` is
        #       garbage and must go or the next rename(path→old) fails.
        # A leftover `tmp` is always a partial/stale write — drop it.
        if _os.path.exists(old):
            if not _os.path.exists(path):
                _os.rename(old, path)  # (a)
            else:
                _shutil.rmtree(old)  # (b)
        if _os.path.exists(tmp):
            _shutil.rmtree(tmp)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _recover()
        spark = batch_df.sparkSession
        w = Window.partitionBy(key).orderBy(
            F.col(order_col).desc(), *[F.col(c) for c in batch_df.columns]
        )
        latest = (
            batch_df.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") == 1)
            .drop("__r")
        )
        if _os.path.exists(path):
            current = spark.read.parquet(path)
            merged = upsert(current, latest, key)
        else:
            merged = latest
        merged.write.mode("overwrite").parquet(tmp)
        if _os.path.exists(path):
            _os.rename(path, old)
            _os.rename(tmp, path)
            _shutil.rmtree(old)
        else:
            _os.rename(tmp, path)

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .start()
    )
