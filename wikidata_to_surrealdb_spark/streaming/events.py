"""Structured Streaming over the events table.

The reference has no streaming surface (SURVEY §2A note) — this is part
of the driver-mandated extension set. Batch twins of these ops live in
plans/queries.py (events_window / events_sessionize) so every streaming
result is oracle-checkable against the same SQL.

Design for scale: file-source streaming with `maxFilesPerTrigger` gives
bounded micro-batches; watermarks bound state; the windowed aggregation
state is per (window, event_type) — tiny. Sessionization's stateful twin
would use applyInPandasWithState keyed by user_id; here the batch form is
canonical and the streaming window agg demonstrates the
readStream -> watermark -> agg -> sink wiring.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _event_stream_source(
    spark: SparkSession, events_path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """readStream source for an events parquet table, whether the path is
    a Spark-written directory (events.parquet/part-*.parquet) or a single
    flat file.

    FileStreamSource wants a directory. A directory path streams directly;
    only a single-FILE path uses the dirname + pathGlobFilter=basename
    trick — applying that trick to a directory would glob for leaf files
    named like the directory and silently match nothing (the batch schema
    probe still succeeds, so no error would surface).
    """
    import os

    schema = spark.read.parquet(events_path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if os.path.isdir(events_path):
        stream = reader.parquet(events_path)
    else:
        stream = reader.option(
            "pathGlobFilter", os.path.basename(events_path)
        ).parquet(os.path.dirname(events_path))
    # nanos-as-long parquet: restore a proper event-time column
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def windowed_counts_stream_df(spark: SparkSession, events_path: str) -> DataFrame:
    """readStream from the events parquet -> 1h tumbling window counts
    with a 1h watermark (late data beyond that is dropped)."""
    stream = _event_stream_source(spark, events_path, max_files_per_trigger=8)
    return apply_windowed_counts(stream)


def apply_windowed_counts(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """1h tumbling-window counts with an event-time watermark. In append
    mode a window only emits once the watermark passes its end, and events
    arriving later than the watermark are dropped — the bounded-state
    contract that keeps this runnable forever at scale."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("hour_start"),
            "event_type",
            F.col("n_events").cast("bigint").alias("n_events"),
        )
    )


SESSION_SCHEMA = "user_id bigint, session_id bigint, n_events bigint, duration_sec bigint, session_value double"
# state carries the OPEN session's running aggregates, not just a cursor:
# a session spanning micro-batches must resume its counts, and value is
# kept in exact integer cents so resumed sums stay decimal-exact.
_STATE_SCHEMA = "session_id bigint, n_events bigint, min_us bigint, last_us bigint, cents bigint"


def sessionize_stateful_stream_df(
    spark: SparkSession, events_path: str, gap_sec: int = 1800
) -> DataFrame:
    """Custom stateful streaming operator: 30-min-gap sessionization via
    ``applyInPandasWithState`` keyed by user_id.

    State per user = the OPEN session's running aggregates (ordinal, count,
    min/max event time, exact value cents), so a session spanning
    micro-batches resumes where it left off — the update stream re-emits
    that session with its cumulative totals, and the LAST emission per
    (user_id, session_id) equals the batch sessionization (events must
    arrive time-ordered across batches, the file-source contract here).
    With a single availableNow batch the emitted rows ARE the batch
    sessionization, so the events_sessionize DuckDB oracle applies
    verbatim. At scale, state is O(users), the only shuffle is the hash
    exchange on user_id, and Arrow batches bound executor memory.
    """
    stream = _event_stream_source(spark, events_path)
    events = stream.select(
        "user_id", F.unix_micros("ts").alias("us"), "value"
    )
    return apply_sessionize(events, gap_sec=gap_sec)


def apply_sessionize(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """Wire the stateful sessionizer onto a prepared streaming DataFrame
    with columns (user_id, us: bigint micros, value). Split out so tests
    can drive it from a multi-file (multi-batch) source."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def sessionize(key, pdf_iter, state: GroupState):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            session_id, n_events, min_us, last_us, cents = state.get
            cur = [n_events, min_us, last_us, cents]
        else:
            session_id, last_us, cur = 0, None, None
        rows = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values("us")
            for us, value in zip(pdf["us"], pdf["value"]):
                us = int(us)
                if last_us is None or us - last_us > gap_sec * 1_000_000:
                    if cur is not None:
                        rows.append((user_id, session_id, *cur))
                    session_id += 1
                    cur = [0, us, us, 0]
                cur[0] += 1
                cur[2] = us
                # exact cents so the decimal-sum oracle reproduces bit-for-bit
                cur[3] += round(float(value) * 100)
                last_us = us
        if cur is not None:
            # snapshot of the still-open session: cumulative, re-emitted
            # (and superseded) if a later batch extends it
            rows.append((user_id, session_id, *cur))
            state.update((session_id, cur[0], cur[1], cur[2], cur[3]))
        yield pd.DataFrame(
            {
                "user_id": [r[0] for r in rows],
                "session_id": [r[1] for r in rows],
                "n_events": [r[2] for r in rows],
                "duration_sec": [(r[4] - r[3]) // 1_000_000 for r in rows],
                "session_value": [r[5] / 100.0 for r in rows],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        sessionize,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_stateful_streaming(
    spark: SparkSession, events_path: str, gap_sec: int = 1800
) -> DataFrame:
    """Run the stateful sessionizer to completion (availableNow, single
    batch) into a memory sink and return the materialized sessions."""
    table = f"stream_sessions_{uuid.uuid4().hex[:8]}"
    q = (
        sessionize_stateful_stream_df(spark, events_path, gap_sec)
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table)


def event_dedup_stream_df(
    spark: SparkSession, events_path: str, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact-dedup: collapse each (user, event_type, hour) to
    its first event — the streaming twin of the batch events_dedup.

    Keep-first is expressed as a watermarked streaming AGGREGATION
    (min(event_id) per key) rather than ``dropDuplicates``:
    dropDuplicates keeps whichever row a task sees first, which is
    nondeterministic once the source splits across partitions, while
    min() is order-independent — so the emitted rows equal the batch
    oracle exactly. The watermark bounds state: a key's hour expires
    once event time passes it by the watermark delay.
    """
    stream = _event_stream_source(spark, events_path, max_files_per_trigger=8)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(
            "user_id", "event_type", F.date_trunc("hour", "ts").alias("hour")
        )
        .agg(F.min("event_id").alias("keep_event_id"), F.count("*").alias("collapsed"))
        .select(
            "user_id",
            "event_type",
            F.unix_timestamp("hour").alias("hour_start"),
            "keep_event_id",
            F.col("collapsed").cast("bigint").alias("collapsed"),
        )
    )


def event_dedup_streaming(spark: SparkSession, events_path: str) -> DataFrame:
    """Run the streaming dedup to completion (availableNow, complete
    mode) into a memory sink — batch-equivalent, so the events_dedup
    oracle applies verbatim."""
    table = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    q = (
        event_dedup_stream_df(spark, events_path)
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table)


def stream_to_parquet(
    result: DataFrame,
    out_path: str,
    checkpoint: str,
    output_mode: str = "append",
) -> None:
    """Run a streaming result to completion (availableNow) into a parquet
    file sink with a checkpoint — the production sink shape.

    Exactly-once comes from the pair: the checkpoint records which source
    files each batch consumed, and the file sink's _spark_metadata commit
    log records which output files each batch produced; a restart replays
    neither. Stopping mid-run and restarting with the same checkpoint
    resumes from the last committed batch (tested in test_streaming.py).
    """
    q = (
        result.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def windowed_counts_streaming(spark: SparkSession, events_path: str) -> DataFrame:
    """Run the stream to completion (availableNow) into a memory sink and
    return the materialized result — batch-equivalent by construction, so
    the events_window oracle applies."""
    table = f"stream_counts_{uuid.uuid4().hex[:8]}"
    q = (
        windowed_counts_stream_df(spark, events_path)
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table)
