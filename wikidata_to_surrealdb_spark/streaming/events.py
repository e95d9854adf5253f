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


def windowed_counts_stream_df(spark: SparkSession, events_path: str) -> DataFrame:
    """readStream from the events parquet -> 1h tumbling window counts
    with a 1h watermark (late data beyond that is dropped)."""
    import os

    schema = spark.read.parquet(events_path).schema
    # FileStreamSource wants a directory; point at the parent with a glob
    # filter so a single-file "table" works too.
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "8")
        .option("pathGlobFilter", os.path.basename(events_path))
        .parquet(os.path.dirname(events_path))
    )
    # nanos-as-long parquet: restore a proper event-time column
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.unix_timestamp(F.col("window.start")).alias("hour_start"),
            "event_type",
            F.col("n_events").cast("bigint").alias("n_events"),
        )
    )


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
