"""Event-time windowing — batch and Structured Streaming variants.

The reference has no dataflow streaming (its "streaming" is LLM token
streaming, main_server.py:151-160); these are the north-star event ops over
the `events` fixture.  Each aggregation is written once as a column recipe
and reused by (a) the batch query (DuckDB-oracle-checked) and (b) the
Structured Streaming query (same results by construction — verified in
tests via the memory sink).

Scale notes: event-time windows shuffle on (window, keys) — uniform unless
one event_type dominates (AQE skew handles it); watermarks bound state for
the streaming variant.
"""

from __future__ import annotations

import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def _aggs() -> list[Column]:
    return [
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(22,6)")).cast("double").alias("total_value"),
    ]


def tumbling_agg(events: DataFrame, size: str = "1 hour") -> DataFrame:
    w = F.window("ts", size)
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(*_aggs())
        .select(
            F.date_format("w.start", TS_FMT).alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_agg(
    events: DataFrame, size: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    w = F.window("ts", size, slide)
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(*_aggs())
        .select(
            F.date_format("w.start", TS_FMT).alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sessionize_batch(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Batch sessionization: lag-gap flags + running sum = session ids, then
    per-session aggregates.  Two window passes over one shuffle on user_id."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    flagged = events.withColumn(
        "is_new", F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    ).withColumn("session_id", F.sum("is_new").over(run).cast("bigint"))
    return flagged.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(22,6)")).cast("double").alias("total_value"),
        F.date_format(F.min("ts"), TS_FMT).alias("session_start"),
    )


def run_streaming_tumbling(
    spark: SparkSession, parquet_path: str, size: str = "1 hour"
) -> DataFrame:
    """Structured Streaming variant: parquet file stream → watermark →
    tumbling windowed agg → memory sink (complete mode), drained
    synchronously with availableNow.  Returns the final result table —
    identical to `tumbling_agg` on the same data, which is exactly what the
    oracle checks."""
    from crawling_vectordb_llm_spark.catalog import normalize_event_ts

    import os

    schema = spark.read.parquet(parquet_path).schema
    # the file stream source requires a directory: stream the parent dir
    # with a glob filter selecting just this table's file(s)
    reader = spark.readStream.schema(schema).format("parquet")
    if os.path.isfile(parquet_path):
        reader = reader.option(
            "pathGlobFilter", os.path.basename(parquet_path)
        )
        parquet_path = os.path.dirname(parquet_path)
    stream = normalize_event_ts(reader.load(parquet_path)).withWatermark(
        "ts", "10 minutes"
    )
    agg = (
        stream.groupBy(F.window("ts", size).alias("w"), "event_type")
        .agg(*_aggs())
        .select(
            F.date_format("w.start", TS_FMT).alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
