"""Streaming deduplication — dropDuplicatesWithinWatermark.

The batch dedup ladder (operators/dedup.py) assumes a closed corpus; an
ingest stream (the reference's crawl loop re-fetching pages,
Crawling.py's url-keyed upsert) needs dedup ON the stream with bounded
state.  `dropDuplicatesWithinWatermark` keeps one row per key and ages
state out once the event-time watermark passes — state is O(keys per
watermark horizon), not O(all keys ever), which is what makes the op
viable on an unbounded 100 TB/day feed.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession


def run_streaming_dedup(
    spark: SparkSession,
    parquet_path: str,
    keys: list[str],
    watermark: str = "10 minutes",
) -> DataFrame:
    """File stream → watermark → dropDuplicatesWithinWatermark(keys) →
    append-mode memory sink, drained with availableNow.

    Returns the sink contents as a DataFrame of the key columns.  A
    replay split across many microbatches may re-emit a key whose first
    occurrence is older than the watermark horizon (exactly the
    documented semantics); callers wanting a closed-corpus answer apply
    a final batch `.distinct()` — cheap relative to the stream, and the
    streaming op has already bounded the state.
    """
    from crawling_vectordb_llm_spark.catalog import normalize_event_ts

    schema = spark.read.parquet(parquet_path).schema
    reader = spark.readStream.schema(schema).format("parquet")
    if os.path.isfile(parquet_path):
        reader = reader.option("pathGlobFilter", os.path.basename(parquet_path))
        parquet_path = os.path.dirname(parquet_path)
    stream = (
        normalize_event_ts(reader.load(parquet_path))
        .select("ts", *keys)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(keys)
    )
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(*keys)


def run_stream_stream_join(
    spark: SparkSession,
    parquet_path: str,
    left_type: str = "click",
    right_type: str = "purchase",
    horizon: str = "24 hours",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join with an event-time interval condition:
    every `left_type` event joined to same-user `right_type` events in
    [left.ts, left.ts + horizon].

    Both sides carry watermarks so the join state is bounded: the left
    buffer ages out once right-side event time passes left.ts + horizon +
    watermark — without the time condition the state would grow with the
    whole stream, the classic unbounded-join mistake.  Inner join in
    append mode emits matches as they form; on a finite availableNow
    replay the result equals the batch interval join, which is what the
    oracle checks.
    """
    from pyspark.sql import functions as F

    from crawling_vectordb_llm_spark.catalog import normalize_event_ts

    schema = spark.read.parquet(parquet_path).schema
    reader = spark.readStream.schema(schema).format("parquet")
    if os.path.isfile(parquet_path):
        reader = reader.option("pathGlobFilter", os.path.basename(parquet_path))
        parquet_path = os.path.dirname(parquet_path)
    src = normalize_event_ts(reader.load(parquet_path))
    left = (
        src.where(F.col("event_type") == left_type)
        .select(F.col("user_id").alias("l_user"), F.col("ts").alias("l_ts"))
        .withWatermark("l_ts", watermark)
    )
    right = (
        src.where(F.col("event_type") == right_type)
        .select(F.col("user_id").alias("r_user"), F.col("ts").alias("r_ts"))
        .withWatermark("r_ts", watermark)
    )
    joined = left.join(
        right,
        F.expr(
            f"l_user = r_user AND r_ts >= l_ts AND r_ts <= l_ts + interval {horizon}"
        ),
    )
    name = f"stream_join_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def run_stream_static_join(
    spark: SparkSession,
    events_path: str,
    dim: DataFrame,
    on: str,
) -> DataFrame:
    """Stream-static enrichment join: the canonical dimension lookup on an
    ingest stream (each microbatch of the crawl feed joined to a slowly-
    changing reference table).

    The static side needs no watermark and holds no state — Spark plans it
    as a fresh broadcast per microbatch, so the stream side never shuffles
    (the 100 TB/day regime: dim tables broadcast, fact stream stays
    partition-local).  On a finite availableNow replay the appended output
    equals the batch inner join, which the oracle checks.
    """
    schema = spark.read.parquet(events_path).schema
    reader = spark.readStream.schema(schema).format("parquet")
    if os.path.isfile(events_path):
        reader = reader.option("pathGlobFilter", os.path.basename(events_path))
        events_path = os.path.dirname(events_path)
    from pyspark.sql import functions as F

    src = reader.load(events_path).join(F.broadcast(dim), on, "inner")
    name = f"stream_static_{uuid.uuid4().hex[:8]}"
    q = (
        src.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
