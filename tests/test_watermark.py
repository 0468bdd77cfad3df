"""Watermark semantics: append-mode windowed aggs finalize a window once
the watermark passes it, and rows arriving after finalization are dropped
(no double emission, no state resurrection)."""

from __future__ import annotations

import time
import uuid

from pyspark.sql import functions as F


def test_late_data_dropped_after_window_finalized(spark, tmp_path):
    src = str(tmp_path / "wm_src")
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "event_id long, t double, value double"
    ).selectExpr("event_id", "timestamp_seconds(t) AS ts", "value")
    # batch 0: three rows in window [0,300) + anchor at 1800
    #          -> watermark after commit = 1800-600 = 1200
    mk([(1, 10.0, 1.0), (2, 100.0, 1.0), (3, 250.0, 1.0), (4, 1800.0, 1.0)]).coalesce(
        1
    ).write.mode("overwrite").parquet(src)
    time.sleep(1.1)  # file mtime ordering = batch ordering
    # batch 1: on-time row; during this batch window [0,300) (end 300 < wm
    # 1200) is finalized and emitted
    mk([(6, 1900.0, 1.0)]).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    # batch 2: LATE row for the already-finalized window -> dropped
    mk([(5, 120.0, 1.0)]).coalesce(1).write.mode("append").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "10 minutes")
    )
    agg = (
        stream.groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").cast("long").alias("start_s"), "n")
    )
    name = f"wm_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(name).collect()
    emitted = {}
    for r in rows:
        emitted.setdefault(r["start_s"], []).append(r["n"])
    # window [0,300): finalized exactly once, with only the 3 on-time rows;
    # the late arrival (event 5) was dropped, not re-emitted
    assert emitted.get(0) == [3], emitted
    # unfinalized tail windows were not emitted in append mode
    assert 1800 not in emitted and 1900 not in emitted