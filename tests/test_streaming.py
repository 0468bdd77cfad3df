"""Streaming/batch agreement and sessionization properties."""

from __future__ import annotations

from crawling_vectordb_llm_spark.catalog import read_table, table_path
from crawling_vectordb_llm_spark.streaming import windows as W

from .conftest import SF_SMALL


def test_streaming_equals_batch_tumbling(spark):
    batch = {
        tuple(r)
        for r in W.tumbling_agg(read_table(spark, SF_SMALL, "events")).collect()
    }
    stream = {
        tuple(r)
        for r in W.run_streaming_tumbling(
            spark, table_path(SF_SMALL, "events")
        ).collect()
    }
    assert batch == stream and len(batch) > 0


def test_sessionize_gap_splits(spark):
    df = spark.createDataFrame(
        [
            (1, 100, "2024-01-01 00:00:00", 1.0),
            (2, 100, "2024-01-01 00:10:00", 1.0),
            (3, 100, "2024-01-01 01:10:00", 1.0),  # 60 min gap -> new session
            (4, 200, "2024-01-01 00:00:00", 1.0),
        ],
        "event_id long, user_id long, ts_s string, value double",
    ).selectExpr("event_id", "user_id", "CAST(ts_s AS TIMESTAMP) AS ts", "value")
    rows = W.sessionize_batch(df, gap_seconds=1800).collect()
    sessions = {(r["user_id"], r["session_id"]): r["n_events"] for r in rows}
    assert sessions == {(100, 1): 2, (100, 2): 1, (200, 1): 1}
