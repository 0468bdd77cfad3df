"""Cross-batch state: the stateful op must accumulate across micro-batches,
not just within one."""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from crawling_vectordb_llm_spark.catalog import read_table
from crawling_vectordb_llm_spark.streaming.stateful import _update_user_totals

from .conftest import SF_SMALL


def test_state_accumulates_across_batches(spark, tmp_path):
    events = read_table(spark, SF_SMALL, "events")
    # two files -> two micro-batches with maxFilesPerTrigger=1
    first = events.where(F.col("event_id") < 500)
    second = events.where(F.col("event_id") >= 500)
    src = str(tmp_path / "stream_src")
    first.coalesce(1).write.mode("overwrite").parquet(src)
    second.coalesce(1).write.mode("append").parquet(src)
    n_files = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_files >= 2

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total_micros long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"twobatch_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    sink = spark.table(name)
    # multiple emissions per key (one per batch containing that key);
    # the max-n emission is the final state
    final = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in sink.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "total_value")).alias("s"))
        .select("user_id", "s.n_events", "s.total_value")
        .collect()
    }
    expected = {
        r["user_id"]: (r["n"], r["t"])
        for r in events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(22,6)")).cast("double"), 6
            ).alias("t"),
        )
        .collect()
    }
    assert final == expected
    # and emissions really did span two batches for at least one key
    multi = sink.groupBy("user_id").count().where(F.col("count") > 1).count()
    assert multi > 0

def _has_protobuf() -> bool:
    from crawling_vectordb_llm_spark.shipping import ensure_protobuf

    return ensure_protobuf()


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas needs google.protobuf (its state "
    "server speaks protobuf); neither installed nor vendored",
)
def test_transform_with_state_accumulates_across_batches(spark, tmp_path):
    """Spark 4 transformWithStateInPandas (typed value state + RocksDB
    provider) must produce the same per-user totals as the batch
    aggregation, accumulating across micro-batches."""
    from crawling_vectordb_llm_spark.streaming.stateful import (
        run_tws_user_totals,
    )

    events = read_table(spark, SF_SMALL, "events")
    first = events.where(F.col("event_id") < 500)
    second = events.where(F.col("event_id") >= 500)
    src = str(tmp_path / "tws_src")
    first.coalesce(1).write.mode("overwrite").parquet(src)
    second.coalesce(1).write.mode("append").parquet(src)

    sink = run_tws_user_totals(spark, src, max_files=1)
    final = {
        r["user_id"]: (r["n_events"], round(r["total_value"], 6))
        for r in sink.groupBy("user_id")
        .agg(F.max(F.struct("n_events", "total_value")).alias("s"))
        .select("user_id", "s.n_events", "s.total_value")
        .collect()
    }
    expected = {
        r["user_id"]: (r["n"], r["t"])
        for r in events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.round(F.col("value") * 1_000_000).cast("long")).cast("double")
                / 1_000_000,
                6,
            ).alias("t"),
        )
        .collect()
    }
    assert final == expected
    multi = sink.groupBy("user_id").count().where(F.col("count") > 1).count()
    assert multi > 0
