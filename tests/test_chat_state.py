"""G2: per-session chat history accumulates in order across micro-batches."""

from __future__ import annotations

import json
import time
import uuid

from crawling_vectordb_llm_spark.streaming.chat_state import run_chat_history_stream


def test_chat_history_accumulates_in_order(spark, tmp_path):
    src = str(tmp_path / "chat_src")
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "session_id long, turn_id long, role string, content string"
    )
    mk(
        [(1, 0, "user", "hi"), (1, 1, "assistant", "hello"), (2, 0, "user", "yo")]
    ).coalesce(1).write.mode("overwrite").parquet(src)
    time.sleep(1.1)
    mk([(1, 2, "user", "more"), (2, 1, "assistant", "hey")]).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    name = f"chat_{uuid.uuid4().hex[:8]}"
    q = (
        run_chat_history_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    rows = spark.table(name).collect()
    final = {}
    for r in rows:  # keep highest-n emission per session
        if r["session_id"] not in final or r["n_turns"] > final[r["session_id"]]["n_turns"]:
            final[r["session_id"]] = r
    h1 = json.loads(final[1]["history_json"])
    assert [t["content"] for t in h1] == ["hi", "hello", "more"]
    assert [t["role"] for t in h1] == ["user", "assistant", "user"]
    assert final[2]["n_turns"] == 2 and final[2]["last_content"] == "hey"
    # emissions spanned batches (state persisted between them)
    assert len(rows) >= 4