"""global_topk_ranked (operators/topk.py, VERDICT r4 #8): whole-table
top-k with a dense rank via TakeOrdered + sorted-array posexplode —
must match row_number semantics without any global WindowExec."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawling_vectordb_llm_spark.operators.topk import global_topk_ranked


def test_matches_row_number_semantics(spark):
    df = spark.createDataFrame(
        [("a", 5), ("b", 9), ("c", 9), ("d", 1), ("e", 7)], "name string, n int"
    )
    out = global_topk_ranked(
        df, [(-F.col("n")).alias("neg"), F.col("name")], ["name", "n"], 3
    ).collect()
    # order: n desc, name asc -> b(9),c(9),e(7); ranks 1..3
    assert [(r["name"], r["n"], r["rank"]) for r in out] == [
        ("b", 9, 1),
        ("c", 9, 2),
        ("e", 7, 3),
    ]


def test_k_larger_than_table(spark):
    df = spark.createDataFrame([("x", 2), ("y", 1)], "name string, n int")
    out = global_topk_ranked(df, [F.col("n")], ["name", "n"], 10).collect()
    assert [(r["name"], r["rank"]) for r in out] == [("y", 1), ("x", 2)]


def test_empty_input_yields_zero_rows(spark):
    df = spark.createDataFrame([], "name string, n int")
    out = global_topk_ranked(df, [F.col("n")], ["name", "n"], 5)
    assert out.count() == 0
    assert out.columns == ["name", "n", "rank"]


def test_no_window_exec_in_plan(spark):
    df = spark.createDataFrame([("a", 1)], "name string, n int")
    out = global_topk_ranked(df, [F.col("n")], ["name", "n"], 5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowExec" not in plan and "Window" not in plan
    assert "TakeOrdered" in plan
