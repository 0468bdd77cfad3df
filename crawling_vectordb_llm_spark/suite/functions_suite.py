"""Scalar-function surface (SURVEY §2.5 string/math/null/conditional rows)
plus TPC-H-shaped composites, salted aggregation, and the stateful
streaming totals."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawling_vectordb_llm_spark.catalog import read_table, table_path
from crawling_vectordb_llm_spark.operators.skew import salted_sum_count
from crawling_vectordb_llm_spark.suite.registry import query

_DSUM = "CAST(SUM(CAST({x} AS DECIMAL(22,6))) AS DOUBLE)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


@query(
    "math_funcs",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(sqrt(l_quantity), 6) AS sqrt_qty,
       ROUND(ln(l_extendedprice), 6) AS ln_price,
       ROUND(pow(1 - l_discount, 2), 6) AS disc_sq,
       CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
       CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
       ABS(l_quantity - 25) AS qty_dist
FROM lineitem WHERE l_orderkey < 500
""",
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 500)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("ln_price"),
        F.round(F.pow(1 - F.col("l_discount"), 2), 6).alias("disc_sq"),
        F.ceil(F.col("l_extendedprice") / 1000).cast("bigint").alias("price_k_ceil"),
        F.floor("l_quantity").cast("bigint").alias("qty_floor"),
        F.abs(F.col("l_quantity") - 25).alias("qty_dist"),
    )


@query(
    "string_funcs2",
    oracle="""
SELECT doc_id,
       upper(substr(text, 1, 10)) AS head_upper,
       lpad(CAST(doc_id AS VARCHAR), 6, '0') AS padded_id,
       reverse(lang) AS gnal,
       replace(source, 'src', 'S') AS src_short,
       strpos(text, 'spark') AS spark_pos,
       trim(concat('  ', lang, '  ')) AS trimmed,
       repeat(lang, 2) AS lang2
FROM documents
""",
)
def q_string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper(F.substring("text", 1, 10)).alias("head_upper"),
        F.lpad(F.col("doc_id").cast("string"), 6, "0").alias("padded_id"),
        F.reverse("lang").alias("gnal"),
        F.replace(F.col("source"), F.lit("src"), F.lit("S")).alias("src_short"),
        F.instr(F.col("text"), "spark").cast("bigint").alias("spark_pos"),
        F.trim(F.concat(F.lit("  "), F.col("lang"), F.lit("  "))).alias("trimmed"),
        F.repeat(F.col("lang"), 2).alias("lang2"),
    )


@query(
    "null_funcs",
    oracle="""
SELECT o_orderkey,
       COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
       CASE WHEN NULLIF(o_orderstatus, 'O') IS NULL THEN 1 ELSE 0 END AS is_open,
       IFNULL(NULLIF(o_orderpriority, '1-URGENT'), 'urgent!') AS prio
FROM orders WHERE o_orderkey < 2000
""",
)
def q_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias(
            "status_or_open"
        ),
        F.when(F.nullif("o_orderstatus", F.lit("O")).isNull(), 1)
        .otherwise(0)
        .alias("is_open"),
        F.ifnull(
            F.nullif("o_orderpriority", F.lit("1-URGENT")), F.lit("urgent!")
        ).alias("prio"),
    )


@query(
    "like_filters",
    oracle="""
SELECT doc_id, lang, n_chars FROM documents
WHERE text LIKE '%spark%' AND lang IN ('en', 'zh')
  AND n_chars BETWEEN 100 AND 400
""",
)
def q_like_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.where(
        F.col("text").like("%spark%")
        & F.col("lang").isin("en", "zh")
        & F.col("n_chars").between(100, 400)
    ).select("doc_id", "lang", "n_chars")


@query(
    "conditional_agg",
    oracle=f"""
SELECT event_type,
       COUNT(*) FILTER (WHERE value > 100) AS n_big,
       bool_or(value > 190) AS any_huge,
       bool_and(value > 1) AS all_above_one,
       {_DSUM.format(x='CASE WHEN value > 100 THEN value ELSE 0 END')} AS big_total
FROM events GROUP BY event_type
""",
)
def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    big = F.when(F.col("value") > 100, F.col("value")).otherwise(0.0)
    return e.groupBy("event_type").agg(
        F.count_if(F.col("value") > 100).alias("n_big"),
        F.bool_or(F.col("value") > 190).alias("any_huge"),
        F.bool_and(F.col("value") > 1).alias("all_above_one"),
        F.sum(big.cast("decimal(22,6)")).cast("double").alias("big_total"),
    )


@query(
    "tpch_q3_shape",
    oracle=f"""
SELECT l.l_orderkey,
       {_DSUM.format(x='l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-06-01'
  AND l.l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l.l_orderkey, orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey LIMIT 10
""",
)
def q_tpch_q3_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → join chain → agg → top-10."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < "1998-06-01")
    l = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1998-06-01")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(22,6)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
    )


@query(
    "tpch_q18_shape",
    oracle=f"""
SELECT o.o_orderkey, o.o_custkey, {_DSUM.format(x='l.l_quantity')} AS total_qty
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > 150)
GROUP BY o.o_orderkey, o.o_custkey
""",
)
def q_tpch_q18_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: semi-join against a HAVING subquery."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        o.join(big.withColumnRenamed("l_orderkey", "__k"), o["o_orderkey"] == F.col("__k"), "left_semi")
        .join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("o_orderkey", "o_custkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(22,6)"))
            .cast("double")
            .alias("total_qty")
        )
    )


@query(
    "salted_aggregation",
    oracle=f"""
SELECT lang, {_DSUM.format(x='n_chars')} AS total, COUNT(*) AS n
FROM documents GROUP BY lang
""",
)
def q_salted_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-stage salted aggregation — identical results to the
    direct groupBy (the oracle IS the direct form)."""
    d = _t(spark, sf_dir, "documents")
    return salted_sum_count(d, ["lang"], "n_chars", salt_buckets=8)


@query(
    "streaming_stateful_totals",
    oracle=f"""
SELECT user_id, COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(22,6))) AS DOUBLE), 6) AS total_value
FROM events GROUP BY user_id
""",
)
def q_streaming_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming op (applyInPandasWithState): per-user
    running totals; final emissions equal the batch aggregation."""
    from crawling_vectordb_llm_spark.streaming.stateful import (
        run_streaming_user_totals,
    )

    return run_streaming_user_totals(spark, table_path(sf_dir, "events"))


@query(
    "salted_skew_join",
    oracle="""
SELECT c.c_mktsegment,
       COUNT(*) AS n_orders,
       ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(22,6))) AS DOUBLE), 6)
         AS total_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
)
def q_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof fact⨝dim join: fact keys salted across 8 buckets, dim
    exploded per salt — the portable hot-key recipe for when the dim side
    outgrows broadcast.  Results are identical to the plain join (the
    oracle IS the plain join + agg)."""
    from crawling_vectordb_llm_spark.operators.skew import (
        salted_broadcast_skew_join,
    )

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    joined = salted_broadcast_skew_join(o, c, "custkey", salt_buckets=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(22,6)")).cast("double"), 6
        ).alias("total_price"),
    )


@query(
    "variant_props_extract",
    oracle="""
SELECT event_type,
       CAST(json_extract(props, '$.k') AS INT) % 10 AS k_bucket,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS k_sum
FROM events
WHERE CAST(json_extract(props, '$.k') AS INT) IS NOT NULL
GROUP BY event_type, k_bucket
""",
)
def q_variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through the VARIANT type (Spark 4.x):
    parse_json once into the binary variant encoding, then typed
    variant_get path extraction — the modern engine's answer to repeated
    get_json_object string re-parsing (json_extract/json_funcs2 cover the
    classic path).  At 100 TB the variant column is parsed once at ingest
    and every downstream field access is a binary offset read, not a
    JSON re-parse."""
    ev = _t(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.try_variant_get(F.parse_json("props"), "$.k", "int").alias("k"),
    ).where(F.col("k").isNotNull())
    return (
        v.groupBy("event_type", (F.col("k") % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("bigint").alias("k_sum"),
        )
    )


@query(
    "streaming_tws_totals",
    oracle="""
SELECT user_id, COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(22,6))) AS DOUBLE), 6) AS total_value
FROM events GROUP BY user_id
""",
)
def q_streaming_tws_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's transformWithStateInPandas (typed value state + RocksDB
    state store — the arbitrary-state API succeeding
    applyInPandasWithState) wired into the correctness gate: per-user
    running totals accumulated in integer micro-units, drained with
    availableNow, final emission per key reduced by max-n.  Exactly the
    streaming_stateful_totals contract on the newer API, so the same
    batch-aggregate oracle pins it — the state server needs
    google.protobuf, satisfied by the vendored runtime (vendor/) when no
    installed copy exists."""
    from pyspark.sql import Window

    from crawling_vectordb_llm_spark.streaming.stateful import (
        run_tws_user_totals,
    )

    sink = run_tws_user_totals(spark, table_path(sf_dir, "events"))
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        sink.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            "user_id",
            "n_events",
            F.round("total_value", 6).alias("total_value"),
        )
    )
