"""Coverage completers for SURVEY §2: filtered ANN search (J3), the UDTF
path for recursive flatten (F1), from_json/json_tuple (S3), datetime
function breadth, and the pyspark.ml LSH ANN variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawling_vectordb_llm_spark.catalog import read_table
from crawling_vectordb_llm_spark.operators.knn import knn_join_sql
from crawling_vectordb_llm_spark.suite.registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


@query(
    "filtered_knn",
    oracle="""
WITH corpus AS (
  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v
  FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
  WHERE d.lang = 'en'
), q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 5
), ranked AS (
  SELECT q.query_id, c.vec_id,
         list_cosine_similarity(q.qv, c.v) AS score,
         row_number() OVER (PARTITION BY q.query_id
                            ORDER BY list_cosine_similarity(q.qv, c.v) DESC,
                                     c.vec_id ASC) AS rank
  FROM q CROSS JOIN corpus c
)
SELECT query_id, vec_id, CAST(rank AS INT) AS rank, ROUND(score, 6) AS score
FROM ranked WHERE rank <= 5
""",
)
def q_filtered_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: metadata-filtered ANN search (the declared-but-unused
    FilterIndex capability, reference TencentVDB.py:48) — the predicate
    prunes the corpus BEFORE scoring; at scale this is partition pruning
    on the filter column, exactly what the reference's FilterIndex buys."""
    emb = _t(spark, sf_dir, "embeddings")
    docs = _t(spark, sf_dir, "documents")
    corpus = emb.join(
        docs.where(F.col("lang") == "en").select("doc_id"),
        emb["vec_id"] == F.col("doc_id"),
        "left_semi",
    )
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = knn_join_sql(queries, corpus, k=5, corpus_id="vec_id")
    return out.select(
        "query_id", "vec_id", F.col("rank").cast("int").alias("rank"), "score"
    )


@query(
    "udtf_tree_flatten",
    oracle="""
SELECT r_name AS title, CAST(0 AS INT) AS depth, NULL AS parent_title FROM region
UNION ALL
SELECT n.n_name AS title, CAST(1 AS INT) AS depth, r.r_name AS parent_title
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
""",
)
def q_udtf_tree_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 via Python UDTF (the one-shot alternative to the explode-to-
    fixpoint loop, SURVEY §4.2): each region's nav tree serialized to JSON
    (the reference's textarea payload shape, Crawling.py:18-19), walked
    recursively by the UDTF."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="title string, depth int, parent_title string")
    class FlattenNavTree:
        def eval(self, node_json: str):
            import json

            def walk(node, depth, parent):
                yield (node.get("title"), depth, parent)
                for ch in node.get("children") or []:
                    yield from walk(ch, depth + 1, node.get("title"))

            if node_json:
                yield from walk(json.loads(node_json), 0, None)

    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    trees = (
        nation.join(region, nation["n_regionkey"] == region["r_regionkey"])
        .groupBy(F.col("r_name").alias("title"))
        .agg(
            F.collect_list(F.struct(F.col("n_name").alias("title"))).alias(
                "children"
            )
        )
        .select(F.to_json(F.struct("title", "children")).alias("tree_json"))
    )
    spark.udtf.register("flatten_nav_tree", FlattenNavTree)
    trees.createOrReplaceTempView("__nav_trees")
    return spark.sql(
        "SELECT f.* FROM __nav_trees, LATERAL flatten_nav_tree(tree_json) f"
    )


@query(
    "json_funcs2",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_struct,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_tuple,
       CASE WHEN json_extract_string(props, '$.missing') IS NULL
            THEN -1 ELSE 0 END AS missing_flag
FROM events WHERE event_id < 3000
""",
)
def q_json_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: from_json with an explicit schema + json_tuple + missing-path
    null handling."""
    e = _t(spark, sf_dir, "events").where(F.col("event_id") < 3000)
    parsed = e.select(
        "event_id",
        F.from_json("props", "k INT").alias("p"),
        F.json_tuple(F.col("props"), "k").alias("kt"),
        F.get_json_object("props", "$.missing").alias("miss"),
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k_struct"),
        F.col("kt").cast("int").alias("k_tuple"),
        F.when(F.col("miss").isNull(), -1).otherwise(0).alias("missing_flag"),
    )


@query(
    "datetime_funcs2",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS yr,
       CAST(month(o_orderdate) AS INT) AS mo,
       CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow_spark,
       CAST(datediff('day', o_orderdate, TIMESTAMP '2000-01-01') AS INT)
         AS days_to_y2k,
       CAST(epoch(o_orderdate) AS BIGINT) AS unix_ts,
       strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3mo,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
FROM orders WHERE o_orderkey < 2000
""",
)
def q_datetime_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime breadth: extract fields, diffs, epoch, interval arithmetic,
    month boundaries.  (DuckDB's dayofweek is 0-based Sunday; Spark's is
    1-based — aligned in the oracle.)"""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.dayofweek("o_orderdate").cast("int").alias("dow_spark"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate")).cast(
            "int"
        ).alias("days_to_y2k"),
        F.unix_timestamp("o_orderdate").cast("bigint").alias("unix_ts"),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 3 MONTH"), "yyyy-MM-dd"
        ).alias("plus3mo"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
    )


@query("lsh_ann_topk")
def q_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: BucketedRandomProjectionLSH (pyspark.ml) ANN — euclidean
    on L2-normalized vectors is rank-equivalent to cosine.  Recall vs exact
    kNN asserted in tests."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    from crawling_vectordb_llm_spark.functions.vector import l2_normalize

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(l2_normalize("embedding")).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=0.5, numHashTables=6, seed=42
    )
    model = lsh.fit(emb)
    queries = emb.where(F.col("vec_id") < 5).withColumnRenamed(
        "vec_id", "query_id"
    )
    joined = model.approxSimilarityJoin(
        queries, emb, threshold=1.2, distCol="dist"
    ).select(
        F.col("datasetA.query_id").alias("query_id"),
        F.col("datasetB.vec_id").alias("vec_id"),
        F.round("dist", 6).alias("dist"),
    )
    from crawling_vectordb_llm_spark.operators.topk import grouped_topk

    return grouped_topk(
        joined, ["query_id"], [F.asc("dist"), F.asc("vec_id")], 10
    )
