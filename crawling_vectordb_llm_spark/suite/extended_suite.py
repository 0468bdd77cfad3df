"""Extended operator surface: as-of/range joins, outer joins, analytic
windows (ntile/percent_rank/first/last), unpivot, correlated subqueries,
array/map functions, multimodal metadata decode, IVF ANN search.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crawling_vectordb_llm_spark.catalog import read_table
from crawling_vectordb_llm_spark.operators.asof import asof_join
from crawling_vectordb_llm_spark.operators.ivf import ivf_topk
from crawling_vectordb_llm_spark.sources import multimodal as MM
from crawling_vectordb_llm_spark.suite.registry import query

_DSUM = "CAST(SUM(CAST({x} AS DECIMAL(22,6))) AS DOUBLE)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------- joins

@query(
    "asof_join",
    oracle="""
SELECT p.event_id, p.user_id,
       strftime(s.ts, '%Y-%m-%d %H:%M:%S') AS signup_ts,
       ROUND(epoch(p.ts) - epoch(s.ts), 6) AS gap_s
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT * FROM events WHERE event_type = 'signup') s
  ON p.user_id = s.user_id AND p.ts >= s.ts
""",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest prior signup.
    union-window strategy — one shuffle on user_id, no per-group Python."""
    e = _t(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase")
    signups = e.where(F.col("event_type") == "signup")
    joined = asof_join(
        purchases, signups, ts="ts", by="user_id", right_value="ts",
        value_alias="signup_ts_raw",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("signup_ts_raw", "yyyy-MM-dd HH:mm:ss").alias("signup_ts"),
        F.round(
            F.col("ts").cast("double") - F.col("signup_ts_raw").cast("double"), 6
        ).alias("gap_s"),
    )


@query(
    "range_join_bands",
    oracle=f"""
WITH bands(band, lo, hi) AS (
  VALUES ('xs', 0, 50000), ('s', 50000, 150000), ('m', 150000, 300000),
         ('l', 300000, 450000), ('xl', 450000, 100000000)
)
SELECT b.band, COUNT(*) AS n, {_DSUM.format(x='o.o_totalprice')} AS total
FROM orders o JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
GROUP BY b.band
""",
)
def q_range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join against a broadcast band dimension — Spark plans
    a BroadcastNestedLoopJoin; the dim is 5 rows so the 'loop' is free."""
    o = _t(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [
            ("xs", 0, 50_000),
            ("s", 50_000, 150_000),
            ("m", 150_000, 300_000),
            ("l", 300_000, 450_000),
            ("xl", 450_000, 100_000_000),
        ],
        "band string, lo long, hi long",
    )
    return (
        o.join(
            F.broadcast(bands),
            (o["o_totalprice"] >= bands["lo"]) & (o["o_totalprice"] < bands["hi"]),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(22,6)"))
            .cast("double")
            .alias("total"),
        )
    )


@query(
    "join_left_outer",
    oracle=f"""
SELECT n.n_name, COUNT(c.c_custkey) AS n_cust,
       COALESCE({_DSUM.format(x='c.c_acctbal')}, 0.0) AS total_bal
FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
)
def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    return (
        n.join(c, c["c_nationkey"] == n["n_nationkey"], "left")
        .groupBy("n_name")
        .agg(
            F.count("c_custkey").alias("n_cust"),
            F.coalesce(
                F.sum(F.col("c_acctbal").cast("decimal(22,6)")).cast("double"),
                F.lit(0.0),
            ).alias("total_bal"),
        )
    )


@query(
    "join_full_outer",
    oracle="""
WITH cn AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1),
     sn AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
SELECT COALESCE(cn.nk, sn.nk) AS nationkey,
       COALESCE(cn.n_cust, 0) AS n_cust, COALESCE(sn.n_supp, 0) AS n_supp
FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
""",
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk_s"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, c["nk"] == s["nk_s"], "full_outer").select(
        F.coalesce("nk", "nk_s").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


# ---------------------------------------------------------------- windows

@query(
    "window_ntile_percentrank",
    oracle="""
SELECT o_orderkey, o_orderstatus,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       ROUND(percent_rank() OVER w, 6) AS pct_rank,
       ROUND(cume_dist() OVER w, 6) AS cdist
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
""",
)
def q_window_ntile_percentrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    )


@query(
    "window_first_last",
    oracle="""
SELECT o_orderkey, o_custkey,
       first_value(o_totalprice) OVER w AS first_price,
       last_value(o_totalprice) OVER w AS last_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
    )


# ---------------------------------------------------------------- reshaping

@query(
    "unpivot_stack",
    oracle="""
SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
UNION ALL
SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS val
FROM customer
""",
)
def q_unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot via stack() — the wide→long reshape."""
    c = _t(spark, sf_dir, "customer")
    return c.selectExpr(
        "c_custkey",
        "stack(2, 'acctbal', c_acctbal, 'nationkey', CAST(c_nationkey AS DOUBLE)) "
        "AS (metric, val)",
    )


@query(
    "scalar_subquery",
    oracle="""
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
FROM orders o
WHERE o.o_totalprice > 1.5 * (
  SELECT AVG(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
""",
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (Catalyst de-correlates it to a join)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("__sq_orders")
    return spark.sql(
        """
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
FROM __sq_orders o
WHERE o.o_totalprice > 1.5 * (
  SELECT AVG(o2.o_totalprice) FROM __sq_orders o2 WHERE o2.o_custkey = o.o_custkey)
"""
    )


# ---------------------------------------------------------------- array/map fns

@query(
    "array_agg_funcs",
    oracle="""
SELECT c_mktsegment,
       array_to_string(list_sort(list(DISTINCT c_nationkey)), ',') AS nations,
       len(list(DISTINCT c_nationkey)) AS n_nations
FROM customer GROUP BY c_mktsegment
""",
)
def q_array_agg_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.array_join(F.array_sort(F.collect_set("c_nationkey")), ",").alias(
            "nations"
        ),
        F.size(F.collect_set("c_nationkey")).cast("bigint").alias("n_nations"),
    )


@query(
    "posexplode_tokens",
    oracle="""
SELECT doc_id,
       CAST(unnest(generate_series(1, len(toks))) - 1 AS INT) AS pos,
       unnest(toks) AS token
FROM (SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id < 10)
""",
)
def q_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 10)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    ).select("doc_id", F.col("pos").cast("int").alias("pos"), "token")


@query(
    "map_funcs",
    oracle="""
SELECT user_id,
       COALESCE(COUNT(*) FILTER (WHERE event_type = 'purchase'), 0) AS n_purchases,
       COUNT(DISTINCT event_type) AS n_types
FROM events GROUP BY user_id
""",
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a MAP<event_type, count> per user and read it back — exercises
    map_from_entries / element_at / map_keys (S3 props analog)."""
    e = _t(spark, sf_dir, "events")
    per_type = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    mapped = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "cnt"))
        ).alias("m")
    )
    return mapped.select(
        "user_id",
        F.coalesce(F.element_at("m", "purchase"), F.lit(0)).alias("n_purchases"),
        F.size(F.map_keys("m")).cast("bigint").alias("n_types"),
    )


# ---------------------------------------------------------------- multimodal / ANN

@query(
    "multimodal_meta",
    oracle="""
SELECT doc_id, 'FKM1' AS magic,
       CAST(16 + doc_id % 48 AS INT) AS width,
       CAST(16 + (doc_id * 7) % 32 AS INT) AS height,
       CAST(doc_id % 3 AS INT) AS kind_id,
       CAST((16 + doc_id % 48) * (16 + (doc_id * 7) % 32) AS BIGINT)
         AS payload_bytes,
       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            ELSE 'video' END AS kind
FROM documents
""",
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column round trip: synthesize media blobs (mapInPandas), then
    decode header metadata with pure column ops.  The oracle recomputes the
    expected metadata from the generator formulas — the parse must invert
    the synth exactly."""
    docs = _t(spark, sf_dir, "documents")
    media = MM.synth_media(docs)
    meta = MM.decode_media_meta(media)
    return meta.select(
        "doc_id",
        "magic",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("kind_id").cast("int").alias("kind_id"),
        F.col("payload_bytes").cast("bigint").alias("payload_bytes"),
        "kind",
    )


@query("multimodal_features_knn")
def q_multimodal_features_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: media → byte-histogram features → kNN over the feature
    space (the decode→embed→search pipeline with the decoder stubbed)."""
    from crawling_vectordb_llm_spark.operators.knn import knn_join_numpy

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    feats = MM.extract_features(MM.synth_media(docs))
    queries = feats.where(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), F.col("features").alias("query_vec")
    )
    return knn_join_numpy(
        queries, feats, k=3, corpus_id="doc_id", corpus_vec="features"
    )


@query(
    "frame_sample",
    oracle="""
WITH dims AS (
  SELECT doc_id,
         ((16 + doc_id % 48) * (16 + (doc_id * 7) % 32)) // 64 AS n_frames
  FROM documents WHERE doc_id < 50
)
SELECT doc_id,
       CAST(unnest(generate_series(0, CAST(n_frames - 1 AS BIGINT), 4)) AS INT)
         AS frame_idx,
       CAST(64 AS INT) AS frame_len
FROM dims
""",
)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-shaped frame sampling (every 4th 64-byte frame).  Oracle-
    checked (VERDICT r1 #6): the FKM1 payload size is a pure function of
    doc_id (width 16 + id%48, height 16 + 7·id%32, sources/multimodal.py),
    so the sampled frame indexes and the constant 64-byte frame length are
    reproducible in SQL without touching the binary itself."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    frames = MM.sample_frames(MM.synth_media(docs))
    return frames.select("doc_id", "frame_idx", F.length("frame").alias("frame_len"))


@query("ann_ivf_topk")
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (k-means is seeded but float-order-sensitive): IVF
    approximate top-10 — recall vs exact kNN asserted in tests."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return ivf_topk(queries, emb, k=10, n_centroids=16, n_probe=4)


@query("ann_ivfpq_topk")
def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (k-means float-order-sensitive): IVF-PQ — coarse-cell
    pruning + residual product quantization + ADC + exact rerank
    (operators/pq.py ivfpq_topk).  Recall vs exact kNN and determinism
    asserted in tests/test_pq.py."""
    from crawling_vectordb_llm_spark.operators.pq import ivfpq_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return ivfpq_topk(queries, emb, k=10, n_centroids=16, n_probe=8)


@query(
    "multimodal_resize",
    oracle="""
WITH d AS (
  SELECT doc_id,
         (16 + doc_id % 48 + 1) // 2 AS nw,
         (16 + (doc_id * 7) % 32 + 1) // 2 AS nh
  FROM documents WHERE doc_id < 200
)
SELECT doc_id, 'FKM1' AS magic,
       CAST(nw AS INT) AS width, CAST(nh AS INT) AS height,
       CAST(doc_id % 3 AS INT) AS kind_id,
       CAST(nw * nh AS BIGINT) AS payload_bytes,
       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            ELSE 'video' END AS kind,
       CAST(nw AS INT) AS w_out
FROM d
""",
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resize stage of the multimodal pipeline — synth media blobs
    downsampled 2x (nearest-neighbor stand-in at the real decoder seam),
    headers rewritten, then the resized metadata re-decoded to prove the
    output blobs are themselves valid inputs (op closure: resize o decode
    = decode o resize on dims).  Oracle-checked: the FKM1 dims are pure
    functions of doc_id, so the re-decoded header of the half-size blob —
    ceil(w/2) × ceil(h/2), kind, payload bytes — reproduces in SQL."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    media = MM.synth_media(docs)
    resized = MM.resize_media(media, factor=2)
    meta = MM.decode_media_meta(resized.select("doc_id", "media"))
    return meta.join(
        resized.select("doc_id", F.col("width").alias("w_out")), "doc_id"
    )


@query(
    "interval_overlap_join",
    oracle="""
WITH raw AS (
  SELECT l_suppkey AS s, l_orderkey * 10 + l_linenumber AS lid,
         datediff('day', DATE '1970-01-01', l_shipdate) AS sd,
         datediff('day', DATE '1970-01-01', l_shipdate)
           + (l_orderkey + l_linenumber) % 14 + 1 AS ed
  FROM lineitem
), li AS (
  SELECT s, lid, MIN(sd) AS sd, MAX(ed) AS ed FROM raw GROUP BY s, lid
)
SELECT a.s AS l_suppkey, COUNT(*) AS n_overlaps
FROM li a JOIN li b
  ON a.s = b.s AND a.lid < b.lid AND a.sd <= b.ed AND b.sd <= a.ed
GROUP BY a.s
""",
)
def q_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join: per supplier, count pairs of shipments
    whose transit windows [shipdate, shipdate + derived duration] overlap
    — concurrent-shipment load, the classic two-sided interval join Spark
    has no native operator for.

    Spark shape: BANDING — each interval explodes to the (few) weeks it
    covers, the self-join runs as an EQUI-join on (supplier, week) that
    Catalyst hash-partitions, the exact overlap predicate filters inside
    matched bands, and distinct() collapses pairs sharing several bands.
    The naive theta-join alternative is a per-supplier cross product
    (O(n^2/suppliers) comparisons); banding does O(pairs-per-band) work
    and every stage is a shuffle-partitioned hash join — at 100 TB the
    band width is tuned so bucket sizes stay bounded (week >> max
    transit keeps the explode factor <= 3 here).  Oracle: the O(n^2)
    theta-join, tractable at sf0.01."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.col("l_suppkey"),
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("lid"),
            F.datediff("l_shipdate", F.lit("1970-01-01")).alias("sd"),
            (
                F.datediff("l_shipdate", F.lit("1970-01-01"))
                + (F.col("l_orderkey") + F.col("l_linenumber")) % 14 + 1
            ).alias("ed"),
        )
        # the fixture repeats (orderkey, linenumber) rows: collapse each
        # logical shipment line to ONE interval [first ship, last arrival]
        # so the pair universe is well-defined (lid unique per supplier)
        .groupBy("l_suppkey", "lid")
        .agg(F.min("sd").alias("sd"), F.max("ed").alias("ed"))
    )
    # r13 (guide §2.4 "two operations keyed the same way can share one
    # exchange"): repartition by the join key BEFORE branching the
    # self-join.  Both sides are the identical subplan up to this exchange,
    # so Catalyst computes it ONCE (ReusedExchange) and the join's
    # ENSURE_REQUIREMENTS is already satisfied — the old shape
    # (localCheckpoint + join-driven exchanges) shuffled the exploded rows
    # twice and paid a blocking checkpoint materialization; measured
    # 2.44 s -> 1.73 s median interleaved at sf0.1, rows identical.  The
    # checkpoint is gone: exchange reuse dedupes the aggregation subtree
    # without pinning blocks in the block manager.
    banded = li.withColumn(
        "wk",
        F.explode(F.sequence(F.floor(F.col("sd") / 7), F.floor(F.col("ed") / 7))),
    ).repartition("l_suppkey", "wk")
    a = banded.select(
        F.col("l_suppkey"), F.col("wk"),
        F.col("lid").alias("a_lid"), F.col("sd").alias("a_sd"), F.col("ed").alias("a_ed"),
    )
    b = banded.select(
        F.col("l_suppkey"), F.col("wk"),
        F.col("lid").alias("b_lid"), F.col("sd").alias("b_sd"), F.col("ed").alias("b_ed"),
    )
    pairs = a.join(b, ["l_suppkey", "wk"]).where(
        (F.col("a_lid") < F.col("b_lid"))
        & (F.col("a_sd") <= F.col("b_ed"))
        & (F.col("b_sd") <= F.col("a_ed"))
        # first-shared-band ownership: an overlapping pair is counted ONLY
        # in the week of the later start (always a shared band), so pairs
        # spanning several bands never need a distinct() — one shuffle
        # fewer, and no pair-list materialization at 100 TB
        & (F.col("wk") == F.floor(F.greatest("a_sd", "b_sd") / 7))
    )
    return pairs.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("n_overlaps"))


@query(
    "scd2_dimension",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), changes AS (
  SELECT user_id, ts, event_type FROM ordered
  WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
       COALESCE(strftime(lead(ts) OVER w, '%Y-%m-%d %H:%M:%S.%f'),
                '9999-12-31 00:00:00.000000') AS valid_to,
       CAST(row_number() OVER w AS INT) AS version,
       (lead(ts) OVER w IS NULL) AS is_current
FROM changes
WINDOW w AS (PARTITION BY user_id ORDER BY ts)
""",
)
def q_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 built from a change log: per user,
    consecutive duplicate states collapse and each surviving state gets
    [valid_from, valid_to) plus a version number and current flag — the
    standard warehouse compaction of CDC streams (the reference's analog
    is upsert-by-id overwrite, TencentVDB.py:70, which keeps only the
    LAST state; SCD2 keeps the history queryably).

    Scale shape: both windows partition by user_id, so one hash shuffle
    covers the lag-filter and the lead/version pass; no global sort."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w1 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select("user_id", "ts", "event_type", "event_id")
        .withColumn("prev", F.lag("event_type").over(w1))
        .where(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts")
    nxt = F.lead("ts").over(w2)
    return changes.select(
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("valid_from"),
        F.coalesce(
            F.date_format(nxt, "yyyy-MM-dd HH:mm:ss.SSSSSS"),
            F.lit("9999-12-31 00:00:00.000000"),
        ).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
        nxt.isNull().alias("is_current"),
    )


@query(
    "multimodal_selfmatch_gate",
    oracle="SELECT doc_id, TRUE AS self_top1 FROM documents WHERE doc_id < 50",
)
def q_multimodal_selfmatch_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal decode→featurize→search pipeline graduated to an
    oracle gate (the features themselves are seeded-RNG byte histograms
    DuckDB cannot replay): each of the 50 query docs, searched against a
    200-doc feature corpus (the same subset multimodal_features_knn
    exercises), must retrieve ITSELF at rank 1 — cosine(self, self) is
    exactly 1.0 and the id tiebreak only loses if another payload had a
    bit-identical histogram, so the hash pins decode determinism,
    feature stability, and kNN ordering in one boolean per doc.  The
    featurize pipeline is localCheckpointed so query and corpus sides
    share ONE execution instead of re-synthesizing per consumer."""
    from crawling_vectordb_llm_spark.operators.knn import knn_join_numpy

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    feats = MM.extract_features(MM.synth_media(docs)).localCheckpoint()
    queries = feats.where(F.col("doc_id") < 50).select(
        F.col("doc_id").alias("query_id"), F.col("features").alias("query_vec")
    )
    top1 = knn_join_numpy(
        queries, feats, k=1, corpus_id="doc_id", corpus_vec="features"
    )
    return top1.select(
        F.col("query_id").alias("doc_id"),
        (F.col("doc_id") == F.col("query_id")).alias("self_top1"),
    )


@query(
    "snapshot_diff",
    oracle="""
WITH v1 AS (
  SELECT doc_id, lang, md5(text) AS h FROM documents WHERE doc_id % 10 <> 0
), v2 AS (
  SELECT doc_id, lang,
         md5(CASE WHEN doc_id % 7 = 0 THEN text || ' [rev2]' ELSE text END) AS h
  FROM documents WHERE doc_id % 10 <> 1
)
SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
       COALESCE(v1.lang, v2.lang) AS lang,
       CASE WHEN v1.doc_id IS NULL THEN 'added'
            WHEN v2.doc_id IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
WHERE v1.doc_id IS NULL OR v2.doc_id IS NULL OR v1.h <> v2.h
""",
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff: classify every document as added / removed /
    content-changed between two corpus versions — the audit table a
    100 TB pipeline materializes between crawl refreshes to decide what
    to re-embed, re-dedup, and re-shard (composes with
    incremental_reembed, which consumes exactly the 'added'+'changed'
    set).  The two versions are derived deterministically from the one
    fixture (v1 drops doc_id%10==0, v2 drops %10==1 and revises %7==0)
    so the oracle replays them exactly; against real versioned
    collections the same plan reads two snapshots via time travel
    (versioning.py).

    Scale shape: each side projects down to (doc_id, lang, content-hash)
    BEFORE the full-outer join, so the single id-keyed shuffle moves
    fixed-width rows, never document text; unchanged docs (the vast
    majority between refreshes) are filtered pre-output without ever
    being collected.  At 100 TB both sides bucket by doc_id at write
    time, making the diff a zero-shuffle sort-merge."""
    d = _t(spark, sf_dir, "documents")
    v1 = d.where(F.col("doc_id") % 10 != 0).select(
        "doc_id", "lang", F.md5("text").alias("h")
    )
    v2 = d.where(F.col("doc_id") % 10 != 1).select(
        "doc_id",
        "lang",
        F.md5(
            F.when(
                F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" [rev2]"))
            ).otherwise(F.col("text"))
        ).alias("h"),
    )
    a = v1.alias("a")
    b = v2.alias("b")
    j = a.join(b, F.col("a.doc_id") == F.col("b.doc_id"), "full_outer")
    return j.where(
        F.col("a.doc_id").isNull()
        | F.col("b.doc_id").isNull()
        | (F.col("a.h") != F.col("b.h"))
    ).select(
        F.coalesce(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_id"),
        F.coalesce(F.col("a.lang"), F.col("b.lang")).alias("lang"),
        F.when(F.col("a.doc_id").isNull(), "added")
        .when(F.col("b.doc_id").isNull(), "removed")
        .otherwise("changed")
        .alias("status"),
    )


@query(
    "corpus_drift_psi",
    oracle="""
WITH v1 AS (
  SELECT lang, CAST(floor(length(text) / 100) AS BIGINT) AS len_bucket
  FROM documents WHERE doc_id % 10 <> 0
), v2 AS (
  SELECT lang,
         CAST(floor(length(CASE WHEN doc_id % 7 = 0 THEN text || ' [rev2]'
                                ELSE text END) / 100) AS BIGINT) AS len_bucket
  FROM documents WHERE doc_id % 10 <> 1
), b1 AS (
  SELECT feature, bucket, COUNT(*) AS n1 FROM (
    SELECT 'lang' AS feature, lang AS bucket FROM v1
    UNION ALL
    SELECT 'len_bucket', CAST(len_bucket AS VARCHAR) FROM v1
  ) GROUP BY feature, bucket
), b2 AS (
  SELECT feature, bucket, COUNT(*) AS n2 FROM (
    SELECT 'lang' AS feature, lang AS bucket FROM v2
    UNION ALL
    SELECT 'len_bucket', CAST(len_bucket AS VARCHAR) FROM v2
  ) GROUP BY feature, bucket
), t1 AS (SELECT feature, CAST(SUM(n1) AS DOUBLE) AS tot1 FROM b1 GROUP BY feature),
t2 AS (SELECT feature, CAST(SUM(n2) AS DOUBLE) AS tot2 FROM b2 GROUP BY feature),
j AS (
  SELECT COALESCE(b1.feature, b2.feature) AS feature,
         COALESCE(b1.bucket, b2.bucket) AS bucket,
         COALESCE(b1.n1, 0) AS n1, COALESCE(b2.n2, 0) AS n2
  FROM b1 FULL OUTER JOIN b2
    ON b1.feature = b2.feature AND b1.bucket = b2.bucket
), p AS (
  SELECT j.feature, j.bucket, j.n1, j.n2,
         GREATEST(j.n1 / t1.tot1, 1e-6) AS p1,
         GREATEST(j.n2 / t2.tot2, 1e-6) AS p2
  FROM j JOIN t1 ON j.feature = t1.feature JOIN t2 ON j.feature = t2.feature
)
SELECT feature, bucket, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       ROUND(p1, 6) AS p1, ROUND(p2, 6) AS p2,
       ROUND((p2 - p1) * ROUND(ln(p2 / p1), 4), 6) AS psi_term
FROM p
""",
)
def q_corpus_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus drift report between two snapshot versions: the population
    stability index terms of the language mix and the document-length
    histogram — the statistical companion to `snapshot_diff` (that one
    says WHICH docs changed; this one says whether the corpus SHAPE
    moved, which is what retrain/remix decisions key on; PSI > 0.2 per
    feature is the classic act threshold).  Versions are derived exactly
    as in snapshot_diff (v1 drops id%10==0, v2 drops %10==1 and revises
    %7==0 — the revision genuinely shifts length buckets).

    Determinism: proportions are exact-integer ratios in double
    (identical cross-engine), empty buckets clip at 1e-6 (standard PSI
    smoothing AND the log-domain guard), and each ln() quantizes at 4 dp
    BEFORE entering the 6-dp term (SCALE.md libm rule — JVM and libc
    logs differ in the last bit).  The per-bucket terms are the output;
    the per-feature PSI is their sum, one aggregation away.

    Scale shape: two projection scans → per-(feature, bucket) counts
    (partial-aggregable; bucket cardinality is tiny by construction) →
    everything downstream operates on the few-dozen-row bucket table."""
    d = _t(spark, sf_dir, "documents")
    v1 = d.where(F.col("doc_id") % 10 != 0).select("lang", F.col("text"))
    v2 = d.where(F.col("doc_id") % 10 != 1).select(
        "lang",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" [rev2]"))
        ).otherwise(F.col("text")).alias("text"),
    )

    def buckets(v: DataFrame, n_col: str) -> DataFrame:
        lb = F.floor(F.length("text") / 100).cast("bigint").cast("string")
        both = v.select(F.lit("lang").alias("feature"), F.col("lang").alias("bucket")).unionByName(
            v.select(F.lit("len_bucket").alias("feature"), lb.alias("bucket"))
        )
        return both.groupBy("feature", "bucket").agg(
            F.count(F.lit(1)).alias(n_col)
        )

    b1, b2 = buckets(v1, "n1"), buckets(v2, "n2")
    # r13 (guide §5): the joined bucket table is a few dozen rows but was
    # consumed by BOTH the totals aggregate and the PSI projection — each
    # re-ran the full-outer join AND both text-scan bucket passes.
    # Checkpointing the tiny table computes the snapshot scans once.
    j = (
        b1.join(b2, ["feature", "bucket"], "full_outer")
        .na.fill({"n1": 0, "n2": 0})
        .localCheckpoint()
    )
    t = j.groupBy("feature").agg(
        F.sum("n1").cast("double").alias("tot1"),
        F.sum("n2").cast("double").alias("tot2"),
    )
    p = j.join(F.broadcast(t), "feature").select(
        "feature", "bucket",
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        F.greatest(F.col("n1") / F.col("tot1"), F.lit(1e-6)).alias("p1"),
        F.greatest(F.col("n2") / F.col("tot2"), F.lit(1e-6)).alias("p2"),
    )
    return p.select(
        "feature", "bucket", "n1", "n2",
        F.round("p1", 6).alias("p1"),
        F.round("p2", 6).alias("p2"),
        F.round(
            (F.col("p2") - F.col("p1")) * F.round(F.log(F.col("p2") / F.col("p1")), 4),
            6,
        ).alias("psi_term"),
    )
