"""Adapted TPC-H query shapes q2-q22 over the driver's TPC-H-ish tables.

SURVEY §2.5 claims a complete relational engine; q3/q18 shapes landed in
round 1 (functions_suite.py).  This module adds the remaining classic
shapes the testdata schema can express.  The schema has no `partsupp`,
`l_commitdate`/`l_receiptdate`/`l_shipmode`, `p_container`/`p_mfgr`, or
`c_phone`, so the affected queries are *adaptations* that keep the
operator shape (the thing being tested) and substitute available columns;
each docstring says exactly what was substituted.

Determinism rules follow registry.py: decimal-cast sums, ratios computed
from decimal-exact doubles then rounded to 6 dp on BOTH sides, dates
rendered as strings, LIMIT queries tie-broken by key.

Scale notes (100 TB): every query broadcasts its dimension side
explicitly (`F.broadcast`), keeps aggregates partial-able (plain
groupBy.agg of codegen expressions — no UDFs), and pushes filters to the
parquet scan.  Correlated-subquery shapes (q17) are expressed as
aggregate-then-join, the form Catalyst can shuffle on the group key
instead of re-scanning per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawling_vectordb_llm_spark.catalog import read_table
from crawling_vectordb_llm_spark.suite.registry import query

_DSUM = "CAST(SUM(CAST({x} AS DECIMAL(22,6))) AS DOUBLE)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def _dsum(col):
    return F.sum(col.cast("decimal(22,6)")).cast("double")


# ---------------------------------------------------------------------------
# q2: min-cost supplier per part.  No partsupp table, so the (part,
# supplier) catalog is derived from lineitem with unit cost
# min(l_extendedprice / l_quantity); supplier region filter EUROPE.
# ---------------------------------------------------------------------------
@query(
    "tpch_q2_shape",
    oracle="""
WITH partsupp AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
), eu AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
), costed AS (
  SELECT p.p_partkey, p.p_name, eu.s_name, eu.n_name, eu.s_acctbal,
         ps.unit_cost,
         MIN(ps.unit_cost) OVER (PARTITION BY p.p_partkey) AS best_cost
  FROM part p
  JOIN partsupp ps ON ps.l_partkey = p.p_partkey
  JOIN eu ON eu.s_suppkey = ps.l_suppkey
  WHERE p.p_size = 15 AND p.p_type = 'STANDARD'
)
SELECT p_partkey, p_name, s_name, n_name,
       ROUND(s_acctbal, 6) AS s_acctbal,
       ROUND(unit_cost, 6) AS unit_cost
FROM costed WHERE unit_cost = best_cost
""",
)
def q_tpch_q2_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per-part argmin over a derived part-supplier
    catalog, dimension chain broadcast, window-min instead of a
    correlated subquery (one shuffle on p_partkey, no rescan)."""
    l = _t(spark, sf_dir, "lineitem")
    ps = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eu = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    from pyspark.sql import Window

    costed = (
        ps.join(F.broadcast(eu), ps["l_suppkey"] == eu["s_suppkey"])
        .join(F.broadcast(p), ps["l_partkey"] == p["p_partkey"])
        .withColumn(
            "best_cost",
            F.min("unit_cost").over(Window.partitionBy("p_partkey")),
        )
    )
    return costed.where(F.col("unit_cost") == F.col("best_cost")).select(
        "p_partkey",
        "p_name",
        "s_name",
        "n_name",
        F.round("s_acctbal", 6).alias("s_acctbal"),
        F.round("unit_cost", 6).alias("unit_cost"),
    )


# ---------------------------------------------------------------------------
# q4: order priority checking.  No l_commitdate/l_receiptdate; "late" is
# adapted to l_shipdate > o_orderdate + 30 days.
# ---------------------------------------------------------------------------
@query(
    "tpch_q4_shape",
    oracle="""
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o.o_orderpriority
""",
)
def q_tpch_q4_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelated to a left-semi join, then a
    tiny 5-group aggregate (late := shipped >30 days after order)."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01")
    )
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        l,
        (o["o_orderkey"] == l["l_orderkey"])
        & (l["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


# ---------------------------------------------------------------------------
# q5: local supplier volume (ASIA) — customer and supplier in the SAME
# nation, revenue per nation for one year.
# ---------------------------------------------------------------------------
@query(
    "tpch_q5_shape",
    oracle=f"""
SELECT n.n_name, {_DSUM.format(x='l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
""",
)
def q_tpch_q5_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: the classic 6-way snowflake.  Fact-fact join
    (lineitem x orders) shuffles on orderkey; every dimension
    (customer, supplier, nation, region) is broadcast."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(
            F.broadcast(s),
            (l["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


# ---------------------------------------------------------------------------
# q6: forecast revenue — the pure scan/filter/agg query.
# ---------------------------------------------------------------------------
@query(
    "tpch_q6_shape",
    oracle=f"""
SELECT {_DSUM.format(x='l_extendedprice * l_discount')} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q_tpch_q6_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: scan-dominated filter + global agg.  All four predicates
    reach the parquet reader (PushedFilters) and the projection prunes to
    4 columns; the aggregate is a single partial+final pair."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dsum(F.col("l_extendedprice") * F.col("l_discount")).alias(
                "revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# q7: volume shipping between two nations, by year.
# ---------------------------------------------------------------------------
@query(
    "tpch_q7_shape",
    oracle=f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       EXTRACT(YEAR FROM l.l_shipdate) AS l_year,
       {_DSUM.format(x='l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
WHERE ((sn.n_name = 'NATION_19' AND cn.n_name = 'NATION_11')
    OR (sn.n_name = 'NATION_11' AND cn.n_name = 'NATION_19'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY supp_nation, cust_nation, l_year
""",
)
def q_tpch_q7_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: nation-pair OR predicate across two broadcast copies of
    the nation dim, grouped by shipping year."""
    s = _t(spark, sf_dir, "supplier")
    l = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    # nation pair populated at every fixture scale (sf0.001 has only 10
    # supplier nations; NATION_1/2 hold none there)
    pair = (F.col("supp_nation") == "NATION_19") & (
        F.col("cust_nation") == "NATION_11"
    ) | (F.col("supp_nation") == "NATION_11") & (
        F.col("cust_nation") == "NATION_19"
    )
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(sn), s["s_nationkey"] == F.col("sn_key"))
        .join(F.broadcast(cn), c["c_nationkey"] == F.col("cn_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


# ---------------------------------------------------------------------------
# q8: national market share within a region, by year.
# ---------------------------------------------------------------------------
@query(
    "tpch_q8_shape",
    oracle=f"""
WITH all_lines AS (
  SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         sn.n_name AS supp_nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN region r ON cn.n_regionkey = r.r_regionkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate < TIMESTAMP '1998-01-01'
)
SELECT o_year,
       ROUND({_DSUM.format(x="CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END")}
             / {_DSUM.format(x='volume')}, 6) AS mkt_share
FROM all_lines GROUP BY o_year
""",
)
def q_tpch_q8_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: conditional-sum / sum ratio (market share of NATION_3
    suppliers inside AMERICA for ECONOMY parts).  Both sums are
    decimal-exact so the 6-dp ratio is bit-stable across engines."""
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_regionkey").alias("cn_region"),
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    lines = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(cn), c["c_nationkey"] == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == r["r_regionkey"])
        .join(F.broadcast(sn), s["s_nationkey"] == F.col("sn_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    nat = F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
        0.0
    )
    return lines.groupBy("o_year").agg(
        F.round(_dsum(nat) / _dsum(F.col("volume")), 6).alias("mkt_share")
    )


# ---------------------------------------------------------------------------
# q9: product-type profit by nation and year.  No ps_supplycost; cost is
# adapted to 0.6 * p_retailprice * l_quantity.
# ---------------------------------------------------------------------------
@query(
    "tpch_q9_shape",
    oracle=f"""
SELECT n.n_name AS nation, EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
       {_DSUM.format(x='l.l_extendedprice * (1 - l.l_discount) - 0.6 * p.p_retailprice * l.l_quantity')} AS sum_profit
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%red%'
GROUP BY nation, o_year
""",
)
def q_tpch_q9_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: LIKE-filtered part dim, profit expression summed
    per (supplier nation, order year); supply cost adapted to
    0.6 * p_retailprice."""
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(_dsum(profit).alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# q10: returned-item reporting — top 20 customers by lost revenue.
# ---------------------------------------------------------------------------
@query(
    "tpch_q10_shape",
    oracle=f"""
SELECT c.c_custkey, c.c_name,
       {_DSUM.format(x='l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       ROUND(c.c_acctbal, 6) AS c_acctbal, n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey LIMIT 20
""",
)
def q_tpch_q10_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: quarter of returned lineitems, revenue per customer,
    global top-20 via TakeOrderedAndProject (ties broken by custkey)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    l = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 6).alias("c_acctbal"),
            "n_name",
        )
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


# ---------------------------------------------------------------------------
# q12: shipping-delay priority counting.  No l_shipmode; lines are
# bucketed by lateness band instead (SLOW >60d, QUICK otherwise).
# ---------------------------------------------------------------------------
@query(
    "tpch_q12_shape",
    oracle="""
SELECT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
            THEN 'SLOW' ELSE 'QUICK' END AS ship_band,
       COUNT(*) FILTER (WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH'))
         AS high_line_count,
       COUNT(*) FILTER (WHERE o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
         AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY ship_band
""",
)
def q_tpch_q12_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: derived band column + conditional counts
    (l_shipmode adapted to a lateness band)."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .withColumn(
            "ship_band",
            F.when(
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                "SLOW",
            ).otherwise("QUICK"),
        )
        .groupBy("ship_band")
        .agg(
            F.count_if(hi).alias("high_line_count"),
            F.count_if(~hi).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# q13: customer distribution by order count (left outer + double agg).
# The comment-pattern exclusion is adapted to o_orderstatus <> 'P'.
# ---------------------------------------------------------------------------
@query(
    "tpch_q13_shape",
    oracle="""
WITH c_orders AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderstatus <> 'P'
  GROUP BY c.c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM c_orders GROUP BY c_count
""",
)
def q_tpch_q13_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: left-outer join preserving order-less customers, then
    a second aggregation over the per-customer counts.  COUNT(o_orderkey)
    counts non-null only, so order-less customers land in c_count=0."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") != "P")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_outer")
        .groupBy(c["c_custkey"])
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------------------
# q14: promotion revenue share for one month.
# ---------------------------------------------------------------------------
@query(
    "tpch_q14_shape",
    oracle=f"""
SELECT ROUND(100.0 * {_DSUM.format(x="CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
             / {_DSUM.format(x='l.l_extendedprice * (1 - l.l_discount)')}, 6) AS promo_revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
  AND l.l_shipdate < TIMESTAMP '1996-04-01'
""",
)
def q_tpch_q14_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: conditional-revenue percentage for PROMO parts in one
    month; part dim broadcast, single global aggregate."""
    l = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-03-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .agg(
            F.round(F.lit(100.0) * _dsum(promo) / _dsum(rev), 6).alias(
                "promo_revenue"
            )
        )
    )


# ---------------------------------------------------------------------------
# q15: top supplier(s) by revenue for one quarter.
# ---------------------------------------------------------------------------
@query(
    "tpch_q15_shape",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {_DSUM.format(x='l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
)
def q_tpch_q15_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: revenue view + scalar-max subquery.  The max is joined
    back as a broadcast cross of a 1-row aggregate; revenue values are
    decimal-exact so the equality is safe across engines."""
    l = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    s = _t(spark, sf_dir, "supplier")
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    best = revenue.agg(F.max("total_revenue").alias("best_rev"))
    return (
        revenue.join(F.broadcast(best))
        .where(F.col("total_revenue") == F.col("best_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# q16: supplier count per part attribute group.  partsupp is derived from
# lineitem; the complaint exclusion is adapted to s_acctbal < 0.
# ---------------------------------------------------------------------------
@query(
    "tpch_q16_shape",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#5'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 9, 15, 23, 36, 45, 49, 3)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
""",
)
def q_tpch_q16_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN decorrelated to a broadcast anti join,
    COUNT(DISTINCT) per part-attribute group over the derived
    part-supplier relation."""
    l = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 15, 23, 36, 45, 49, 3)
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(
            F.broadcast(bad), l["l_suppkey"] == bad["s_suppkey"], "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# q17: small-quantity-order revenue (correlated avg per part).
# ---------------------------------------------------------------------------
@query(
    "tpch_q17_shape",
    oracle=f"""
WITH part_avg AS (
  SELECT l_partkey,
         {_DSUM.format(x='l_quantity')} / COUNT(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT ROUND({_DSUM.format(x='l.l_extendedprice')} / 7.0, 6) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN part_avg a ON a.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3' AND l.l_quantity < 0.2 * a.avg_qty
""",
)
def q_tpch_q17_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: the correlated per-part AVG is decorrelated into an
    aggregate-then-join (one shuffle on partkey, no per-row rescan).
    The average is computed as decimal-exact-sum / count so both engines
    compare against the identical double."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    part_avg = l.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (_dsum(F.col("l_quantity")) / F.count("*")).alias("avg_qty")
    )
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(part_avg, l["l_partkey"] == F.col("a_partkey"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(_dsum(F.col("l_extendedprice")) / 7.0, 6).alias(
                "avg_yearly"
            )
        )
    )


# ---------------------------------------------------------------------------
# q19: disjunctive brand/size/quantity predicate revenue.  p_container
# is adapted to p_size bands.
# ---------------------------------------------------------------------------
@query(
    "tpch_q19_shape",
    oracle=f"""
SELECT {_DSUM.format(x='l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity >= 1 AND l.l_quantity <= 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity >= 10 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 20 AND l.l_quantity <= 30)
""",
)
def q_tpch_q19_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: three OR'd conjunctions spanning both join sides —
    the join stays an equi-join on partkey with the disjunction applied
    post-join (Catalyst cannot push a cross-side OR below the join)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    c1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    c2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    c3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .where(c1 | c2 | c3)
        .agg(
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count("*").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# q21: suppliers who were the only late supplier on a finished
# multi-supplier order.  "Late" adapted to shipped >60 days after order.
# ---------------------------------------------------------------------------
@query(
    "tpch_q21_shape",
    oracle="""
WITH lines AS (
  SELECT l.l_orderkey, l.l_suppkey,
         l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY AS is_late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
)
SELECT s.s_name, COUNT(DISTINCT l1.l_orderkey) AS numwait
FROM lines l1
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE l1.is_late
  AND n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4', 'NATION_5')
  AND EXISTS (SELECT 1 FROM lines l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lines l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.is_late)
GROUP BY s.s_name
""",
)
def q_tpch_q21_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: EXISTS + NOT EXISTS over the same derived relation,
    decorrelated into one per-order aggregate instead of two self-joins:
    an order contributes iff it has >1 distinct supplier and exactly one
    late supplier — computed with a single groupBy(l_orderkey), then the
    surviving (orderkey, late supplier) pairs join the supplier dim.
    numwait counts waiting ORDERS per supplier (COUNT(DISTINCT
    l1.l_orderkey) in the oracle) — the textbook form counts late LINES,
    which double-counts a supplier shipping several late lines in one
    order.  Same result set as the anti/semi-join pair otherwise, one
    shuffle fewer, and immune to the skewed-orderkey self-join."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(
        F.col("n_name").isin(
            "NATION_1", "NATION_2", "NATION_3", "NATION_4", "NATION_5"
        )
    )
    lines = l.join(o, l["l_orderkey"] == o["o_orderkey"]).select(
        l["l_orderkey"].alias("ok"),
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ).alias("is_late"),
    )
    # two-stage instead of a multi-distinct aggregate: two distinct
    # columns would plan an Expand (3x the shuffled rows); rolling up to
    # (order, supplier) first shuffles each distinct pair once and the
    # second stage counts plain rows (measured 0.69s vs 0.98s at sf0.1)
    per_supp = lines.groupBy("ok", "l_suppkey").agg(
        F.max("is_late").alias("late")
    )
    per_order = per_supp.groupBy("ok").agg(
        F.count("*").alias("n_supp"),
        F.count_if("late").alias("n_late_supp"),
        F.max(F.when(F.col("late"), F.col("l_suppkey"))).alias("late_supp"),
    )
    waiting = per_order.where(
        (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
    ).select("late_supp")
    return (
        waiting.join(
            F.broadcast(s), F.col("late_supp") == s["s_suppkey"]
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"], "left_semi")
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


# ---------------------------------------------------------------------------
# q22: global sales opportunity.  c_phone country code is adapted to
# digits 8-9 of the customer number in c_name, and "no orders" (every
# customer here has some) to "no orders since 2000".
# ---------------------------------------------------------------------------
@query(
    "tpch_q22_shape",
    oracle=f"""
WITH pos AS (
  SELECT {_DSUM.format(x='c_acctbal')} / COUNT(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0.0
)
SELECT SUBSTRING(c.c_name, 17, 2) AS cntrycode,
       COUNT(*) AS numcust,
       {_DSUM.format(x='c.c_acctbal')} AS totacctbal
FROM customer c, pos
WHERE c.c_acctbal > pos.avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY cntrycode
""",
)
def q_tpch_q22_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: scalar-avg subquery + anti join against recent orders,
    grouped by a derived country code (substr of c_name, standing in for
    c_phone).  The average is decimal-exact-sum / count, broadcast as a
    1-row cross join."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    code = F.substring("c_name", 17, 2)
    pos = c.where(F.col("c_acctbal") > 0.0).agg(
        (_dsum(F.col("c_acctbal")) / F.count("*")).alias("avg_bal")
    )
    return (
        c.join(F.broadcast(pos))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == o["o_custkey"], "left_anti")
        .groupBy(code.alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            _dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# q11: important-stock identification.  partsupp is derived from lineitem
# exactly as in the q2 adaptation (availqty = total shipped quantity,
# supplycost = min unit price); the GERMANY filter becomes region ASIA
# (every fixture sf has ASIA suppliers); TPC-H's absolute FRACTION
# threshold (0.0001/SF) becomes the scale-free "value > 2x the mean part
# value", which selects a non-trivial subset at every fixture sf.
# ---------------------------------------------------------------------------
@query(
    "tpch_q11_shape",
    oracle="""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(22,6))) AS DOUBLE) AS availqty,
         MIN(l_extendedprice / l_quantity) AS supplycost
  FROM lineitem GROUP BY l_partkey, l_suppkey
), asia AS (
  SELECT s_suppkey FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
), v AS (
  SELECT l_partkey,
         CAST(SUM(CAST(availqty * supplycost AS DECIMAL(22,6))) AS DOUBLE)
           AS value
  FROM ps JOIN asia ON ps.l_suppkey = asia.s_suppkey GROUP BY l_partkey
)
SELECT l_partkey AS partkey, ROUND(value, 6) AS value
FROM v WHERE value > 2.0 * (SELECT CAST(SUM(CAST(value AS DECIMAL(22,6))) AS DOUBLE) / COUNT(*) FROM v)
""",
)
def q_tpch_q11_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: group-by over the derived part-supplier relation,
    supplier side restricted by a broadcast dim chain, and the global
    HAVING threshold as a broadcast scalar subquery (one extra reduce of
    the tiny per-part aggregate — never a rescan of lineitem).  Per-part
    value sums are pinned order-independent by the decimal(22,6) cast of
    each availqty*supplycost product before summation, on both engines."""
    l = _t(spark, sf_dir, "lineitem")
    asia = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey")
    )
    # r14 (guide §2.3): the ASIA restriction is on l_suppkey — a GROUPING
    # key of the ps aggregation — so filtering lineitem BEFORE aggregating
    # yields bit-identical (availqty, supplycost) for every surviving
    # (partkey, suppkey) group while the (pk, sk) exchange now carries
    # only the ~1-in-5 asia share of the partial aggregates (the r13 plan
    # aggregated ALL of lineitem and applied the broadcast join after).
    ps = (
        l.join(F.broadcast(asia), l["l_suppkey"] == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            _dsum(F.col("l_quantity")).alias("availqty"),
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "supplycost"
            ),
        )
    )
    v = ps.groupBy("l_partkey").agg(
        F.sum(
            (F.col("availqty") * F.col("supplycost")).cast("decimal(22,6)")
        )
        .cast("double")
        .alias("value")
    )
    # the global mean must ALSO be decimal-pinned: the per-part values are
    # exact 6-dp doubles, but summing them as raw doubles would make the
    # threshold partition-order-dependent — a part landing within an ulp
    # of 2x-mean could then flip in/out per run or per engine
    thresh = v.agg(
        (
            2.0
            * F.sum(F.col("value").cast("decimal(22,6)")).cast("double")
            / F.count("*")
        ).alias("thresh")
    )
    return (
        v.join(F.broadcast(thresh))
        .where(F.col("value") > F.col("thresh"))
        .select(
            F.col("l_partkey").alias("partkey"), F.round("value", 6).alias("value")
        )
    )


# ---------------------------------------------------------------------------
# q20: potential-part-promotion suppliers.  p_name LIKE 'forest%' becomes
# LIKE '%widget' (the fixture's part names are '<adj> <noun>'); availqty
# is the derived all-time shipped quantity per (part, supplier), and the
# q20 condition "availqty > 0.5 * year's shipped qty" becomes "1996
# accounted for less than half of the supplier's all-time volume of that
# part"; CANADA becomes region AFRICA.
# ---------------------------------------------------------------------------
@query(
    "tpch_q20_shape",
    oracle="""
WITH shipped AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(22,6))) AS DOUBLE) AS total_qty,
         CAST(SUM(CAST(CASE WHEN year(l_shipdate) = 1996 THEN l_quantity
                            ELSE 0 END AS DECIMAL(22,6))) AS DOUBLE)
           AS qty_1996
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE '%widget'
  GROUP BY l_partkey, l_suppkey
), cands AS (
  SELECT DISTINCT l_suppkey FROM shipped
  WHERE qty_1996 > 0 AND total_qty > 2 * qty_1996
)
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'AFRICA'
  AND s_suppkey IN (SELECT l_suppkey FROM cands)
""",
)
def q_tpch_q20_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: the nested IN subqueries decorrelate into one
    aggregate over the part-filtered lineitem (part side broadcast) and a
    LEFT SEMI join from the region-filtered supplier dim to the candidate
    suppkeys — no correlated rescans, one shuffle on (partkey, suppkey)."""
    l = _t(spark, sf_dir, "lineitem")
    widget = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").like("%widget"))
        .select("p_partkey")
    )
    shipped = (
        l.join(F.broadcast(widget), l["l_partkey"] == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            _dsum(F.col("l_quantity")).alias("total_qty"),
            _dsum(
                F.when(F.year("l_shipdate") == 1996, F.col("l_quantity"))
                .otherwise(F.lit(0))
            ).alias("qty_1996"),
        )
    )
    cands = (
        shipped.where(
            (F.col("qty_1996") > 0)
            & (F.col("total_qty") > 2 * F.col("qty_1996"))
        )
        .select("l_suppkey")
        .distinct()
    )
    return (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").where(F.col("r_name") == "AFRICA")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .join(
            cands, F.col("s_suppkey") == cands["l_suppkey"], "left_semi"
        )
        .select("s_suppkey", "s_name", "n_name")
    )
