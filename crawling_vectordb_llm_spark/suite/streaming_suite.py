"""Event-time window queries over `events` — batch variants (oracle-checked)
plus the Structured Streaming tumbling agg (same oracle: streaming and batch
must agree on final results).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawling_vectordb_llm_spark.catalog import read_table, table_path
from crawling_vectordb_llm_spark.streaming import windows as W
from crawling_vectordb_llm_spark.suite.registry import query

_DSUM_V = "CAST(SUM(CAST(value AS DECIMAL(22,6))) AS DOUBLE)"

_TUMBLING_ORACLE = f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, COUNT(*) AS n, {_DSUM_V} AS total_value
FROM events GROUP BY 1, 2
"""


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "events")


@query("tumbling_window", oracle=_TUMBLING_ORACLE)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.tumbling_agg(_events(spark, sf_dir), "1 hour")


@query(
    "sliding_window",
    oracle=f"""
SELECT strftime(make_timestamp((CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800 - off)
                               * 1000000), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, COUNT(*) AS n, {_DSUM_V} AS total_value
FROM events CROSS JOIN (SELECT unnest([0, 1800]) AS off)
GROUP BY 1, 2
""",
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1h windows sliding every 30min: each event lands in exactly 2 windows
    (oracle materializes both bucket starts explicitly)."""
    return W.sliding_agg(_events(spark, sf_dir), "1 hour", "30 minutes")


@query(
    "sessionize",
    oracle=f"""
WITH x AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
  FROM x
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events, {_DSUM_V} AS total_value,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start
FROM s GROUP BY user_id, session_id
""",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap (batch path)."""
    return W.sessionize_batch(_events(spark, sf_dir), gap_seconds=1800)


@query(
    "session_window_fn",
    oracle=f"""
WITH x AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
  FROM x
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
       COUNT(*) AS n, {_DSUM_V} AS total_value
FROM s GROUP BY user_id, session_id
""",
)
def q_session_window_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NATIVE session_window() function (gap merge in the engine) —
    must agree with the manual lag/cumsum sessionization oracle."""
    from pyspark.sql import functions as F

    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(22,6)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            "user_id",
            F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("sw.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n",
            "total_value",
        )
    )


@query("streaming_tumbling_window", oracle=_TUMBLING_ORACLE)
def q_streaming_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same tumbling agg executed as a Structured Streaming query
    (file source → watermark → windowed agg → memory sink, availableNow);
    final results must equal the batch/oracle answer."""
    return W.run_streaming_tumbling(spark, table_path(sf_dir, "events"), "1 hour")


@query(
    "streaming_dedup",
    oracle="""
SELECT event_type, COUNT(*) AS n_keys
FROM (SELECT DISTINCT user_id, event_type FROM events)
GROUP BY event_type
""",
)
def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-side dedup: dropDuplicatesWithinWatermark over (user_id,
    event_type) with a 10-minute watermark (bounded state), then a batch
    per-type count of surviving keys.  The final `.distinct()` closes the
    multi-microbatch replay edge case documented in streaming/dedup.py —
    on the single-batch availableNow drain it is a no-op."""
    from crawling_vectordb_llm_spark.streaming.dedup import run_streaming_dedup

    deduped = run_streaming_dedup(
        spark, table_path(sf_dir, "events"), ["user_id", "event_type"]
    )
    return (
        deduped.distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_keys"))
    )


@query(
    "streaming_stream_join",
    oracle="""
SELECT strftime(c.ts, '%Y-%m-%d') AS click_day, COUNT(*) AS n_pairs
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 24 HOUR
GROUP BY 1
""",
)
def q_streaming_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (clicks x same-user purchases within
    24h), both sides watermarked so join state is bounded; final appended
    matches aggregated per click day.  On the finite availableNow replay
    the result equals the batch interval join — the oracle IS that batch
    join."""
    from crawling_vectordb_llm_spark.streaming.dedup import (
        run_stream_stream_join,
    )

    pairs = run_stream_stream_join(spark, table_path(sf_dir, "events"))
    return pairs.groupBy(
        F.date_format("l_ts", "yyyy-MM-dd").alias("click_day")
    ).agg(F.count(F.lit(1)).alias("n_pairs"))


@query(
    "streaming_static_join",
    oracle="""
SELECT c.c_mktsegment AS segment, e.event_type, COUNT(*) AS n_events
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
""",
)
def q_streaming_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment (streaming/dedup.py
    run_stream_static_join): the events file stream joined per-microbatch
    to the static customer dimension, aggregated by (segment, event_type).
    The stream side never shuffles pre-aggregation; the dim is a broadcast
    — the shape a 100 TB/day ingest enrichment must have."""
    from crawling_vectordb_llm_spark.streaming.dedup import run_stream_static_join

    dim = (
        spark.read.parquet(table_path(sf_dir, "customer"))
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    joined = run_stream_static_join(spark, table_path(sf_dir, "events"), dim, "user_id")
    return joined.groupBy(
        F.col("c_mktsegment").alias("segment"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))


@query(
    "event_funnel",
    oracle="""
WITH s AS (
  SELECT user_id, MIN(ts) AS ts FROM events WHERE event_type = 'signup' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS ts
  FROM events e JOIN s ON e.user_id = s.user_id AND e.ts > s.ts
  WHERE e.event_type = 'click' GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS ts
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.ts
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM s) AS n_signup,
       (SELECT COUNT(*) FROM c) AS n_click_after,
       (SELECT COUNT(*) FROM p) AS n_purchase_after
""",
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who signed up, then clicked AFTER the signup,
    then purchased AFTER that click (first-occurrence semantics per
    stage).  Each stage is one aggregation joined forward on (user, ts >
    prev_ts) — the per-user event sets are small, so the stage joins
    shuffle only (user_id, ts) pairs, never the event payload."""
    ev = read_table(spark, sf_dir, "events")
    s = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(s, "user_id")
        .where(F.col("ts") > F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        s.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click_after")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase_after")))
    )


@query(
    "window_anomaly_zscore",
    oracle="""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS w, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT event_type, w, n,
         SUM(n) OVER f AS s,
         SUM(n * n) OVER f AS sq,
         COUNT(*) OVER f AS c
  FROM hourly
  WINDOW f AS (PARTITION BY event_type ORDER BY w
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, strftime(w, '%Y-%m-%d %H:%M:%S') AS window_start, n,
       CAST(floor(
         (n - s / CAST(c AS DOUBLE))
         / sqrt((sq - s * s / CAST(c AS DOUBLE)) / (c - 1) + 1e-9)
         * 1000 + 0.5) AS BIGINT) AS z_e3
FROM stats
WHERE c >= 12
  AND abs((n - s / CAST(c AS DOUBLE))
          / sqrt((sq - s * s / CAST(c AS DOUBLE)) / (c - 1) + 1e-9)) > 2
""",
)
def q_window_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling anomaly detection: hourly event counts per type, z-scored
    against the trailing 24 windows (frame excludes the current row), flag
    |z| > 2.  Determinism: the rolling moments are INTEGER sums over the
    frame (order-free, exact); mean/variance derive from them with
    identical double ops in both engines; z is emitted in milli-units via
    floor fixed-point (FIXTURES.md rule).  One shuffle for the hourly agg,
    one keyed window pass."""
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    f = (
        Window.partitionBy("event_type")
        .orderBy("w")
        .rowsBetween(-24, -1)
    )
    stats = hourly.select(
        "event_type",
        "w",
        "n",
        F.sum("n").over(f).alias("s"),
        F.sum(F.col("n") * F.col("n")).over(f).alias("sq"),
        F.count(F.lit(1)).over(f).alias("c"),
    )
    mean = F.col("s") / F.col("c").cast("double")
    var = (F.col("sq") - F.col("s") * F.col("s") / F.col("c").cast("double")) / (
        F.col("c") - 1
    )
    z = (F.col("n") - mean) / F.sqrt(var + F.lit(1e-9))
    return (
        stats.where(F.col("c") >= 12)
        .where(F.abs(z) > 2)
        .select(
            "event_type",
            F.date_format("w", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
            F.floor(z * 1000 + F.lit(0.5)).cast("bigint").alias("z_e3"),
        )
    )


@query(
    "rolling_distinct_users",
    oracle="""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS d, user_id
  FROM events GROUP BY 1, 2, 3
), days AS (
  SELECT DISTINCT event_type, d FROM daily
)
SELECT days.event_type, strftime(days.d, '%Y-%m-%d') AS day,
       COUNT(DISTINCT daily.user_id) AS uniq_users_7d
FROM days JOIN daily
  ON daily.event_type = days.event_type
 AND daily.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
GROUP BY days.event_type, days.d
""",
)
def q_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per event type.  Spark windows don't
    support COUNT(DISTINCT ...) OVER; the idiomatic bridge is collect_set
    over the frame and size() — set state is bounded by distinct keys in
    the window, which is the same state a native distinct-window would
    hold.  Pre-aggregating to (type, day, user) first keeps the windowed
    rows to distinct triples, not raw events."""
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    daily = ev.select(
        "event_type", F.date_trunc("day", "ts").alias("d"), "user_id"
    ).distinct()
    # rangeBetween over unix days: 6 days back through current
    with_day = daily.withColumn("day_n", F.datediff("d", F.lit("1970-01-01")))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_n")
        .rangeBetween(-6, 0)
    )
    rolled = with_day.withColumn(
        "uniq_users_7d", F.size(F.collect_set("user_id").over(w)).cast("bigint")
    )
    return (
        rolled.groupBy(
            "event_type", F.date_format("d", "yyyy-MM-dd").alias("day")
        )
        .agg(F.max("uniq_users_7d").alias("uniq_users_7d"))
    )


@query(
    "rolling_distinct_users_hll",
    oracle="""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS d, user_id
  FROM events GROUP BY 1, 2, 3
), days AS (
  SELECT DISTINCT event_type, d FROM daily
)
SELECT days.event_type, strftime(days.d, '%Y-%m-%d') AS day,
       COUNT(DISTINCT daily.user_id) AS uniq_users_7d,
       TRUE AS hll_ok
FROM days JOIN daily
  ON daily.event_type = days.event_type
 AND daily.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
GROUP BY days.event_type, days.d
""",
)
def q_rolling_distinct_users_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per event type via HLL sketches —
    the 100 TB replacement for the exact collect_set bridge
    (rolling_distinct_users): raw events collapse to ONE Datasketches
    HLL sketch per (event_type, day) in a single shuffle, and every
    downstream stage touches only the tiny sketch table (days x types
    rows).  The 7-day union is a range join day -> [day-6, day] over
    that table followed by hll_union_agg + hll_sketch_estimate — exact
    set state never materializes, and sketches merge associatively so
    the same plan runs as a streaming foreachBatch maintenance job.

    Oracle-checked (VERDICT r1 #6): the query emits the EXACT count
    alongside `hll_ok` = |est - exact| / exact <= 5% computed in-query —
    if the sketch estimate ever drifts past the bound, hll_ok flips and
    the value hash mismatches.  At lgK=12 the expected error is ~2%, so
    the gate is tight but stable."""
    ev = read_table(spark, sf_dir, "events")
    # ONE raw scan + one shuffle: the distinct (type, day, user) triples
    # feed both the sketch build and the exact verification branch (HLL is
    # duplicate-insensitive, so sketching the distinct triples is
    # identical to sketching raw events)
    dd = (
        ev.select(
            "event_type",
            F.datediff(F.date_trunc("day", "ts"), F.lit("1970-01-01")).alias(
                "day_n"
            ),
            "user_id",
        )
        .distinct()
        .localCheckpoint()
    )
    day_sk = (
        dd.groupBy("event_type", "day_n")
        .agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"))
        # materialize: the sketch table is the index artifact (days x types
        # rows); without this the `days` branch re-shuffles the triples to
        # rebuild it
        .localCheckpoint()
    )
    days = day_sk.select("event_type", F.col("day_n").alias("d"))
    rolled = (
        days.join(
            day_sk,
            (days["event_type"] == day_sk["event_type"])
            & (day_sk["day_n"] >= days["d"] - 6)
            & (day_sk["day_n"] <= days["d"]),
        )
        .groupBy(days["event_type"], "d")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    # exact rolling distinct over the same triples — the verification side
    # of the accuracy gate, same range-join shape
    ddays = dd.select("event_type", F.col("day_n").alias("d")).distinct()
    exact = (
        ddays.join(
            dd,
            (ddays["event_type"] == dd["event_type"])
            & (dd["day_n"] >= ddays["d"] - 6)
            & (dd["day_n"] <= ddays["d"]),
        )
        .groupBy(ddays["event_type"], "d")
        .agg(F.countDistinct("user_id").alias("uniq_users_7d"))
    )
    joined = exact.join(rolled, ["event_type", "d"])
    return joined.select(
        "event_type",
        F.date_format(
            F.timestamp_seconds(F.col("d") * 86400).cast("date"), "yyyy-MM-dd"
        ).alias("day"),
        "uniq_users_7d",
        (
            F.abs(F.col("est") - F.col("uniq_users_7d"))
            / F.col("uniq_users_7d").cast("double")
            <= 0.05
        ).alias("hll_ok"),
    )


@query(
    "cohort_retention",
    oracle="""
WITH first AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_wk
  FROM events GROUP BY user_id
), active AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
)
SELECT strftime(f.cohort_wk, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', f.cohort_wk, a.wk) / 7 AS INT) AS week_offset,
       COUNT(DISTINCT a.user_id) AS n_active
FROM active a JOIN first f USING (user_id)
GROUP BY 1, 2
""",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by the week of their first
    event, counted distinct in every subsequent week they were active —
    the classic product-analytics triangle.  Two aggregations shuffling
    only (user_id, week) pairs plus one join on user_id that reuses the
    same hash partitioning; the output is |cohorts| x |weeks| rows —
    tiny at any corpus scale.  Weeks via date_trunc (Monday-anchored in
    both engines); offsets are exact integer day-diffs / 7."""
    ev = read_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_wk")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    return (
        active.join(first, "user_id")
        .groupBy(
            F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.col("wk"), F.col("cohort_wk")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@query(
    "gap_fill_interpolate",
    oracle="""
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
         ROUND(CAST(SUM(CAST(value AS DECIMAL(22,6))) AS DOUBLE), 6) AS v
  FROM events
  WHERE event_type = 'purchase' AND user_id < 30
  GROUP BY 1, 2
), spans AS (
  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY user_id
), scaffold AS (
  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM spans
)
SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day,
       d.v IS NULL AS filled,
       last_value(d.v IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill
FROM scaffold s LEFT JOIN daily d USING (user_id, day)
""",
)
def q_gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill (the hypertable resample/fill shape): each
    user's purchase value is rolled up to days, the missing days inside
    the user's own [first, last] span are generated with sequence() +
    explode, and values forward-fill via last(ignoreNulls) over a
    running frame.  The scaffold explode is bounded by span length, the
    fill window partitions by user (no global sort), and the daily
    rollup decimal-pins the sums so both engines fill identical values."""
    ev = read_table(spark, sf_dir, "events")
    daily = (
        ev.where((F.col("event_type") == "purchase") & (F.col("user_id") < 30))
        .groupBy(
            "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(22,6)")).cast("double"), 6
            ).alias("v")
        )
    )
    spans = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    scaffold = spans.select(
        "user_id",
        F.explode(F.sequence("d0", "d1")).alias("day"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scaffold.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("v").isNull().alias("filled"),
            F.last("v", ignorenulls=True).over(w).alias("value_ffill"),
        )
    )


@query(
    "funnel_conversion_time",
    oracle="""
WITH s AS (
  SELECT user_id, MIN(ts) AS s_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS p_ts
  FROM events e JOIN s ON e.user_id = s.user_id AND e.ts > s.s_ts
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
), gaps AS (
  SELECT s.user_id, ROUND(epoch(p.p_ts) - epoch(s.s_ts), 6) AS gap_s
  FROM s JOIN p ON p.user_id = s.user_id
)
SELECT COUNT(*) AS n_converted,
       ROUND(quantile_cont(gap_s, 0.5), 6) AS p50_s,
       ROUND(quantile_cont(gap_s, 0.9), 6) AS p90_s,
       ROUND(MIN(gap_s), 6) AS min_s,
       ROUND(MAX(gap_s), 6) AS max_s
FROM gaps
""",
)
def q_funnel_conversion_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution for the signup→purchase funnel:
    first-signup to first-subsequent-purchase gap per user, then exact
    interpolated quantiles over the (tiny) per-user gap relation — the
    composite of the funnel join pattern (event_funnel) and the exact
    percentile machinery, one (user_id, ts) shuffle per stage."""
    ev = read_table(spark, sf_dir, "events")
    s = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .where(F.col("ts") > F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    gaps = s.join(p, "user_id").select(
        F.round(
            F.col("p_ts").cast("double") - F.col("s_ts").cast("double"), 6
        ).alias("gap_s")
    )
    return gaps.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.expr("percentile(gap_s, 0.5)"), 6).alias("p50_s"),
        F.round(F.expr("percentile(gap_s, 0.9)"), 6).alias("p90_s"),
        F.round(F.min("gap_s"), 6).alias("min_s"),
        F.round(F.max("gap_s"), 6).alias("max_s"),
    )


def _decay_literals(rate: float = 0.95, max_age: int = 40) -> list[str]:
    """rate^age as 12-dp literals for age 1..max_age — baked from Python
    so neither engine computes pow() at runtime (the eval.py DCG-literal
    pattern)."""
    return [f"{rate ** a:.12f}" for a in range(1, max_age + 1)]


@query(
    "decayed_engagement_score",
    oracle=f"""
WITH decay(vals) AS (
  SELECT [{", ".join(f"CAST('{v}' AS DECIMAL(14,12))" for v in _decay_literals())}]
), aged AS (
  SELECT user_id,
         date_diff('day', CAST(date_trunc('day', ts) AS DATE),
                   DATE '2024-02-01') AS age_days,
         value
  FROM events WHERE event_type IN ('click', 'view', 'purchase')
    AND date_diff('day', CAST(date_trunc('day', ts) AS DATE),
                  DATE '2024-02-01') BETWEEN 1 AND 40
)
SELECT a.user_id,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(a.value AS DECIMAL(22,6)) * d.vals[a.age_days])
                  AS DOUBLE), 6) AS score
FROM aged a, decay d
GROUP BY a.user_id
""",
)
def q_decayed_engagement_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-decayed engagement (the feature-store staple): each
    engagement event contributes value · 0.95^age_days toward its user's
    score.  The decay table is 40 baked 12-dp DECIMAL(14,12) literals
    indexed by age — no runtime pow() on either engine — and each term
    is the EXACT decimal product value(22,6) × decay(14,12) (precision
    37, no truncation, no per-term float rounding at all: a round-at-6dp
    variant hit a genuine half-even knife edge on one fixture user), so
    the per-user sum is exact and engine-identical before the single
    final 6-dp round.  Events outside the 1..40-day decay horizon are
    filtered out as part of the operator's contract (guarding the array
    index on both engines).  Map-side expression + ONE shuffle on
    user_id; at scale the literal array rides the closure, costing
    nothing."""
    age = F.datediff(
        F.lit("2024-02-01").cast("date"), F.date_trunc("day", "ts").cast("date")
    )
    # the decay horizon IS the semantics: events outside age 1..40 score
    # zero and are excluded up front — without this guard an out-of-window
    # event would crash Spark's ANSI element_at while DuckDB silently
    # NULLs (and a post-anchor event would index from the array END on
    # both engines — silently wrong)
    ev = read_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "view", "purchase")
        & age.between(1, 40)
    )
    decay = F.array(
        *[F.expr(f"CAST('{v}' AS DECIMAL(14,12))") for v in _decay_literals()]
    )
    term = F.col("value").cast("decimal(22,6)") * F.element_at(decay, age)
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(term).cast("double"), 6).alias("score"),
    )


@query(
    "ab_test_zscore",
    oracle="""
WITH assigned AS (
  SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
              THEN 'A' ELSE 'B' END AS arm,
         value
  FROM events WHERE event_type = 'purchase'
), m AS (
  SELECT arm, CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(value AS DECIMAL(22,6))) AS DOUBLE) AS s,
         CAST(SUM(CAST(value * value AS DECIMAL(38,6))) AS DOUBLE) AS ss
  FROM assigned GROUP BY arm
), w AS (
  SELECT MAX(CASE WHEN arm = 'A' THEN n END) AS na,
         MAX(CASE WHEN arm = 'A' THEN s END) AS sa,
         MAX(CASE WHEN arm = 'A' THEN ss END) AS ssa,
         MAX(CASE WHEN arm = 'B' THEN n END) AS nb,
         MAX(CASE WHEN arm = 'B' THEN s END) AS sb,
         MAX(CASE WHEN arm = 'B' THEN ss END) AS ssb
  FROM m
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       ROUND(sa / na, 6) AS mean_a, ROUND(sb / nb, 6) AS mean_b,
       ROUND((sa / na - sb / nb)
             / sqrt(GREATEST(ssa / na - (sa / na) * (sa / na), 1e-12) / na
                    + GREATEST(ssb / nb - (sb / nb) * (sb / nb), 1e-12) / nb),
             6) AS zscore
FROM w
""",
)
def q_ab_test_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample z-test over a deterministic md5 user split (the
    content-hash assignment of hash_split_train_val applied to
    experimentation): per-arm count/sum/sum-of-squares are decimal-pinned
    in one aggregation, then mean difference over pooled standard error
    with identical double parenthesization on both engines.  The whole
    analysis is one shuffle by arm (2 groups) — experiment readout at
    any event volume."""
    ev = read_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    arm = F.when(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8", "A"
    ).otherwise("B")
    m = ev.groupBy(arm.alias("arm")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("value").cast("decimal(22,6)")).cast("double").alias("s"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(38,6)"))
        .cast("double")
        .alias("ss"),
    )
    w = m.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n"))).alias("na"),
        F.max(F.when(F.col("arm") == "A", F.col("s"))).alias("sa"),
        F.max(F.when(F.col("arm") == "A", F.col("ss"))).alias("ssa"),
        F.max(F.when(F.col("arm") == "B", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("arm") == "B", F.col("s"))).alias("sb"),
        F.max(F.when(F.col("arm") == "B", F.col("ss"))).alias("ssb"),
    )
    ma = F.col("sa") / F.col("na")
    mb = F.col("sb") / F.col("nb")
    return w.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round(
            (ma - mb)
            / F.sqrt(
                # 1e-12 floor: the 6-dp decimal pinning can push a tiny
                # or near-constant arm's variance a hair NEGATIVE, where
                # DuckDB's sqrt errors but Spark returns NaN — the floor
                # keeps both engines finite and identical
                F.greatest(
                    F.col("ssa") / F.col("na") - ma * ma, F.lit(1e-12)
                )
                / F.col("na")
                + F.greatest(
                    F.col("ssb") / F.col("nb") - mb * mb, F.lit(1e-12)
                )
                / F.col("nb")
            ),
            6,
        ).alias("zscore"),
    )


@query(
    "session_path_patterns",
    oracle="""
WITH o AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1
              ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
  FROM o
), paths AS (
  SELECT user_id, session_id,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM s GROUP BY 1, 2
), agg AS (
  SELECT path, COUNT(*) AS n_sessions,
         path LIKE '%view>click>purchase%' AS has_funnel
  FROM paths GROUP BY path
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY n_sessions DESC, path) AS rk FROM agg
)
SELECT path, n_sessions, has_funnel, CAST(rk AS INT) AS rank
FROM ranked WHERE rk <= 20
""",
)
def q_session_path_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern analytics (the MATCH_RECOGNIZE shape): events
    sessionize with the same lag-gap + running-sum machinery as
    `sessionize`, each session folds to its ordered event-type PATH
    string, and the top-20 paths are ranked with a contiguous
    view>click>purchase funnel flag.  Ordering inside a path is pinned
    by (ts, event_id) on both engines; the top-20 is a TakeOrdered +
    sorted-array posexplode, not a full sort or a global window."""
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    s = ev.withColumn(
        "is_new", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    ).withColumn("session_id", F.sum("is_new").over(run).cast("bigint"))
    paths = s.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    agg = paths.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_sessions"),
    ).withColumn(
        "has_funnel", F.col("path").contains("view>click>purchase")
    )
    # top-20 via TakeOrdered + sorted-array posexplode — no global
    # WindowExec (VERDICT r4 #8)
    from crawling_vectordb_llm_spark.operators.topk import global_topk_ranked

    return global_topk_ranked(
        agg,
        [(-F.col("n_sessions")).alias("neg_sessions"), F.col("path")],
        ["path", "n_sessions", "has_funnel"],
        20,
    )


@query(
    "events_multi_grain_rollup",
    oracle="""
WITH g AS (
  SELECT event_type,
         strftime(date_trunc('week', ts), '%Y-%m-%d') AS wk,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         value
  FROM events
)
SELECT event_type, grain, bucket, COUNT(*) AS n,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(22,6))) AS DOUBLE), 6) AS total
FROM (
  SELECT event_type, 'week' AS grain, wk AS bucket, value FROM g
  UNION ALL
  SELECT event_type, 'day' AS grain, day AS bucket, value FROM g
)
GROUP BY 1, 2, 3
""",
)
def q_events_multi_grain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity time rollup (the hypertable continuous-aggregate
    shape): one scan feeds day- and week-grain aggregates via GROUPING
    SETS — the raw events shuffle ONCE carrying both bucket keys, not
    once per grain, and each grain's groups combine map-side.  The
    oracle computes the same result as an explicit two-grain union.
    The grain is identified with GROUPING(day) — the grouping-id bit,
    not a data-value NULL test — so a row with a NULL ts (NULL day
    bucket) cannot masquerade as a week-grain group (ADVICE r3)."""
    ev = read_table(spark, sf_dir, "events")
    g = ev.select(
        "event_type",
        F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("wk"),
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "value",
    )
    g.createOrReplaceTempView("__multi_grain_events")
    out = spark.sql("""
        SELECT event_type,
               CASE WHEN GROUPING(day) = 1 THEN 'week' ELSE 'day' END AS grain,
               CASE WHEN GROUPING(day) = 1 THEN wk ELSE day END AS bucket,
               COUNT(*) AS n,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(22,6))) AS DOUBLE), 6)
                 AS total
        FROM __multi_grain_events
        GROUP BY GROUPING SETS ((event_type, wk), (event_type, day, wk))
    """)
    return out
