"""Skewed-key stress (VERDICT r3 #3): a zipf(s=1.2) fact table at ~sf1
volume, measuring what the skew treatments actually buy —

  agg:  plain groupBy(user).sum  vs  salted_sum_count (2-stage combine)
  join: shuffle sort-merge join fact x dim on the zipf key, with
        (a) AQE skew-join OFF (the naive plan and its straggler),
        (b) AQE skew-join ON  (runtime split; final-plan excerpt shows
            the skew=true marker),
        (c) salted_broadcast_skew_join (the portable pre-split recipe).

Auto-broadcast is disabled for the join leg — the 200k-row dim would
otherwise broadcast and there would be no shuffle to skew.  Per-leg
median/max task durations come from the Spark REST status API (UI
enabled for this tool only), so the straggler is OBSERVED, not inferred
from wall-clock.  Prints markdown for SCALE.md.  Run alone (bench noise
rules, MEMORY.md):  python tools/skew_bench.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N_USERS = 200_000
ZIPF_S = 1.2


def build_spark() -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    return (
        SparkSession.builder.appName("skew_bench")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "true")  # REST status API for task stats
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .getOrCreate()
    )


def zipf_users(spark: SparkSession, n: int):
    """n fact rows, user_id ~ zipf(s) over N_USERS ranks (bounded inverse
    CDF — numpy's np.random.zipf is unbounded), value double.  Seeded per
    id-range partition → deterministic."""
    w = 1.0 / np.power(np.arange(1, N_USERS + 1, dtype=np.float64), ZIPF_S)
    cdf = np.cumsum(w / w.sum())
    bc = spark.sparkContext.broadcast(cdf)

    def gen(it):
        import pandas as pd

        c = bc.value
        for pdf in it:
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng(int(ids[0]) if len(ids) else 0)
            u = rng.random(len(ids))
            users = np.searchsorted(c, u) + 1
            yield pd.DataFrame(
                {
                    "user_id": users.astype(np.int64),
                    "value": rng.random(len(ids)),
                }
            )

    return spark.range(n).repartition(64).mapInPandas(
        gen, schema="user_id long, value double"
    )


def task_stats(app_id: str, min_stage: int) -> tuple[float, float]:
    """(median, max) task duration in seconds across stages >= min_stage."""
    import requests

    base = f"http://localhost:4040/api/v1/applications/{app_id}"
    med = mx = 0.0
    for st in requests.get(f"{base}/stages?status=complete", timeout=10).json():
        if st["stageId"] < min_stage:
            continue
        q = requests.get(
            f"{base}/stages/{st['stageId']}/{st['attemptId']}/taskSummary"
            "?quantiles=0.5,1.0",
            timeout=10,
        ).json()
        d = q.get("duration", [0, 0])
        med = max(med, d[0] / 1000.0)
        mx = max(mx, d[1] / 1000.0)
    return med, mx


def next_stage_id(app_id: str) -> int:
    import requests

    st = requests.get(
        f"http://localhost:4040/api/v1/applications/{app_id}/stages",
        timeout=10,
    ).json()
    return 1 + max((s["stageId"] for s in st), default=-1)


def timed(fn):
    t0 = time.time()
    r = fn()
    return time.time() - t0, r


def main(n: int = 20_000_000) -> None:
    from crawling_vectordb_llm_spark.operators.skew import (
        salted_broadcast_skew_join,
        salted_sum_count,
    )

    spark = build_spark()
    app_id = spark.sparkContext.applicationId
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    facts = zipf_users(spark, n).localCheckpoint()
    n_facts = facts.count()
    top = facts.groupBy("user_id").count().orderBy(F.desc("count")).limit(3).collect()
    print(f"facts: {n_facts} rows, zipf(s={ZIPF_S}) over {N_USERS} users; "
          f"hottest keys: {[(r['user_id'], r['count']) for r in top]} "
          f"(top-1 = {top[0]['count'] / n_facts:.1%} of all rows)\n")

    dim = (
        spark.range(1, N_USERS + 1)
        .select(
            F.col("id").alias("user_id"),
            F.md5(F.col("id").cast("string")).alias("attr"),
        )
        .localCheckpoint()
    )
    dim.count()

    rows = []

    def leg(name, fn, *, skew_join=None):
        if skew_join is not None:
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_join).lower())
            # AQE's split trigger defaults to 256 MB partitions (cluster
            # sizing); the fixture's hot SHUFFLE partition is ~4 MiB
            # after compression (3.9M rows of (long, double)), so scale
            # the thresholds with the data or the mechanism never fires
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                "2m",
            )
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m"
            )
            # shuffle compression flattens row-count skew (the hot
            # partition's repeated key dictionary-compresses), so the
            # default 5x-median factor also never fires at fixture
            # scale; 2x matches the observed compressed-size skew
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
            )
        fn()  # warm
        s0 = next_stage_id(app_id)
        wall, _ = timed(fn)
        med, mx = task_stats(app_id, s0)
        rows.append((name, wall, med, mx))
        return wall

    # --- aggregation
    agg_plain = lambda: facts.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(22,6)")).alias("total"),
        F.count(F.lit(1)).alias("n"),
    ).count()
    agg_salted = lambda: salted_sum_count(facts, ["user_id"], "value").count()
    leg("agg plain groupBy", agg_plain)
    leg("agg salted 2-stage", agg_salted)

    # --- join (shuffle forced; AQE skew split off/on; salted)
    join_plain = lambda: facts.join(dim, "user_id").count()
    join_salted = lambda: salted_broadcast_skew_join(facts, dim, "user_id").count()
    leg("join SMJ, AQE skew OFF", join_plain, skew_join=False)
    leg("join SMJ, AQE skew ON", join_plain, skew_join=True)
    leg("join salted (8 buckets)", join_salted, skew_join=False)

    print("| leg | wall s | median task s | max task s |")
    print("|---|---|---|---|")
    for name, wall, med, mx in rows:
        print(f"| {name} | {wall:.2f} | {med:.2f} | {mx:.2f} |")

    # final-plan evidence of the runtime split, from the SQL REST API
    # (the DataFrame's own queryExecution stays isFinalPlan=false because
    # count() runs its own execution — the node metrics are the truth)
    import requests

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    facts.join(dim, "user_id").count()
    e = requests.get(
        f"http://localhost:4040/api/v1/applications/{app_id}/sql?length=200",
        timeout=10,
    ).json()[-1]
    print("\nAQE final-plan shuffle-read metrics (skew split evidence):")
    for node in e.get("nodes", []):
        if node["nodeName"] == "AQEShuffleRead":
            mets = {m["name"]: m["value"].split("\n")[-1]
                    for m in node.get("metrics", [])}
            print(f"  AQEShuffleRead -> {mets}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000)
