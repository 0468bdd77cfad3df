"""SparkSession factory with scale-minded defaults.

Local tests run on local[N] (single JVM), but every config here is chosen to
also be the right default on a 1000-executor cluster reading 100 TB:
adaptive execution (runtime re-plan, skew-join splitting, partition
coalescing), Arrow for every Python<->JVM hop, and UTC timestamps so results
are reproducible across engines (the DuckDB oracle is UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "crawling_vectordb_llm_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) the session.

    cpus defaults to $SPARK_GRAFT_CPUS or all local cores.  Shuffle
    partitions default to the core count — at cluster scale this would be
    sized to total-cores * 2-3 and AQE coalesces down; locally the 200
    default just adds scheduling overhead on kB-sized partitions.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # r13/r14 (guide §3.1, ADVICE r13): shuffled-hash joins come from
        # the AQE local-map threshold ONLY — SMJ is rewritten to SHJ at
        # runtime when every post-shuffle partition is under 64 MB, a
        # bound on REAL sizes, so a hash build can never OOM off a bad
        # Catalyst estimate and a healthy 100 TB shuffle (100 MB-1 GB
        # partitions) keeps spill-graceful sort-merge.  r13 additionally
        # flipped the STATIC planner (preferSortMergeJoin=false), which
        # picks the SHJ build side from size ESTIMATES that can be badly
        # wrong after filters/UDFs; r14 re-measured that flip interleaved
        # on the six join-heavy headline queries and found it performance-
        # neutral at bench scale (every median within +-6%, mixed sign —
        # the AQE rewrite already converts the same joins at runtime), so
        # the estimate-trusting static path is dropped and only the
        # runtime-bounded rewrite stays.  Results are strategy-independent
        # by definition; full 215-query DuckDB selfcheck green under this.
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
        # auto-broadcast stays on (10 MB); we additionally hint explicitly
        # in operators where we KNOW the side is small (dims, query sets).
        # local[32] runs 32 task threads in ONE heap: at 8g the block
        # manager starts evicting localCheckpoint blocks ~40 queries into
        # a bench run and GC stalls triple query times (measured 2.4s ->
        # 5.5s on interval_overlap_join); 24g keeps storage+execution
        # comfortable on the 128 GiB box while staying far under it
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/cvls-warehouse"),
        )
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        # the events fixture stores TIMESTAMP(NANOS) which Spark's parquet
        # reader rejects; read as long and convert (catalog.read_table)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    from crawling_vectordb_llm_spark.shipping import ensure_package_shipped

    ensure_package_shipped(spark)
    return spark
