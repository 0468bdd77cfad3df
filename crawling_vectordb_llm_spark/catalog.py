"""Fixture catalog: the driver-generated parquet tables (TESTDATA.md).

Mirrors the reference's database/collection namespacing (TencentVDB.py:10-11,
21-61) as a Spark catalog of parquet-backed tables: `create_database` /
`create_collection(shard=3)` become CREATE DATABASE / partitioned writes; here
the read side registers each parquet file as a temp view so both the
DataFrame API and spark.sql can reach them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# --------------------------------------------------------------------- S6 DDL
# The reference's database/collection lifecycle (TencentVDB.py:21-61,87-98):
# create_database / list_databases / create_collection(shard=3, replicas=0) /
# drop_collection / drop_database.  Spark-native: catalog databases + bucketed
# parquet tables (bucket count = shard count; replicas are a storage concern).


def create_database(spark: SparkSession, name: str) -> None:
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")


def drop_database(spark: SparkSession, name: str) -> None:
    spark.sql(f"DROP DATABASE IF EXISTS {name} CASCADE")


def list_databases(spark: SparkSession) -> list[str]:
    return [d.name for d in spark.catalog.listDatabases()]


def create_collection(
    spark: SparkSession,
    database: str,
    name: str,
    source: DataFrame,
    shards: int = 3,
    key: str = "id",
) -> None:
    """`create_collection(shard=3)` analog: bucketed managed table — joins
    and upserts on `key` then co-locate without a shuffle (the Spark
    equivalent of the reference's shard placement, TencentVDB.py:55-56)."""
    (
        source.write.mode("overwrite")
        .bucketBy(shards, key)
        .sortBy(key)
        .saveAsTable(f"{database}.{name}")
    )


def drop_collection(spark: SparkSession, database: str, name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {database}.{name}")


def list_collections(spark: SparkSession, database: str) -> list[str]:
    return [t.name for t in spark.catalog.listTables(database)]


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize events.ts to a session-tz TIMESTAMP whatever the parquet
    layout of the fixture generation:

    - TIMESTAMP(NANOS) reads as a long under
      spark.sql.legacy.parquet.nanosAsLong → `ts div 1000` (integer
      division; a double round-trip would lose precision above 2^53 ns).
    - timestamp[us] without tz reads as TIMESTAMP_NTZ, which streaming
      event-time (watermarks) and double-casts reject → cast to TIMESTAMP.
      ensure_session_confs pins the session tz to UTC, so the NTZ wall
      clock is interpreted as UTC — the same convention the DuckDB oracle
      applies to naive timestamps."""
    if col not in df.columns:
        return df
    dt = df.schema[col].dataType
    if isinstance(dt, T.LongType):
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    elif isinstance(dt, T.TimestampNTZType):
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table with type normalization applied."""
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = normalize_event_ts(df)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, register_views: bool = True
) -> dict[str, DataFrame]:
    """Read every fixture table; optionally register as temp views.

    Plain `spark.read.parquet` keeps Catalyst's pushdown/pruning: filters and
    projections in downstream queries reach the parquet scan (PushedFilters /
    ReadSchema in .explain).
    """
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = table_path(sf_dir, name)
        if not os.path.exists(path):
            continue
        df = read_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
