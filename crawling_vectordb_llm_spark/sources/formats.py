"""File-format sources/sinks: parquet (the engine's native table format,
SURVEY §1.3), plus CSV / JSON-lines / ORC interchange for corpora that
arrive from external crawlers or leave for external trainers.

Generalizes the reference's implied I/O surface (its corpus enters as HTML
over HTTP and leaves as per-doc HTTP upserts, TencentVDB.py:74-79) into the
bulk-format story a Spark pipeline needs.  All readers take an explicit
schema when round-trip fidelity matters — CSV/JSON inference widens types
(e.g. BIGINT→DOUBLE) and breaks oracle hash-stability.

Scale notes: every format here splits across executors (CSV/JSON by line,
ORC/parquet by stripe/row-group); `partition_by` produces
hive-partitioned layouts so downstream filters on the partition column
prune at the file listing, before any bytes are read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_CSV_OPTS = {
    # quote-everything + escape so free text (embedded delimiters/quotes)
    # survives the round trip losslessly
    "header": "true",
    "quote": '"',
    "escape": '"',
    "nullValue": "\\N",
}

FORMATS = ("parquet", "orc", "json", "csv")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    w = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        w = w.options(**_CSV_OPTS)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
) -> DataFrame:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    r = spark.read.format(fmt)
    if fmt == "csv":
        r = r.options(**_CSV_OPTS)
    if schema is not None:
        r = r.schema(schema)
    return r.load(path)
