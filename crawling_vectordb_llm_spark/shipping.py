"""Ship this package to executor python workers.

Executor-side closures (mapInPandas/applyInPandas kernels) that reference
module-level helpers are pickled BY REFERENCE — the worker must be able to
`import crawling_vectordb_llm_spark`.  That holds when the driver's cwd is
the repo root (cwd is on the workers' sys.path) but not when an external
harness imports us from elsewhere.  The cluster-correct fix is the same as
the local one: zip the package and `sc.addPyFile` it, exactly what a real
100 TB deployment does with its job artifact.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[int] = set()


def _package_zip() -> str:
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(
        tempfile.gettempdir(), "crawling_vectordb_llm_spark_pkg.zip"
    )
    src_mtime = max(
        os.path.getmtime(os.path.join(root, f))
        for root, _, files in os.walk(pkg_dir)
        for f in files
        if f.endswith(".py")
    )
    if not os.path.exists(zpath) or os.path.getmtime(zpath) < src_mtime:
        tmp = zpath + f".tmp{os.getpid()}"
        with zipfile.ZipFile(tmp, "w") as z:
            for root, _, files in os.walk(pkg_dir):
                for f in files:
                    if not f.endswith(".py"):
                        continue
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    z.write(full, rel)
        os.replace(tmp, zpath)
    return zpath


def ensure_package_shipped(spark: SparkSession) -> None:
    """Idempotent per SparkContext; cheap to call at every query entry."""
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    sc.addPyFile(_package_zip())
    _SHIPPED.add(key)


def ensure_session_confs(spark: SparkSession) -> None:
    """Runtime confs the engine requires regardless of who built the
    session (the external driver builds its own):
    - nanosAsLong: the events fixture is TIMESTAMP(NANOS), which Spark's
      parquet reader rejects otherwise
    - UTC session timezone: oracle comparisons are against UTC-naive DuckDB
    Both are runtime-settable SQL confs (verified)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
