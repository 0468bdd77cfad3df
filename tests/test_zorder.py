"""Z-order layout (operators/zorder.py): per-file min/max spans must be
tight in EVERY clustered dimension (that is the data-skipping property the
parquet reader exploits), where a linear sort is tight only in its leading
column."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from crawling_vectordb_llm_spark.operators.zorder import zorder_write


def _file_spans(path: str, col_a: str, col_b: str) -> list[tuple[float, float]]:
    """Per parquet file: (span_a, span_b) from footer statistics."""
    spans = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins = {col_a: [], col_b: []}
        maxs = {col_a: [], col_b: []}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in mins and col.statistics is not None:
                    mins[name].append(col.statistics.min)
                    maxs[name].append(col.statistics.max)
        spans.append(
            (
                max(maxs[col_a]) - min(mins[col_a]),
                max(maxs[col_b]) - min(mins[col_b]),
            )
        )
    return spans


def test_zorder_bounds_both_dimensions(spark, tmp_path):
    n = 1 << 14
    # two independent uniform dimensions (hash-scrambled so neither is
    # correlated with row order)
    df = spark.range(n).select(
        (F.xxhash64("id") % n).alias("a"), (F.xxhash64("id", F.lit(1)) % n).alias("b")
    )
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "linear")
    zorder_write(df, zpath, ["a", "b"], n_files=16)
    df.repartitionByRange(16, "a").sortWithinPartitions("a").write.parquet(lpath)

    domain = 2.0 * n  # values span (-n, n)
    z = _file_spans(zpath, "a", "b")
    lin = _file_spans(lpath, "a", "b")
    assert len(z) == 16

    z_a = sum(s[0] for s in z) / len(z) / domain
    z_b = sum(s[1] for s in z) / len(z) / domain
    lin_a = sum(s[0] for s in lin) / len(lin) / domain
    lin_b = sum(s[1] for s in lin) / len(lin) / domain

    # linear sort: perfect on a (~1/16), useless on b (~1.0)
    assert lin_a < 0.15
    assert lin_b > 0.8
    # z-order: BOTH dimensions bounded — 16 files on a 2-d curve gives
    # ~4x4 tiles, so ~1/4 of the domain per dimension per file
    assert z_a < 0.45
    assert z_b < 0.45


def test_zorder_write_preserves_rows(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id").alias("a"), (F.col("id") * 7 % 1000).alias("b")
    )
    path = str(tmp_path / "z")
    zorder_write(df, path, ["a", "b"], n_files=4)
    back = spark.read.parquet(path)
    assert back.columns == ["a", "b"]
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in df.collect()
    )
