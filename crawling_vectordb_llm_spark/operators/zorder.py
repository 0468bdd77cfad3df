"""Z-order (Morton) clustering — multi-column data-skipping layout.

SURVEY §4: the reference indexes only filterable fields (TencentVDB.py:29-32
"don't index text"); the batch-engine analog is laying data out so parquet
min/max stats prune files for the predicate columns.  A linear sort prunes
only its leading column; interleaving the BITS of several columns' ranks
(the Morton / Z-curve, as in Delta Lake OPTIMIZE ZORDER BY) bounds every
clustered column's per-file range at once, so a selective filter on ANY of
them skips most files.

All JVM-side column expressions (shift/mask/or — whole-stage codegen), no
UDFs:

  1. rank-normalize each column to an integer in [0, 2^bits) using
     equi-width buckets over the observed min/max (two tiny aggregates;
     at 100 TB use sampled quantiles for rank instead — same expression
     tree downstream),
  2. interleave bits into one morton key,
  3. repartitionByRange(n_files, key) + sortWithinPartitions(key) + write:
     each output file covers a compact Z-curve segment, i.e. a small
     hyper-rectangle of the clustered space, so its min/max stats are
     tight in EVERY clustered dimension.

Effectiveness is asserted by tests/test_zorder.py: per-file min/max spans
of BOTH clustered columns stay well under the full domain, while a linear
sort leaves the second column's span at ~100%.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave(cols: list[Column], bits: int) -> Column:
    """Morton key: bit i of column j lands at position i*len(cols)+j.
    Total bits = bits*len(cols) must fit a long (<= 62)."""
    n = len(cols)
    parts = [
        ((c.bitwiseAND(F.lit(1 << i))) / F.lit(1 << i)).cast("long")
        * F.lit(1 << (i * n + j))
        for j, c in enumerate(cols)
        for i in range(bits)
    ]
    return functools.reduce(operator.add, parts).alias("__zkey")


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16
) -> tuple[DataFrame, Column]:
    """Attach a morton key over `cols` (numeric/date columns).  Returns
    (df_with_ranges_joined, key_column).  The min/max aggregate is one tiny
    job over just `cols` (column-pruned scan)."""
    if bits * len(cols) > 62:
        raise ValueError(f"{bits} bits x {len(cols)} cols overflows a long")
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
    ranges = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(ranges))
    scaled = []
    for c in cols:
        lo, hi = F.col(f"__min_{c}").cast("double"), F.col(f"__max_{c}").cast("double")
        span = F.greatest(hi - lo, F.lit(1e-300))
        q = F.least(
            ((F.col(c).cast("double") - lo) / span * F.lit((1 << bits) - 1)).cast("long"),
            F.lit((1 << bits) - 1),
        )
        scaled.append(F.coalesce(q, F.lit(0)))
    return out, _interleave(scaled, bits)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 16,
) -> None:
    """Cluster `df` by the Z-curve over `cols` into ~n_files parquet files.

    repartitionByRange samples the key distribution, so files hold
    contiguous, evenly-POPULATED curve segments (skew-proof, unlike fixed
    key-space splits).  The extra shuffle is the price of the layout — paid
    once at write, repaid on every pruned read."""
    keyed, key = zorder_key(df, cols, bits)
    (
        keyed.withColumn("__zkey", key)
        .repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey", *[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols])
        .write.mode("overwrite")
        .parquet(path)
    )
