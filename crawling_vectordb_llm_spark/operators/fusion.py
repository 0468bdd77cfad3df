"""Shared checkpoint+metrics fusion (r14, ADVICE r13).

`localCheckpoint()` materializes a DataFrame with one scan; any scalar
aggregates a caller needs over the SAME rows can ride that scan as
`observe()` metrics instead of paying a second action over the
checkpointed blocks (guide §1.4/§5 — one pass, one driver round-trip).
Five call sites grew their own copy of the pattern in r13 (connected
components' fingerprint, kcore's edge count, dsir's model totals, the
unigram/bigram vocabulary totals), each with a private try/except around
the one non-public step: reading the finished QueryExecution's observed
metrics via `_jdf` (there is no PySpark accessor for observed metrics of
a non-streaming action as of 4.1).  This module is now the single home
for that fragility — a Spark-version break is fixed here once, and every
caller keeps a documented two-job fallback by handling the None return.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def checkpoint_with_metrics(
    df: DataFrame, name: str, *aggs: Column
) -> "tuple[DataFrame, tuple[int, ...] | None]":
    """localCheckpoint + integer-valued scalar aggregates in ONE job.

    Returns (checkpointed_df, values) where values[i] is aggs[i] parsed
    as int (every current caller observes counts / integer-exact decimal
    sums), or (checkpointed_df, None) when the observed-metrics read
    fails (API drift) — the caller then runs its own second-action
    fallback over the checkpointed rows, which is always correct, just
    one job slower."""
    observed = df.observe(name, *aggs)
    cp = observed.localCheckpoint()
    try:
        opt = observed._jdf.queryExecution().observedMetrics().get(name)
        row = opt.get()
        return cp, tuple(int(str(row.get(i))) for i in range(len(aggs)))
    except Exception:
        return cp, None
