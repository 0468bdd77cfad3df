"""DSIR — data selection with importance resampling (Xie et al., "Data
Selection for Language Models via Importance Resampling", NeurIPS 2023).

Given a small TARGET corpus (the distribution you want more of — curated
wiki/books, a domain slice) and the RAW crawl, DSIR scores every raw
document by the log-likelihood ratio of two hashed n-gram bag models:

    w(doc) = mean over doc features f of  [ log p_target(f) - log p_raw(f) ]

and resamples the raw corpus proportionally to exp(w).  The reference's
pipeline ingests whatever the crawler returns (Crawling.py:36-48, no
selection at all); at 100 TB a selection stage like this is what decides
which crawl shards are worth embedding at all (TencentVDB.py:74-79's
upsert loop is the budget being protected).

Spark shape: both bag models are ONE aggregation each over a hashed
feature space of `n_buckets` rows — tiny, broadcast back onto the
feature stream; per-doc scoring is a map-side join + one groupBy(doc).
No shuffle touches the raw corpus except the final per-doc aggregation.

The feature hash is md5-derived (first 3 hex chars -> 4096 buckets) so an
external oracle (DuckDB, any engine with md5) reproduces it bit-for-bit —
xxhash64 would be Spark-only.  Laplace (+1) smoothing keeps unseen
buckets finite.  Per-feature log-ratios are rounded to 4 dp (not 6) and
summed as decimals so the grouped mean is order-independent AND robust
to cross-engine libm ulp: JVM log and libc log may differ in the last
bit, so a per-feature value within one ulp of a rounding midpoint flips
between engines — at 6 dp the flip probability per feature is
~ulp/1e-6, and the sf1 scale run actually hit one (doc 2009's score
differed in the last digit); at 4 dp it is ~1e-12 per feature, gone for
any realistic corpus.  4 dp per feature is far finer than DSIR needs —
scores are means over tens of features of O(0.1) terms.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hashed_ngram_buckets(text_col: str, n: int = 2, n_buckets: int = 4096) -> F.Column:
    """Non-distinct word n-grams hashed into [0, n_buckets) — the DSIR
    feature stream.  Bucket = integer value of the first 3 hex chars of
    md5(ngram) (4096 exactly); engine-portable by construction."""
    assert n_buckets == 4096, "bucket space is pinned to 3 md5 hex chars"
    # zip_with over shifted slices, not transform(sequence) — a lambda
    # capturing the token array re-splits the text per gram (see
    # operators/dedup.word_shingles); this form is non-distinct (bag
    # counts are the model, unlike shingle sets)
    toks = F.split(F.col(text_col), " ")
    m = F.size(toks) - (n - 1)
    grams = F.slice(toks, 1, m)
    for i in range(1, n):
        grams = F.zip_with(
            grams, F.slice(toks, i + 1, m), lambda x, y: F.concat(x, F.lit(" "), y)
        )
    guarded = F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )
    return F.transform(
        guarded,
        lambda g: F.conv(F.substring(F.md5(g), 1, 3), 16, 10).cast("int"),
    )


def dsir_importance(
    docs: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    n_buckets: int = 4096,
) -> DataFrame:
    """Score every document by the hashed-bigram importance log-ratio.

    `target` is a boolean Column over `docs` selecting the target slice
    (it stays in the corpus — DSIR scores everything; callers drop or
    resample afterwards).  Returns (id_col, n_feats bigint, logratio
    double) with logratio = SUM per-feature [log p_t - log p_r] (the
    total log importance; divide by n_feats for the mean), both models
    Laplace-smoothed over the bucket space.  The sum, not the mean, is
    the output on purpose (sf1 finding): the sum of 4-dp decimals is
    exact and converts to the identical double in every engine, while a
    rounded mean invites the midpoint lottery — sum/count lands EXACTLY
    on round-to-6dp midpoints whenever count divides the scaled sum
    into a ...5 tail, and engines disagree on midpoint direction.
    NOTE the sum and the mean do NOT rank identically when documents
    differ in n_feats — longer documents accumulate larger |logratio| —
    so consumers thresholding on the old mean-scaled value must divide
    by n_feats (both are one expression away given the output columns).
    The sum matches DSIR's log-importance-weight definition.
    """
    feats = docs.select(
        F.col(id_col),
        target.alias("__is_target"),
        F.explode(hashed_ngram_buckets(text_col, n, n_buckets)).alias("bucket"),
    )
    # materialize the (<= n_buckets)-row model once: the feature stream is
    # a full corpus pass (explode + md5 per n-gram) and must not be
    # recomputed for the totals action and again for the scoring join —
    # two corpus passes total (fit, score) is the DSIR scale shape
    # r13 (guide §1.4/§5): the model totals ride the checkpoint
    # materialization scan as observe() metrics instead of a second
    # aggregation action over the checkpointed rows — one driver
    # round-trip for fit + totals, not two (same fusion as
    # components._checkpoint_with_fingerprint).
    from crawling_vectordb_llm_spark.operators.fusion import (
        checkpoint_with_metrics,
    )

    model, vals = checkpoint_with_metrics(
        feats.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("c_raw"),
            F.sum(F.col("__is_target").cast("long")).alias("c_tgt"),
        ),
        "dsir_totals",
        F.sum("c_raw").alias("t_raw"),
        F.sum("c_tgt").alias("t_tgt"),
    )
    if vals is not None:
        t_raw_i, t_tgt_i = vals
    else:
        totals = model.agg(
            F.sum("c_raw").alias("t_raw"), F.sum("c_tgt").alias("t_tgt")
        ).first()
        t_raw_i, t_tgt_i = int(totals["t_raw"]), int(totals["t_tgt"])
    t_raw = float(t_raw_i) + n_buckets
    t_tgt = float(t_tgt_i) + n_buckets
    scored = feats.join(F.broadcast(model), "bucket").select(
        id_col,
        F.round(
            F.log((F.col("c_tgt") + 1) / F.lit(t_tgt))
            - F.log((F.col("c_raw") + 1) / F.lit(t_raw)),
            4,  # grain >> libm ulp: see module docstring (sf1 finding)
        )
        .cast("decimal(22,4)")
        .alias("lr"),
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_feats"),
        F.sum("lr").cast("double").alias("logratio"),
    )
