"""Incremental LSH dedup (operators/incremental_dedup.py): the per-batch
snapshot-equality contract, the flood-cap semantics across batches, and
cross-batch planted duplicates."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawling_vectordb_llm_spark.catalog import read_table
from crawling_vectordb_llm_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_near_dup_pairs_portable,
    minhash_signatures,
)
from crawling_vectordb_llm_spark.operators.incremental_dedup import (
    incremental_candidate_pairs,
    incremental_near_dup_portable,
    portable_banded_rows,
    xxhash_banded_rows,
)

from .conftest import SF_SMALL


def _pairs(df):
    return {(r["a_id"], r["b_id"]) for r in df.select("a_id", "b_id").collect()}


def test_batch_snapshot_equality_portable(spark):
    """Batch k's incremental output must equal the FULL ladder over
    everything ingested up to batch k, restricted to pairs involving
    batch k — for every batch of a 3-way split."""
    docs = read_table(spark, SF_SMALL, "documents")
    for k in (1, 2):
        upto = docs.where(F.col("doc_id") % 3 <= k)
        is_new = F.col("doc_id") % 3 == k
        inc = _pairs(incremental_near_dup_portable(upto, is_new, tau=0.2))
        full = minhash_near_dup_pairs_portable(upto, tau=0.2)
        batch_ids = {
            r["doc_id"] for r in upto.where(is_new).select("doc_id").collect()
        }
        expected = {
            p for p in _pairs(full) if p[0] in batch_ids or p[1] in batch_ids
        }
        assert inc == expected, f"batch {k}: {len(inc)} vs {len(expected)}"
        assert inc, f"batch {k} produced no pairs — vacuous fixture split"


def test_candidate_parity_xxhash_family(spark):
    """The production (xxhash64) family: incremental candidates == full
    candidates involving new ids (same banding, same combined cap)."""
    docs = read_table(spark, SF_SMALL, "documents")
    old_rows = xxhash_banded_rows(docs.where(F.col("doc_id") % 2 == 0))
    new_rows = xxhash_banded_rows(docs.where(F.col("doc_id") % 2 == 1))
    inc = _pairs(incremental_candidate_pairs(old_rows, new_rows))
    full = _pairs(lsh_candidate_pairs(minhash_signatures(docs)))
    expected = {p for p in full if p[0] % 2 == 1 or p[1] % 2 == 1}
    assert inc == expected
    assert inc


def test_cross_batch_planted_duplicate(spark):
    """A batch-2 doc whose text duplicates a batch-1 doc must surface as
    a cross-batch pair with jaccard 1.0."""
    text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, f"filler words number {i} " + "pad " * (i % 4 + 3)) for i in range(2, 40, 2)]
    rows += [(100, text), (101, text)]  # 100 even=old, 101 odd=new
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = incremental_near_dup_portable(
        docs, F.col("doc_id") % 2 == 1, tau=0.2
    ).collect()
    hits = {(r["a_id"], r["b_id"]): r["jaccard"] for r in out}
    assert (100, 101) in hits and hits[(100, 101)] == 1.0


def test_flood_cap_is_combined_and_append_only(spark):
    """The documented cap semantics: batch 2 sees the COMBINED bucket
    size (old ∪ new), so a bucket that floods across batches emits
    nothing new — but batch 1's already-emitted pairs are append-only
    history (the final-corpus run would have suppressed that bucket
    entirely; the divergence is one-directional and deliberate)."""
    text = "identical flood document body with plenty of repeated words here"
    b1 = spark.createDataFrame(
        [(i, text) for i in range(4)], "doc_id long, text string"
    )
    b2 = spark.createDataFrame(
        [(i, text) for i in range(4, 7)], "doc_id long, text string"
    )
    # batch 1 against an empty index: bucket size 4 <= cap 5 -> all pairs
    empty = portable_banded_rows(b1.where(F.lit(False)))
    first = incremental_candidate_pairs(
        empty, portable_banded_rows(b1), max_bucket=5
    )
    assert len(_pairs(first)) == 6  # C(4,2)
    # batch 2: combined bucket size 7 > cap 5 -> flood-guarded, nothing
    second = incremental_candidate_pairs(
        portable_banded_rows(b1), portable_banded_rows(b2), max_bucket=5
    )
    assert _pairs(second) == set()
    # and the full final-corpus run suppresses the bucket too
    full = incremental_candidate_pairs(
        portable_banded_rows(b1.unionByName(b2).where(F.lit(False))),
        portable_banded_rows(b1.unionByName(b2)),
        max_bucket=5,
    )
    assert _pairs(full) == set()


def test_index_rows_compose(spark):
    """Appending each batch's band rows reproduces the full-corpus index
    exactly (same (__id, band, band_hash) multiset) — the invariant that
    makes the persisted index trustworthy after N increments."""
    docs = read_table(spark, SF_SMALL, "documents")
    full = portable_banded_rows(docs)
    parts = [
        portable_banded_rows(docs.where(F.col("doc_id") % 3 == k))
        for k in range(3)
    ]
    union = parts[0].unionByName(parts[1]).unionByName(parts[2])
    assert (
        full.exceptAll(union).count() == 0
        and union.exceptAll(full).count() == 0
    )
