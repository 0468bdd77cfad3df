"""Behavior tests for the round-8 additions: curation attrition funnel,
corpus snapshot diff, nearest-centroid classifier."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawling_vectordb_llm_spark.suite import QUERIES

from .conftest import SF_SMALL


def test_attrition_funnel_is_monotone_and_consistent(spark):
    rows = {
        r["stage"]: r
        for r in QUERIES["curation_attrition_funnel"](spark, SF_SMALL).collect()
    }
    stages = sorted(rows)
    assert stages == [
        "0_total", "1_length_gate", "2_quality_gate",
        "3_exact_dedup", "4_lang_allowlist",
    ]
    surv = [rows[s]["surviving"] for s in stages]
    # cumulative gates can only shrink the corpus
    assert all(a >= b for a, b in zip(surv, surv[1:]))
    # stage-0 surviving == corpus size
    n_docs = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    )
    assert surv[0] == n_docs
    # dropped accounting: each stage's dropped = previous surviving - own
    for prev, s in zip(stages, stages[1:]):
        assert rows[s]["dropped"] == rows[prev]["surviving"] - rows[s]["surviving"]
    # the funnel is not vacuous at this fixture: something must drop
    assert surv[-1] < surv[0]


def test_snapshot_diff_statuses_match_construction(spark):
    out = QUERIES["snapshot_diff"](spark, SF_SMALL).collect()
    by_status: dict[str, set[int]] = {}
    for r in out:
        by_status.setdefault(r["status"], set()).add(r["doc_id"])
    # v1 = ids % 10 != 0, v2 = ids % 10 != 1 with % 7 == 0 revised
    n = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    ids = range(n)
    assert by_status.get("added", set()) == {i for i in ids if i % 10 == 0}
    assert by_status.get("removed", set()) == {i for i in ids if i % 10 == 1}
    assert by_status.get("changed", set()) == {
        i for i in ids if i % 7 == 0 and i % 10 not in (0, 1)
    }
    assert set(by_status) <= {"added", "removed", "changed"}


def test_centroid_classifier_beats_chance(spark):
    out = QUERIES["centroid_classifier_assign"](spark, SF_SMALL)
    agg = out.agg(
        F.avg(F.col("correct").cast("double")).alias("acc"),
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("pred_class").alias("n_classes"),
    ).collect()[0]
    # held-out fifth of 500 vectors
    assert agg["n"] == 100
    # 10 anchor classes -> chance is ~0.1; learned centroids must
    # generalize well above it (measured ~0.5 at both sf0.001 and sf0.01)
    assert agg["acc"] >= 0.3, f"held-out accuracy {agg['acc']}"
    # degenerate single-class predictions would also fail chance math
    assert agg["n_classes"] >= 3
    # scores are valid cosines
    bad = out.where((F.col("score") > 1.000001) | (F.col("score") < -1.000001))
    assert bad.count() == 0
