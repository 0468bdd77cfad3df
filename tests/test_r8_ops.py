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


def test_kcore_planted_clique_survives_chain_peels(spark):
    from crawling_vectordb_llm_spark.operators.components import kcore_nodes

    # K4 clique on 0-3, chain 10-11-12-13-14, isolated pair 20-21
    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    chain = [(10, 11), (11, 12), (12, 13), (13, 14)]
    pair = [(20, 21)]
    pairs = spark.createDataFrame(clique + chain + pair, "a_id long, b_id long")
    core2 = {
        r["node"]: r["core_degree"]
        for r in kcore_nodes(pairs, k=2, rounds=8).collect()
    }
    # chain and pair peel away completely; the clique survives with deg 3
    assert set(core2) == {0, 1, 2, 3}
    assert all(d == 3 for d in core2.values())
    core3 = kcore_nodes(pairs, k=3, rounds=8).collect()
    assert {r["node"] for r in core3} == {0, 1, 2, 3}
    core4 = kcore_nodes(pairs, k=4, rounds=8).collect()
    assert core4 == []


def test_checkpoint_with_count_matches_plain_count(spark):
    """r13 optimization: kcore's per-round count rides the checkpoint
    materialization scan as an observe() metric (one job, not two).  The
    fused count must equal the plain count, including the empty case."""
    from crawling_vectordb_llm_spark.operators.components import (
        _checkpoint_with_count,
    )

    df = spark.range(1234).selectExpr("id AS a", "id + 1 AS b")
    cp, n = _checkpoint_with_count(df, "t_cnt")
    assert n == 1234 == cp.count()
    empty = df.where("a < 0")
    cp0, n0 = _checkpoint_with_count(empty, "t_cnt0")
    assert n0 == 0 == cp0.count()


def test_kcore_fixture_converges_inside_round_budget(spark):
    """The pinned 8-round budget must reach the true fixpoint on fixture
    graphs — otherwise the operator's output is a budget artifact."""
    from crawling_vectordb_llm_spark.operators.components import kcore_nodes
    from crawling_vectordb_llm_spark.suite.dedup_suite import (
        KCORE_K,
        KCORE_ROUNDS,
        _bounded_edges,
    )

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    pairs = _bounded_edges(emb).select("a_id", "b_id")
    at_budget = {
        (r["node"], r["core_degree"])
        for r in kcore_nodes(pairs, KCORE_K, rounds=KCORE_ROUNDS).collect()
    }
    past_budget = {
        (r["node"], r["core_degree"])
        for r in kcore_nodes(pairs, KCORE_K, rounds=KCORE_ROUNDS + 4).collect()
    }
    assert at_budget == past_budget


def test_leakage_safe_split_never_splits_a_cluster(spark):
    rows = QUERIES["leakage_safe_split"](spark, SF_SMALL).collect()
    by_cluster: dict[int, set[str]] = {}
    naive_by_cluster: dict[int, set[str]] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
        naive_by_cluster.setdefault(r["cluster_id"], set()).add(r["naive_split"])
    # the whole point: cluster-routed split is constant within a cluster
    assert all(len(s) == 1 for s in by_cluster.values())
    # the audit flag matches the naive-split spread
    for r in rows:
        assert r["cluster_leaky"] == (len(naive_by_cluster[r["cluster_id"]]) > 1)
    # every vector is assigned
    n_vecs = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").count()
    assert len(rows) == n_vecs


def test_seeded_shuffle_rank_is_a_permutation(spark):
    rows = QUERIES["seeded_shuffle_rank"](spark, SF_SMALL).collect()
    n = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    ranks = sorted(r["shuffle_rank"] for r in rows)
    assert ranks == list(range(1, n + 1))  # dense permutation, no window
    # seeded => stable across executions
    again = {
        r["doc_id"]: r["shuffle_rank"]
        for r in QUERIES["seeded_shuffle_rank"](spark, SF_SMALL).collect()
    }
    assert all(again[r["doc_id"]] == r["shuffle_rank"] for r in rows)
    # and genuinely shuffled: not the identity order
    by_doc = sorted(rows, key=lambda r: r["doc_id"])
    assert [r["shuffle_rank"] for r in by_doc] != sorted(
        r["shuffle_rank"] for r in by_doc
    )


def test_global_rank_matches_window_row_number(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as SF

    from crawling_vectordb_llm_spark.operators.topk import global_rank

    df = spark.range(0, 999).select(
        SF.col("id"), SF.md5(SF.col("id").cast("string")).alias("k")
    ).repartition(7)
    got = {
        r["id"]: r["rank"]
        for r in global_rank(df, [SF.col("k"), SF.col("id")]).collect()
    }
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", SF.row_number().over(Window.orderBy("k", "id"))
        ).collect()
    }
    assert got == want


def test_perplexity_terciles_balanced_and_complete(spark):
    rows = QUERIES["perplexity_tercile_mix"](spark, SF_SMALL).collect()
    langs = {r["lang"] for r in rows}
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    assert langs == {r["lang"] for r in docs.select("lang").distinct().collect()}
    for lang in langs:
        sub = {r["bucket"]: r for r in rows if r["lang"] == lang}
        assert set(sub) == {"head", "middle", "tail"}
        n = sum(r["n_docs"] for r in sub.values())
        # terciles: each bucket holds roughly a third (quantile boundaries
        # can shift a few docs)
        for r in sub.values():
            assert 0.15 <= r["n_docs"] / n <= 0.52, (lang, dict(sub))
        assert abs(sum(r["lang_share"] for r in sub.values()) - 1.0) < 1e-4


def test_corpus_drift_psi_detects_planted_shift(spark):
    rows = QUERIES["corpus_drift_psi"](spark, SF_SMALL).collect()
    feats = {r["feature"] for r in rows}
    assert feats == {"lang", "len_bucket"}
    for r in rows:
        # proportions are valid and terms finite
        assert 0 < r["p1"] <= 1 and 0 < r["p2"] <= 1
        assert r["psi_term"] is not None
        # PSI terms are non-negative by construction ((p2-p1) and
        # ln(p2/p1) always share a sign)
        assert r["psi_term"] >= 0
    # the planted ' [rev2]' revision + one-in-ten drops are a SMALL drift:
    # per-feature PSI must be positive but nowhere near the 0.2 alarm
    for f in feats:
        psi = sum(r["psi_term"] for r in rows if r["feature"] == f)
        assert 0 <= psi < 0.2, (f, psi)
    # ...and at least one length bucket actually moved
    assert any(
        r["n1"] != r["n2"] for r in rows if r["feature"] == "len_bucket"
    )
