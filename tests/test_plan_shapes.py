"""Physical-plan regression tests — the scale contract.

Correct results are necessary but not sufficient: these assert the PLANS
stay right (pushdown reaches the scan, small dims broadcast, top-k avoids
full sorts, the as-of join shuffles exactly once).  A regression here is a
100 TB performance bug even when sf0.01 results stay correct.
"""

from __future__ import annotations

import pytest

from crawling_vectordb_llm_spark.suite import QUERIES

from .conftest import SF_MEDIUM


def plan_of(spark, name: str, execute: bool = False) -> str:
    df = QUERIES[name](spark, SF_MEDIUM)
    if execute:  # AQE reveals the final (codegen-annotated) plan only then
        df.collect()  # count() would plan a DIFFERENT query; collect this one
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_projection_pushed_to_scan(spark):
    plan = plan_of(spark, "filter_project")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    # column pruning: the 11-column table scans only the 6 needed columns
    scan = next(l for l in plan.splitlines() if "FileScan" in l)
    cols = scan.split("FileScan parquet [", 1)[1].split("]", 1)[0].split(",")
    assert len(cols) == 6, cols
    assert plan.count("Exchange") == 0  # pure map job: no shuffle at all


def test_dim_joins_broadcast(spark):
    assert "BroadcastHashJoin" in plan_of(spark, "join_broadcast")
    multi = plan_of(spark, "join_multiway")
    # customer/nation/region ride broadcasts; only lineitem<->orders shuffles
    assert multi.count("BroadcastHashJoin") >= 3


def test_semi_join_broadcasts(spark):
    plan = plan_of(spark, "semi_join")
    assert "LeftSemi" in plan and "Broadcast" in plan


def test_global_topk_avoids_full_sort(spark):
    plan = plan_of(spark, "topk_global")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange") == 0


def test_hash_agg_has_partial_phase(spark):
    plan = plan_of(spark, "pricing_summary")
    assert "partial_" in plan  # map-side combine before the single shuffle
    assert plan.count("Exchange") == 1


def test_knn_sql_broadcasts_queries(spark):
    plan = plan_of(spark, "knn_topk_sql")
    assert "BroadcastNestedLoopJoin" in plan
    # corpus side scans only (vec_id, embedding)
    assert "PushedFilters" in plan


def test_asof_join_single_shuffle(spark):
    plan = plan_of(spark, "asof_join")
    assert plan.count("Exchange") == 1  # one hash partition on user_id
    assert "Window" in plan


def test_no_cartesian_products_anywhere(spark):
    for name in (
        "join_broadcast",
        "join_multiway",
        "semi_join",
        "anti_join",
        "range_join_bands",
    ):
        assert "CartesianProduct" not in plan_of(spark, name), name


@pytest.mark.parametrize(
    "name", ["pricing_summary", "join_broadcast", "window_rank_topk"]
)
def test_whole_stage_codegen_active(spark, name):
    # "*(n)" prefixes mark operators fused into a WholeStageCodegen stage
    assert "*(1)" in plan_of(spark, name, execute=True)

def test_sequence_packing_single_shuffle(spark):
    """Packing must shuffle exactly once (hash by shard), never globally:
    a single-partition global cumsum would be the 100 TB deathtrap."""
    plan = plan_of(spark, "sequence_packing")
    assert plan.count("Exchange") == 1
    assert "hashpartitioning(shard_id" in plan
    assert "SinglePartition" not in plan


def test_quality_band_bounds_broadcast(spark):
    """The per-lang percentile bounds table must ride a broadcast back
    onto the corpus — no full-data window, no second corpus shuffle."""
    plan = plan_of(spark, "quality_band_filter")
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_interval_overlap_stays_equi_join(spark):
    """Banding must plan as a HASH join on (supplier, week) with the
    overlap predicate as a join-condition filter — a
    BroadcastNestedLoopJoin or CartesianProduct here means the band keys
    stopped matching and the join degenerated to the O(n^2) theta form."""
    plan = plan_of(spark, "interval_overlap_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan
    # the interval table is checkpointed (both self-join sides read it),
    # so the pruned FileScan sits behind the RDD scan boundary here; scan
    # pruning itself is pinned by test_filter_and_projection_pushed_to_scan


def test_dsir_model_broadcasts_back(spark):
    """The 4096-row hashed-bigram model must ride a broadcast onto the
    feature stream; the corpus itself shuffles only for the final
    per-doc mean."""
    plan = plan_of(spark, "dsir_importance_weights")
    assert "BroadcastHashJoin" in plan


def test_url_canonicalize_is_map_only(spark):
    """The whole regexp chain must fuse into the scan projection — any
    Exchange here is a planner regression (it's a pure per-row op)."""
    plan = plan_of(spark, "url_canonicalize")
    assert "Exchange" not in plan


def test_hll_rolling_shuffles_raw_events_once(spark):
    """Raw events collapse to distinct (type, day, user) triples in ONE
    up-front shuffle (checkpointed); everything downstream — the sketch
    build, the 7-day union, and the in-query exact-verification branch —
    exchanges only day-level / triple-level rows, never raw event
    columns."""
    plan = plan_of(spark, "rolling_distinct_users_hll")
    assert "hll_union_agg" in plan
    # the raw-event scan was collapsed into the checkpointed triple table:
    # no FileScan of events remains in the final plan
    assert "FileScan" not in plan
    assert "BroadcastExchange" in plan
    # no exchange keys on raw event columns (ts/value/event_id/props)
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "event_id" not in line and "value#" not in line
            assert "ts#" not in line and "props" not in line
