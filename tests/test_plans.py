"""Plan-shape assertions: the scale properties PLANS.md documents must hold
structurally, not just anecdotally — pushdown, partial agg, broadcast, and
rank-limit pushdown are part of each operator's contract."""

from __future__ import annotations

import __spark_entry__ as E

from real_time_sliding_window_spark.plans.audit import scorecard

SF = "/root/testdata/sf0.001"


def test_filter_pushdown_and_partial_agg(spark):
    sc = scorecard(E.q_lineitem_pricing(spark, SF))
    assert sc["pushed_filters"], "shipdate filter must reach the parquet scan"
    assert sc["partial_agg"], "map-side combine must precede the shuffle"
    assert sc["scan_cols"] <= 5, "column pruning must reach the scan"


def test_topk_rank_limit_pushdown(spark):
    sc = scorecard(E.q_topk_events_per_user(spark, SF))
    assert sc["window_group_limit"], "top-k must use WindowGroupLimit"


def test_dim_join_broadcasts(spark):
    sc = scorecard(E.q_orders_by_segment(spark, SF))
    assert sc["broadcast_join"], "customer dim must broadcast, not shuffle"


def test_window_agg_single_shuffle(spark):
    sc = scorecard(E.q_tumbling_events(spark, SF))
    assert sc["partial_agg"]
    # one shuffle for the group-by (+ possibly AQE read) — never a global sort
    assert sc["exchanges"] <= 2
