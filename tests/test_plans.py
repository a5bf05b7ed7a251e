"""Plan-regression tests: the physical plans the engine is designed to
produce — pushdown, pruning, broadcast, exchange counts — asserted so a
refactor can't silently regress them (this is the 100 TB contract; the
row counts are checked elsewhere)."""

from __future__ import annotations

import re

import pytest

import __spark_entry__ as E


def _plan(spark, sf_dir, name):
    df = E.queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_filter_groupby")
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "LessThanOrEqual(l_shipdate" in m.group(1), \
        "shipdate filter must reach the parquet scan"
    schema = re.search(r"ReadSchema: struct<([^>]*)>", plan).group(1)
    assert "l_comment" not in schema and "l_partkey" not in schema, \
        "unused columns must be pruned from the scan"


def test_q6_all_filters_pushed(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q6_forecast_revenue")
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan).group(1)
    for expected in ("l_shipdate", "l_discount", "l_quantity"):
        assert expected in pushed, f"{expected} predicate not pushed"
    schema = re.search(r"ReadSchema: struct<([^>]*)>", plan).group(1)
    assert set(re.findall(r"(\w+):", schema)) == {
        "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"}


def test_q5_broadcasts_dims(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q5_region_revenue")
    assert "BroadcastHashJoin" in plan, \
        "small dimension tables must broadcast, not shuffle"
    assert "CartesianProduct" not in plan


def test_q3_pushes_both_date_filters(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q3_shipping_priority")
    pushed = " | ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))
    assert "o_orderdate" in pushed and "l_shipdate" in pushed
    assert "c_mktsegment" in pushed


def test_melt_has_no_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_melt")
    assert "Exchange" not in plan, "wide->long is row-local; no shuffle"


def test_rowwise_agg_has_no_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_rowwise_agg")
    assert "Exchange" not in plan, "row-wise aggregates are row-local"


def test_sample_hash_is_scan_side(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q_sample_hash")
    assert "Exchange" not in plan, "hash sampling is a row-local filter"


def test_timewidth_binning_stays_rowlocal(spark, sf_dir):
    """fixed_time_width is epoch arithmetic: the bin projection itself adds
    no Exchange beyond the final groupBy (one shuffle total)."""
    plan = _plan(spark, sf_dir, "q_discretize_timewidth")
    assert plan.count("Exchange") <= 2, plan  # agg partial+final only


def test_radviz_no_shuffle_beyond_stats(spark, sf_dir):
    """RadViz projection is a row-local expression; only the feature-build
    joins/aggregates shuffle, and dims broadcast."""
    plan = _plan(spark, sf_dir, "q_ml_radviz")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_lenient_timestamp_codegen(spark):
    """The format-probe coalesce must stay inside WholeStageCodegen —
    try_to_timestamp probes are JVM expressions, not fallbacks."""
    from orange3_spark.functions.timeparse import lenient_timestamp

    df = spark.range(5).selectExpr("CAST(id AS STRING) AS s")
    out = df.select(lenient_timestamp("s").alias("ts"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes mark WholeStageCodegen stages in the plan string
    assert plan.lstrip().startswith("*("), plan[:200]
    assert "Exchange" not in plan


def test_threshold_search_windows_pairs_not_rows(spark, sf_dir):
    """The threshold scan's single-reducer window runs over distinct
    (score, count) pairs — a partial aggregate must sit below it so only
    bounded-cardinality keys cross the exchange."""
    plan = _plan(spark, sf_dir, "q_ml_threshold")
    assert "Window" in plan
    agg_pos = plan.find("HashAggregate")
    win_pos = plan.find("Window")
    assert agg_pos != -1 and win_pos < plan.rfind("HashAggregate"), \
        "aggregate-before-window shape lost"
    schema = " | ".join(re.findall(r"ReadSchema: struct<([^>]*)>", plan))
    assert "o_comment" not in schema, "unused columns must be pruned"


def test_ivf_probe_join_not_cross(spark, sf_dir):
    """IVF candidate generation must be an equi-join on cell id (plus the
    tiny broadcast centroid cross join) — never a data-side cross join."""
    plan = _plan(spark, sf_dir, "q_knn_ivf")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # the candidate equi-join keys on the quantizer cell
    assert "cluster" in plan


def test_curvefit_prediction_is_codegen(spark, sf_dir):
    """Curve-fit inference is a literal expression: the final plan stays
    inside WholeStageCodegen with no Python evaluation."""
    plan = _plan(spark, sf_dir, "q_ml_curvefit")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_time_rollup_single_exchange(spark, sf_dir):
    """All rollup granularities must come from ONE shuffle (grouping sets),
    not one aggregation pass per resolution."""
    plan = _plan(spark, sf_dir, "q_time_rollup")
    n_exchange = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_exchange == 1, f"expected 1 exchange, saw {n_exchange}"
    assert "Expand" in plan  # grouping-sets expansion operator


def test_asof_and_range_join_plans(spark, sf_dir):
    """Event-type predicates reach the parquet scan and neither time-series
    join degenerates to a nested-loop/cartesian plan."""
    for name in ("q_asof_join", "q_range_join"):
        plan = _plan(spark, sf_dir, name)
        pushed = " | ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))
        assert "EqualTo(event_type,purchase)" in pushed, name
        assert "EqualTo(event_type,click)" in pushed, name
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_salted_aggregate_two_exchanges(spark, sf_dir):
    """Salted agg = exactly two shuffles: (key, salt) partials, then the
    metadata-sized merge on key — never a third pass."""
    plan = _plan(spark, sf_dir, "q_groupby_salted")
    n_exchange = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_exchange == 2, f"expected 2 exchanges, saw {n_exchange}"


def test_incremental_probe_is_equijoin(spark, sf_dir):
    """The index probe must stay a hash equi-join on (band, bucket) —
    no nested-loop fallback, no cartesian."""
    plan = _plan(spark, sf_dir, "q_dedup_incremental")
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_auc_windows_distinct_scores_not_rows(spark, sf_dir):
    """AUC's average-rank cumsum must window over the distinct-(score,
    count) aggregate, never the raw rows: a HashAggregate (map-side
    combined groupBy(score)) must sit below the Window in the plan."""
    from pyspark.sql import functions as F

    from orange3_spark.ml.evaluation import auc_rank_frame
    from orange3_spark.session import load_tables

    orders = load_tables(spark, sf_dir, ("orders",))["orders"]
    scored = orders.select(
        (F.col("o_totalprice") > 100000).cast("double").alias("label"),
        F.round((F.col("o_totalprice") / 1000).cast("double"), 0)
        .alias("score"))
    plan = (auc_rank_frame(scored, "label", "score")
            ._jdf.queryExecution().executedPlan().toString())
    win_pos = plan.find("Window")
    assert win_pos != -1
    assert plan.find("HashAggregate", win_pos) != -1, \
        "groupBy(score) partial aggregate must run below the rank window"


def test_randomize_has_no_single_partition_exchange(spark, sf_dir):
    """Randomize's row indexing and seeded reorder must stay
    partition-parallel: an unpartitioned Window.orderBy would appear as an
    Exchange SinglePartition in the plan."""
    plan = _plan(spark, sf_dir, "q_randomize")
    assert "Exchange SinglePartition" not in plan
