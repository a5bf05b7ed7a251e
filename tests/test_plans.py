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
