"""Bucketed tables: co-located joins and aggregations skip the Exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from orange3_spark.sources.bucketing import (
    is_exchange_free_join, write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    write_bucketed(orders, "t_orders_b", ["o_custkey"], 8,
                   sort_by=["o_custkey"])
    write_bucketed(customer.withColumnRenamed("c_custkey", "o_custkey"),
                   "t_customer_b", ["o_custkey"], 8, sort_by=["o_custkey"])
    return spark


def test_bucketed_join_no_exchange(bucketed):
    spark = bucketed
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        left = spark.table("t_orders_b")
        right = spark.table("t_customer_b").select("o_custkey", "c_name")
        joined, no_exchange = is_exchange_free_join(left, right, ["o_custkey"])
        assert no_exchange, "bucketed equi-join must not shuffle"
        # and it's still correct
        plain = left.join(right, "o_custkey")
        assert joined.count() == plain.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_no_exchange(bucketed):
    spark = bucketed
    agg = (spark.table("t_orders_b")
           .groupBy("o_custkey").agg(F.sum("o_totalprice").alias("s")))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "groupBy on the bucket key must not shuffle"
    assert agg.count() > 0


def test_unbucketed_join_does_exchange(bucketed, sf_dir):
    """Control: the same join on plain parquet shuffles (proves the test
    above is measuring bucketing, not something else)."""
    spark = bucketed
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        customer = spark.read.parquet(f"{sf_dir}/customer.parquet") \
            .withColumnRenamed("c_custkey", "o_custkey") \
            .select("o_custkey", "c_name")
        _, no_exchange = is_exchange_free_join(orders, customer, ["o_custkey"])
        assert not no_exchange
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
