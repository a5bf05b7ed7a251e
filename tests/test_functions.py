"""Feature Constructor: sandbox, translation, error masking."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from orange3_spark.functions.feature_constructor import (
    ExpressionError, compile_to_pandas_udf, construct_feature,
    sanitized_name, validate_expression,
)


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [(1.0, 4.0, "a"), (3.0, 0.0, "b"), (None, 2.0, "c")],
        "x double, y double, tag string")


def test_arithmetic_and_functions(df):
    out = construct_feature(df, "z", "sqrt(y) + x * 2").collect()
    assert out[0].z == 4.0            # sqrt(4) + 2
    assert out[1].z == 6.0            # sqrt(0) + 6
    assert out[2].z is None           # NULL propagates (missing stays missing)


def test_conditional_and_comparison(df):
    out = construct_feature(df, "big", "1 if x >= 2 and y < 1 else 0").collect()
    assert [r.big for r in out] == [0, 1, 0]


def test_membership_and_strings(df):
    out = construct_feature(df, "m", "tag in ('a', 'c')").collect()
    assert [r.m for r in out] == [True, False, True]
    up = construct_feature(df, "u", "upper(tag)").collect()
    assert [r.u for r in up] == ["A", "B", "C"]


def test_division_masks_to_missing(df):
    # Orange masks ZeroDivisionError to NaN; here try_divide -> NULL
    out = construct_feature(df, "q", "x / y").collect()
    assert out[0].q == 0.25
    assert out[1].q is None           # 3/0 -> missing, no error
    assert out[2].q is None


def test_chained_comparison(df):
    out = construct_feature(df, "c", "0 < y <= 2").collect()
    assert [r.c for r in out] == [False, False, True]


def test_sandbox_rejects():
    for bad in ("__import__('os')", "open('/etc/passwd')",
                "(lambda: 1)()", "[i for i in range(3)]",
                "x.__class__", "exec('1')"):
        with pytest.raises(ExpressionError):
            validate_expression(bad)


def test_sanitized_name_binding(spark):
    df2 = spark.createDataFrame([(2.0,)], ["sepal length"])
    out = construct_feature(df2, "d", "sepal_length * 10").collect()
    assert out[0].d == 20.0
    assert sanitized_name("2 weird col!") == "_2_weird_col_"


def test_constants(df):
    out = construct_feature(df, "p", "pi").first()
    assert abs(out.p - math.pi) < 1e-12


def test_pandas_udf_fallback(df):
    col = compile_to_pandas_udf("x / y if y != 0 else None", df, ["x", "y"])
    out = df.withColumn("q", col).collect()
    assert out[0].q == 0.25 and out[1].q is None


def test_python_script_batch_and_grouped(spark):
    from orange3_spark.functions.python_script import python_script

    df = spark.createDataFrame(
        [(i, "g%d" % (i % 2), float(i)) for i in range(20)],
        "id long, g string, v double")

    out = python_script(
        df, lambda pdf: pdf.assign(v2=pdf.v * 2)[["id", "v2"]],
        "id long, v2 double")
    got = {r.id: r.v2 for r in out.collect()}
    assert got[7] == 14.0 and len(got) == 20

    # grouped mode: whole group per call (rank within group)
    out = python_script(
        df, lambda pdf: pdf.assign(rk=pdf.v.rank())[["id", "g", "rk"]],
        "id long, g string, rk double", group_by=["g"])
    got = {r.id: r.rk for r in out.collect()}
    assert got[0] == 1.0 and got[2] == 2.0   # even group: 0,2,4,...


def test_grouped_agg_udaf(spark):
    from orange3_spark.functions.python_script import grouped_agg
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 100.0), ("b", 5.0)], "g string, v double")
    median = grouped_agg(lambda s: float(s.median()))
    out = {r.g: r.med for r in
           df.groupBy("g").agg(median("v").alias("med")).collect()}
    assert out == {"a": 2.0, "b": 5.0}
