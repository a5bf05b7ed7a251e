"""SVR family (Orange/regression/svm.py:11,22,33): the RFF-RBF fit must
capture a nonlinearity the linear variant cannot, deterministically."""

from __future__ import annotations

import math

import pyspark.sql.functions as F


def _sine(spark):
    rows = [(i, i / 50.0 * 2 * math.pi, math.sin(i / 50.0 * 2 * math.pi))
            for i in range(200)]
    return spark.createDataFrame(rows, "id int, x double, y double")


def _rmse(pred):
    return pred.agg(F.sqrt(F.avg(
        F.pow(F.col("prediction") - F.col("y"), 2)))).first()[0]


def test_rbf_svr_fits_sine(spark):
    from orange3_spark.ml.svr import svr

    df = _sine(spark)
    model = svr(df, ["x"], "y", epsilon=0.05, gamma=8.0, epochs=500, seed=1)
    assert _rmse(model.predict(df)) < 0.25
    # determinism: same seed, same predictions
    again = svr(df, ["x"], "y", epsilon=0.05, gamma=8.0, epochs=500, seed=1)
    a = model.predict(df).orderBy("id").select("prediction").collect()
    b = again.predict(df).orderBy("id").select("prediction").collect()
    assert a == b


def test_nu_svr_fits_sine(spark):
    from orange3_spark.ml.svr import nu_svr

    df = _sine(spark)
    model = nu_svr(df, ["x"], "y", nu=0.4, gamma=8.0, epochs=500, seed=1)
    assert _rmse(model.predict(df)) < 0.3


def test_linear_svr_is_codegen_and_weaker_on_sine(spark):
    from orange3_spark.ml.svr import linear_svr, svr

    df = _sine(spark)
    lin = linear_svr(df, ["x"], "y", epochs=500)
    rbf = svr(df, ["x"], "y", gamma=8.0, epochs=500, seed=1)
    rmse_lin, rmse_rbf = _rmse(lin.predict(df)), _rmse(rbf.predict(df))
    assert rmse_rbf < rmse_lin, "RBF must beat linear on a sine"
    plan = (lin.predict(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_linear_svr_recovers_line(spark):
    from orange3_spark.ml.svr import linear_svr

    rows = [(i, float(i), 3.0 * i + 7.0) for i in range(100)]
    df = spark.createDataFrame(rows, "id int, x double, y double")
    model = linear_svr(df, ["x"], "y", epsilon=0.01, epochs=2000)
    assert _rmse(model.predict(df)) < 5.0
