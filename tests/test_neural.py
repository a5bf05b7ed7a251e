"""MLP regressor: must learn a real nonlinearity far beyond any linear
fit, and refits must be byte-stable (NNRegressionLearner parity,
Orange/tests/test_nn.py)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F


def _sine(spark, n=600):
    rows = [(i, i / 100.0, math.sin(i / 100.0) * 2.0 + 1.0)
            for i in range(n)]
    return spark.createDataFrame(rows, "id long, x double, y double")


def test_mlp_learns_sine(spark):
    from orange3_spark.ml.learners import ols_learner
    from orange3_spark.ml.neural import mlp_regressor

    df = _sine(spark)
    model = mlp_regressor(df, ["x"], "y", id_cols=["id"], hidden=32,
                          epochs=800, seed=1)
    pred = model.predict(df)
    rmse = pred.agg(F.sqrt(F.avg((F.col("y") - F.col("prediction"))
                                 ** 2))).first()[0]
    lin = ols_learner(df, ["x"], "y").predict(df)
    rmse_lin = lin.agg(F.sqrt(F.avg((F.col("y") - F.col("prediction"))
                                    ** 2))).first()[0]
    assert rmse < rmse_lin * 0.5, (rmse, rmse_lin)


def test_mlp_refit_deterministic(spark):
    from orange3_spark.ml.neural import mlp_regressor

    df = _sine(spark, 200)
    m1 = mlp_regressor(df, ["x"], "y", id_cols=["id"], epochs=50, seed=3)
    m2 = mlp_regressor(df, ["x"], "y", id_cols=["id"], epochs=50, seed=3)
    import numpy as np
    assert np.array_equal(m1.W1, m2.W1) and np.array_equal(m1.w2, m2.w2)
    assert m1.b2 == m2.b2
