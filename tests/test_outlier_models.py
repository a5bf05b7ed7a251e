"""Sklearn-parity outlier learners: planted extremes must be flagged and
refits must be byte-stable (the learners replace sklearn wrappers at
Orange/classification/outlier_detection.py:88,114,158)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


def _planted(spark, seed=0):
    """80 inliers in a tight 2-d blob + 4 far outliers."""
    import numpy as np
    rng = np.random.default_rng(seed)
    inliers = rng.normal(0.0, 1.0, size=(80, 2))
    outliers = [[12.0, 12.0], [-13.0, 11.0], [14.0, -12.0], [-11.0, -14.0]]
    rows = [(i, float(x), float(y))
            for i, (x, y) in enumerate(list(inliers) + outliers)]
    return spark.createDataFrame(rows, "id int, x double, y double")


def test_isolation_forest_flags_planted(spark):
    from orange3_spark.ml.outlier_models import isolation_forest

    df = _planted(spark)
    model = isolation_forest(df, ["x", "y"], n_trees=50, psi=64, seed=3)
    out = model.predict(df, contamination=4 / 84).cache()
    flagged = {r["id"] for r in out.filter("is_outlier").collect()}
    assert {80, 81, 82, 83} <= flagged
    assert len(flagged) <= 8
    # refit determinism: identical flags
    again = isolation_forest(df, ["x", "y"], n_trees=50, psi=64, seed=3)
    flagged2 = {r["id"] for r in
                again.predict(df, contamination=4 / 84)
                .filter("is_outlier").collect()}
    assert flagged == flagged2


def test_elliptic_envelope_flags_planted(spark):
    from orange3_spark.ml.outlier_models import elliptic_envelope

    df = _planted(spark)
    model = elliptic_envelope(df, ["x", "y"])
    out = model.predict(df, contamination=4 / 84)
    flagged = {r["id"] for r in out.filter("is_outlier").collect()}
    assert {80, 81, 82, 83} <= flagged
    # robust location stays near the blob despite the extremes
    assert abs(model.location[0]) < 1.0 and abs(model.location[1]) < 1.0


def test_elliptic_envelope_predict_is_codegen(spark):
    from orange3_spark.ml.outlier_models import elliptic_envelope

    df = _planted(spark)
    model = elliptic_envelope(df, ["x", "y"])
    plan = (df.withColumn("m", model.mahalanobis_sq())
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ocsvm_separates_planted(spark):
    from orange3_spark.ml.outlier_models import one_class_svm

    df = _planted(spark)
    model = one_class_svm(df, ["x", "y"], nu=0.1, seed=3)
    out = model.predict(df).cache()
    mean_in = out.filter("id < 80").agg(F.avg("svm_score")).first()[0]
    mean_out = out.filter("id >= 80").agg(F.avg("svm_score")).first()[0]
    assert mean_out < mean_in, "outliers must score lower than inliers"
    n_far_flagged = out.filter("id >= 80 AND is_outlier").count()
    assert n_far_flagged >= 3


def test_envelope_needs_enough_rows(spark):
    from orange3_spark.ml.outlier_models import elliptic_envelope

    df = spark.createDataFrame([(1.0, 2.0)], "x double, y double")
    with pytest.raises(ValueError):
        elliptic_envelope(df, ["x", "y"])
