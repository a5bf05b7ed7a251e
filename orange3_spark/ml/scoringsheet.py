"""Scoring sheets: sparse integer-point risk scores.

Reference: ``Orange/classification/scoringsheet.py`` wraps FasterRisk
(RiskScoreOptimizer) — a binary classifier constrained to at most
``num_decision_params`` features with integer points in
``[-max_points, +max_points]``, presented as a tally sheet; probabilities
come from a logistic link over the total score.  Its preprocessing stack is
discretize → impute → continuize (binary indicator features).

Spark-first equivalent (the sequential FasterRisk solver has no
distributed form, but its *model class* does):

1. binarize each feature at its median (one ``percentile_approx``
   aggregate; indicator expressions — the Binning+Continuize preprocessors
   collapsed into one step),
2. fit a distributed L2 logistic regression (MLlib) on the indicators,
3. keep the ``num_decision_params`` largest-|coefficient| features and
   rescale to integer points in ``[-max_points, +max_points]``,
4. recalibrate the integer total score with Platt scaling
   (``ml/calibration.py``) so predicted probabilities stay honest after
   rounding.

Inference is pure codegen: the score is a sum of CASE indicators times
integer literals, probability a sigmoid of ``a*score+b``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from orange3_spark.ml.learners import Model

__all__ = ["scoring_sheet_learner"]


def scoring_sheet_learner(df: DataFrame, features: Sequence[str],
                          class_col: str, *,
                          num_decision_params: int = 5,
                          max_points: int = 5,
                          max_iter: int = 50) -> Model:
    """Returns a Model with ``.sheet`` — ``[(feature, threshold, points)]``
    — and ``predict`` appending ``score`` (int), ``probability`` and
    ``prediction`` columns."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    from orange3_spark.ml.calibration import platt_scaling

    feats = list(features)
    meds = df.agg(*[F.percentile_approx(F.col(c).cast("double"), 0.5)
                    .alias(c) for c in feats]).first()

    def indicator(c: str) -> Column:
        return (F.col(c).cast("double") >= F.lit(float(meds[c]))) \
            .cast("double")

    ind = df.select(F.col(class_col).cast("double").alias("__y"),
                    *[indicator(c).alias(f"__b_{i}")
                      for i, c in enumerate(feats)])
    from orange3_spark.ml.learners import right_size_for_fit

    va = VectorAssembler(inputCols=[f"__b_{i}" for i in range(len(feats))],
                         outputCol="features", handleInvalid="skip")
    lr = LogisticRegression(featuresCol="features", labelCol="__y",
                            maxIter=max_iter, regParam=1e-3)
    train = right_size_for_fit(va.transform(ind))
    try:
        fit = lr.fit(train)
    finally:
        train.unpersist()
    coefs = [float(v) for v in fit.coefficients]

    chosen = sorted(range(len(feats)), key=lambda i: -abs(coefs[i]))
    chosen = sorted(chosen[:num_decision_params])
    top = max((abs(coefs[i]) for i in chosen), default=0.0)
    scale = (max_points / top) if top > 0 else 0.0
    sheet = []
    for i in chosen:
        pts = int(round(coefs[i] * scale))
        if pts != 0:
            sheet.append((feats[i], float(meds[feats[i]]), pts))

    def score_col(d: DataFrame) -> Column:
        s: Column = F.lit(0)
        for feat, thr, pts in sheet:
            s = s + F.when(F.col(feat).cast("double") >= F.lit(thr),
                           F.lit(pts)).otherwise(F.lit(0))
        return s

    scored = df.withColumn("score", score_col(df))
    cal = platt_scaling(scored, "score", class_col, max_iter=max_iter)

    def _predict(d: DataFrame) -> DataFrame:
        out = d.withColumn("score", score_col(d))
        z = F.col("score").cast("double") * F.lit(cal.a) + F.lit(cal.b)
        out = out.withColumn("probability",
                             F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))
        return out.withColumn(
            "prediction", (F.col("probability") >= 0.5).cast("double"))

    m = Model(_predict, "scoring_sheet")
    m.sheet = sheet
    m.calibration = (cal.a, cal.b)
    return m
