"""Scoring sheets: sparse integer-point risk scores.

Reference: ``Orange/classification/scoringsheet.py`` wraps FasterRisk
(RiskScoreOptimizer) — a binary classifier constrained to at most
``num_decision_params`` features with integer points in
``[-max_points, +max_points]``, presented as a tally sheet; probabilities
come from a logistic link over the total score.  Its preprocessing stack is
discretize → impute → continuize (binary indicator features).

Spark-first equivalent (the sequential FasterRisk solver has no
distributed form, but its *model class* does):

1. binarize each feature at its EXACT interpolated median (one
   ``percentile`` aggregate; p=0.5 interpolation fractions are only 0 or
   0.5, so the value is bit-identical across engines),
2. fit logistic regression on the indicators — binary indicators mean the
   whole training set collapses to a 2^p-row CONTINGENCY table of exact
   integer counts (one distributed groupBy), and the weighted Newton/IRLS
   solve runs on the driver as a pure function of those integers — fully
   deterministic under any partitioning, and replayable through DuckDB
   (``plans/oracle_replay.scoringsheet_oracle``); the earlier MLlib
   L-BFGS fit was deterministic only per-partitioning,
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

__all__ = ["scoring_sheet_learner", "exact_median", "irls_counts",
           "sheet_from_coefs"]


def exact_median(values) -> float:
    """Mirror of Spark SQL ``percentile(col, 0.5)``: sort, position =
    0.5·(n−1), linear interpolation.  The fraction is 0 or exactly 0.5,
    so ``v[k]·0.5 + v[k+1]·0.5`` is one exact scaling per term + one
    correctly-rounded add — bit-identical in every engine."""
    vs = sorted(float(v) for v in values)
    n = len(vs)
    if n == 0:
        raise ValueError("median of empty column")
    pos = 0.5 * (n - 1)
    lo = int(pos)
    if pos == lo:
        return vs[lo]
    return vs[lo] * 0.5 + vs[lo + 1] * 0.5


def irls_counts(patterns, counts, positives, *, n_features: int,
                ridge: float = 1e-3, iters: int = 30):
    """Weighted Newton/IRLS logistic fit on a contingency table —
    ``patterns`` are 0/1 indicator tuples, ``counts``/``positives`` exact
    ints.  Pure numpy on a 2^p×(p+1) system; shared verbatim by the Spark
    fit and the oracle replay, so both produce identical coefficients."""
    import numpy as np

    X = np.hstack([np.ones((len(patterns), 1)),
                   np.asarray(patterns, dtype=np.float64)])
    n = np.asarray(counts, dtype=np.float64)
    k = np.asarray(positives, dtype=np.float64)
    beta = np.zeros(n_features + 1)
    lam = ridge * float(n.sum())
    for _ in range(iters):
        z = X @ beta
        p = 1.0 / (1.0 + np.exp(-z))
        grad = X.T @ (k - n * p)
        grad[1:] -= lam * beta[1:]          # don't shrink the intercept
        w = n * p * (1.0 - p)
        H = X.T @ (X * w[:, None])
        H[1:, 1:] += lam * np.eye(n_features)
        H += 1e-12 * np.eye(n_features + 1)
        step = np.linalg.solve(H, grad)
        beta = beta + step
        if float(np.abs(step).max()) < 1e-12:
            break
    return [float(b) for b in beta]


def sheet_from_coefs(feats, meds, coefs, *, num_decision_params: int,
                     max_points: int):
    """Top-|coef| selection + integer rescale — shared by fit and replay.
    ``coefs`` excludes the intercept."""
    chosen = sorted(range(len(feats)), key=lambda i: -abs(coefs[i]))
    chosen = sorted(chosen[:num_decision_params])
    top = max((abs(coefs[i]) for i in chosen), default=0.0)
    scale = (max_points / top) if top > 0 else 0.0
    sheet = []
    for i in chosen:
        pts = int(round(coefs[i] * scale))
        if pts != 0:
            sheet.append((feats[i], float(meds[i]), pts))
    return sheet


def scoring_sheet_learner(df: DataFrame, features: Sequence[str],
                          class_col: str, *,
                          num_decision_params: int = 5,
                          max_points: int = 5,
                          max_iter: int = 50) -> Model:
    """Returns a Model with ``.sheet`` — ``[(feature, threshold, points)]``
    — and ``predict`` appending ``score`` (int), ``probability`` and
    ``prediction`` columns."""
    from orange3_spark.ml.calibration import platt_scaling

    feats = list(features)
    if len(feats) > 20:
        raise ValueError("scoring sheet contingency is 2^p rows — "
                         "preselect at most 20 candidate features")
    meds_row = df.agg(*[
        F.expr(f"percentile(CAST(`{c}` AS DOUBLE), 0.5)").alias(c)
        for c in feats]).first()
    meds = [float(meds_row[c]) for c in feats]

    def indicator(c: str, m: float) -> Column:
        return (F.col(c).cast("double") >= F.lit(m)).cast("int")

    # the whole training set as a 2^p contingency of exact integer counts
    cont = (df.select(F.col(class_col).cast("double").alias("__y"),
                      *[indicator(c, m).alias(f"__b_{i}")
                        for i, (c, m) in enumerate(zip(feats, meds))])
            .groupBy(*[f"__b_{i}" for i in range(len(feats))])
            .agg(F.count(F.lit(1)).alias("__n"),
                 F.sum((F.col("__y") == 1.0).cast("long")).alias("__k"))
            .collect())
    patterns = [tuple(int(r[f"__b_{i}"]) for i in range(len(feats)))
                for r in cont]
    counts = [int(r["__n"]) for r in cont]
    pos = [int(r["__k"]) for r in cont]
    order = sorted(range(len(patterns)), key=lambda i: patterns[i])
    beta = irls_counts([patterns[i] for i in order],
                       [counts[i] for i in order],
                       [pos[i] for i in order],
                       n_features=len(feats), iters=max_iter)
    coefs = beta[1:]
    sheet = sheet_from_coefs(feats, meds, coefs,
                             num_decision_params=num_decision_params,
                             max_points=max_points)

    def score_col(d: DataFrame) -> Column:
        s: Column = F.lit(0)
        for feat, thr, pts in sheet:
            s = s + F.when(F.col(feat).cast("double") >= F.lit(thr),
                           F.lit(pts)).otherwise(F.lit(0))
        return s

    # Platt calibration is only consumed by predict() / ``.calibration``;
    # fitting it eagerly cost ~20 MLlib L-BFGS jobs per learner even when
    # the caller only reads ``.sheet`` (q_scoring_sheet does exactly
    # that).  Defer it to first use — the deferred fit runs on the
    # identical scored frame, so every downstream number is unchanged
    # (r10 optimization; guide §1.2: don't compute what gets thrown away).
    cal_box: list = []

    def _cal():
        if not cal_box:
            scored = df.withColumn("score", score_col(df))
            cal_box.append(platt_scaling(scored, "score", class_col,
                                         max_iter=max_iter))
        return cal_box[0]

    def _predict(d: DataFrame) -> DataFrame:
        cal = _cal()
        out = d.withColumn("score", score_col(d))
        z = F.col("score").cast("double") * F.lit(cal.a) + F.lit(cal.b)
        out = out.withColumn("probability",
                             F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))
        return out.withColumn(
            "prediction", (F.col("probability") >= 0.5).cast("double"))

    class _LazyCalModel(Model):
        @property
        def calibration(self):
            cal = _cal()
            return (cal.a, cal.b)

    m = _LazyCalModel(_predict, "scoring_sheet")
    m.sheet = sheet
    return m
