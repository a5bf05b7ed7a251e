"""Partial Least Squares regression (PLS1) from distributed moments.

Reference: ``Orange/regression/pls.py`` wraps sklearn's NIPALS
``PLSRegression`` (center + unit-variance scale, deflation per component).
Spark-first reformulation: for a univariate target every NIPALS quantity is
a function of the k×k standardized Gram matrix ``A = Z'Z`` and the k-vector
``b = Z'zy`` (kernel PLS, Lindgren/Rännar/Wold style).  Those moments are
two map-side-combinable aggregations — the full fit costs **two scans of
the table regardless of component count**, and the per-component recursion
runs on k×k driver matrices:

    w_a = b / ||b||            (weights)
    tt  = w_a' A w_a           (score norm t't)
    p_a = A w_a / tt           (X loadings)
    q_a = b' w_a / tt          (y loading)
    A  <- A - tt * p_a p_a'    (X deflation in moment space)
    b  <- b - tt * q_a * p_a   (cross-moment deflation)

Final coefficients ``B = W (P'W)^-1 q`` reproduce sklearn's
``coef_`` exactly (same algebra, no iteration), so a 1-component fit has a
closed-form SQL oracle in terms of column correlations.

Prediction is a pure codegen column expression (no UDF): the standardized
coefficients are folded back into raw-space slope/intercept literals.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from orange3_spark.ml.learners import Model

__all__ = ["pls_fit", "pls_regression"]


def pls_fit(df: DataFrame, features: Sequence[str], target_col: str,
            n_components: int = 2, *, scale: bool = True):
    """Fit PLS1; returns ``(coef_raw, intercept, meta)`` where
    ``prediction = intercept + X @ coef_raw`` in raw feature units.

    ``meta`` carries the standardized weights/loadings (``W``, ``P``, ``q``)
    plus means/scales, mirroring the attributes the reference model exposes
    (``x_rotations_`` analogue) for its transform/score outputs.
    """
    feats = list(features)
    k = len(feats)
    if not 1 <= n_components <= k:
        raise ValueError(f"n_components must be in [1, {k}]")
    clean = df.na.drop(subset=[*feats, target_col])

    # pass 1: means + population SDs (population, matching stddev_pop oracles)
    stats = clean.agg(
        *[F.avg(F.col(c).cast("double")).alias(f"mu_{i}")
          for i, c in enumerate(feats)],
        *[F.stddev_pop(F.col(c).cast("double")).alias(f"sd_{i}")
          for i, c in enumerate(feats)],
        F.avg(F.col(target_col).cast("double")).alias("mu_y"),
        F.stddev_pop(F.col(target_col).cast("double")).alias("sd_y"),
        F.count(F.lit(1)).alias("n")).first()
    mu = np.array([stats[f"mu_{i}"] for i in range(k)])
    sd = np.array([stats[f"sd_{i}"] for i in range(k)])
    mu_y, sd_y, n = stats["mu_y"], stats["sd_y"], stats["n"]
    if not scale:
        sd = np.ones(k)
        sd_y = 1.0
    if any(s == 0 or s is None for s in sd) or not sd_y:
        raise ValueError("constant column; cannot scale")

    # pass 2: standardized Gram + cross moments (k(k+1)/2 + k sums, one scan)
    z = [((F.col(c).cast("double") - F.lit(float(mu[i]))) / F.lit(float(sd[i])))
         for i, c in enumerate(feats)]
    zy = (F.col(target_col).cast("double") - F.lit(float(mu_y))) / F.lit(float(sd_y))
    aggs = []
    for i in range(k):
        for j in range(i, k):
            aggs.append(F.sum(z[i] * z[j]).alias(f"a_{i}_{j}"))
        aggs.append(F.sum(z[i] * zy).alias(f"b_{i}"))
    row = clean.agg(*aggs).first()
    A = np.zeros((k, k))
    b = np.zeros(k)
    for i in range(k):
        for j in range(i, k):
            A[i, j] = A[j, i] = row[f"a_{i}_{j}"]
        b[i] = row[f"b_{i}"]

    W = np.zeros((k, n_components))
    P = np.zeros((k, n_components))
    q = np.zeros(n_components)
    for a in range(n_components):
        nb = np.linalg.norm(b)
        if nb == 0:  # y fully deflated: remaining components are null
            break
        w = b / nb
        tt = float(w @ A @ w)
        if tt <= 0:
            break
        p = A @ w / tt
        qa = float(b @ w) / tt
        W[:, a], P[:, a], q[a] = w, p, qa
        A = A - tt * np.outer(p, p)
        b = b - tt * qa * p

    beta_std = W @ np.linalg.solve(P.T @ W, q)          # standardized coefs
    coef_raw = beta_std * sd_y / sd                     # back to raw units
    intercept = float(mu_y - coef_raw @ mu)
    meta = {"W": W, "P": P, "q": q, "x_mean": mu, "x_std": sd,
            "y_mean": mu_y, "y_std": sd_y, "n": n, "beta_std": beta_std}
    return [float(c) for c in coef_raw], intercept, meta


def pls_regression(df: DataFrame, features: Sequence[str], target_col: str,
                   n_components: int = 2, *, scale: bool = True) -> Model:
    """Learner wrapper: fits :func:`pls_fit` and predicts with a single
    codegen linear expression (same surface as ``ols_learner``)."""
    feats = list(features)
    coef, intercept, meta = pls_fit(df, feats, target_col, n_components,
                                    scale=scale)

    def _predict(d: DataFrame) -> DataFrame:
        expr: Column = F.lit(intercept)
        for c, bcoef in zip(feats, coef):
            expr = expr + F.col(c).cast("double") * F.lit(bcoef)
        return d.withColumn("prediction", expr)

    m = Model(_predict, "pls")
    m.coefficients, m.intercept, m.meta = coef, intercept, meta
    return m
