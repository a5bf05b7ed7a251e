"""Curve fitting: nonlinear least squares as distributed aggregations.

Reference: ``Orange/regression/curvefit.py`` (CurveFitLearner) fits a
user-supplied parametric function with ``scipy.optimize.curve_fit``
(Levenberg-Marquardt on in-memory arrays).  Spark-first reformulation:
each LM iteration needs only ``J'J`` (p×p), ``J'r`` (p) and the SSE —
all map-side-combinable sums of codegen column expressions, so one
iteration costs one scan of the table (plus one scan per rejected damping
trial) no matter the row count.  The parameter update (a p×p solve) runs
on the driver.  The Jacobian comes from central differences of the model
expression at shifted parameter *literals* — for models linear in a
parameter this is exact, so e.g. polynomial fits converge in a single
Gauss-Newton step to the normal-equation optimum (which is what makes the
registered query oracle-checkable in closed form).

The model is either
- a callable ``fn(params, df) -> Column`` where ``params`` is the list of
  current parameter values (floats; embed with ``F.lit``), or
- an expression string in the Feature-Constructor sandbox grammar
  (``functions/feature_constructor.py``), e.g. ``"a * exp(b * x) + c"``,
  with ``param_names`` naming the free parameters — the same surface the
  reference exposes (CurveFitLearner's ``expression`` argument).
"""

from __future__ import annotations

import ast
import copy
from typing import Callable, Optional, Sequence, Union

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from orange3_spark.functions.feature_constructor import (
    _emit, sanitized_name, validate_expression)
from orange3_spark.ml.learners import Model

__all__ = ["expression_model", "curve_fit", "curve_fit_learner"]


class _SubstParams(ast.NodeTransformer):
    def __init__(self, values: dict):
        self.values = values

    def visit_Name(self, node: ast.Name):
        if node.id in self.values:
            return ast.copy_location(
                ast.Constant(value=float(self.values[node.id])), node)
        return node


def expression_model(source: str, param_names: Sequence[str]
                     ) -> Callable[[Sequence[float], DataFrame], Column]:
    """Compile a sandboxed expression into a model callable: parameter
    names become literals (constant-folded by Catalyst), every other
    identifier binds to a column of the evaluated DataFrame."""
    tree = validate_expression(source)
    names = list(param_names)

    def fn(params: Sequence[float], df: DataFrame) -> Column:
        t = _SubstParams(dict(zip(names, params))).visit(copy.deepcopy(tree))
        bind = {sanitized_name(c): c for c in df.columns}
        return _emit(t.body, bind)

    return fn


def curve_fit(df: DataFrame, model, target_col: str,
              p0: Sequence[float], *,
              param_names: Optional[Sequence[str]] = None,
              max_iter: int = 30, tol: float = 1e-12,
              lm_tries: int = 6):
    """Levenberg-Marquardt over distributed sums.  Returns
    ``(params, info)`` with ``info = {sse, n_iter, converged, n}``."""
    if isinstance(model, str):
        if param_names is None:
            raise ValueError("param_names required for a string model")
        model = expression_model(model, param_names)
    p = np.array([float(v) for v in p0])
    k = len(p)
    y = F.col(target_col).cast("double")
    clean = df.na.drop(subset=[target_col])

    def _sse(params) -> float:
        r = y - model(list(params), clean)
        return clean.agg(F.sum(r * r)).first()[0]

    def _moments(params):
        """One scan: J'J, J'r, SSE at ``params`` via central differences."""
        h = 3e-6 * np.maximum(np.abs(params), 1.0)
        f0 = model(list(params), clean)
        jac = []
        for i in range(k):
            up, dn = params.copy(), params.copy()
            up[i] += h[i]
            dn[i] -= h[i]
            jac.append((model(list(up), clean) - model(list(dn), clean))
                       / F.lit(2.0 * h[i]))
        r = y - f0
        aggs = [F.sum(r * r).alias("sse"), F.count(F.lit(1)).alias("n")]
        for i in range(k):
            for j in range(i, k):
                aggs.append(F.sum(jac[i] * jac[j]).alias(f"jj_{i}_{j}"))
            aggs.append(F.sum(jac[i] * r).alias(f"jr_{i}"))
        row = clean.agg(*aggs).first()
        jtj = np.zeros((k, k))
        jtr = np.zeros(k)
        for i in range(k):
            for j in range(i, k):
                jtj[i, j] = jtj[j, i] = row[f"jj_{i}_{j}"]
            jtr[i] = row[f"jr_{i}"]
        return jtj, jtr, row["sse"], row["n"]

    lam = 0.0  # pure Gauss-Newton fast path; damping kicks in on rejection
    converged = False
    sse = np.inf
    n = 0
    it = 0
    for it in range(1, max_iter + 1):
        jtj, jtr, sse, n = _moments(p)
        if sse is None or not n:
            raise ValueError(
                "curve_fit: no rows with non-NULL features/target — "
                "nothing to fit")
        accepted = False
        trial_lam = lam
        for _ in range(lm_tries):
            try:
                damp = trial_lam * np.diag(np.maximum(np.diag(jtj), 1e-12))
                delta = np.linalg.solve(jtj + damp, jtr)
            except np.linalg.LinAlgError:
                trial_lam = max(trial_lam * 10, 1e-3)
                continue
            new_sse = _sse(p + delta)
            if new_sse is not None and new_sse <= sse * (1 + 1e-15):
                p = p + delta
                lam = trial_lam / 10 if trial_lam > 1e-7 else 0.0
                accepted = True
                break
            trial_lam = max(trial_lam * 10, 1e-3)
        if not accepted:
            converged = True  # no direction improves: local optimum
            break
        step = np.max(np.abs(delta) / (np.abs(p) + 1.0))
        if step < 1e-10 or (sse > 0 and abs(sse - new_sse) <= tol * sse):
            sse = new_sse
            converged = True
            break
        sse = new_sse
    return ([float(v) for v in p],
            {"sse": float(sse), "n_iter": it, "converged": converged,
             "n": n})


def curve_fit_learner(df: DataFrame, model, target_col: str,
                      p0: Sequence[float], *,
                      param_names: Optional[Sequence[str]] = None,
                      **kw) -> Model:
    """Learner wrapper: prediction is the model expression at the fitted
    parameters — a pure codegen Column, no Python at inference time."""
    fn = (expression_model(model, param_names)
          if isinstance(model, str) else model)
    params, info = curve_fit(df, fn, target_col, p0,
                             param_names=param_names, **kw)

    def _predict(d: DataFrame) -> DataFrame:
        return d.withColumn("prediction", fn(params, d))

    m = Model(_predict, "curve_fit")
    m.parameters, m.info = params, info
    return m
