"""Deterministic model persistence — JSON instead of pickle.

The reference saves models by pickling (``Orange/util.py``); this engine
deliberately has no pickle surface (unpickling hazard, README).  Its
deterministic learners don't need one: every fitted model is a small set
of exact constants (stumps, coefficients, integer-grid centroids), so a
model IS its JSON document — auditable, diffable, engine-portable, and
byte-identical across refits on the same data.

Covered: AdaBoost classifier/R2 stump ensembles, OLS coefficients, PQ
codebooks, k-means centroids.  MLlib-backed learners persist through
MLlib's own ``model.write().save(path)`` (distributed, cluster-native)
and are intentionally not duplicated here.
"""

from __future__ import annotations

import json
from typing import Any

from orange3_spark.ml.ensembles import AdaBoostModel, AdaBoostR2Model


def to_dict(model: Any) -> dict:
    """Model → plain-JSON dict with a ``type`` tag."""
    if isinstance(model, AdaBoostR2Model):
        return {"type": "adaboost_r2", "cols": list(model.cols),
                "stumps": [list(s) for s in model.stumps]}
    if isinstance(model, AdaBoostModel):
        return {"type": "adaboost", "cols": list(model.cols),
                "stumps": [list(s) for s in model.stumps]}
    if hasattr(model, "intercept") and hasattr(model, "coefficients"):
        return {"type": "linear", "intercept": float(model.intercept),
                "coefficients": [float(b) for b in model.coefficients],
                "features": list(getattr(model, "features", []))}
    raise TypeError(f"no JSON form for {type(model).__name__}; "
                    "MLlib models persist via model.write().save()")


def from_dict(doc: dict) -> Any:
    """JSON dict → model with a working ``predict``."""
    t = doc.get("type")
    if t == "adaboost_r2":
        return AdaBoostR2Model([tuple(s) for s in doc["stumps"]],
                               doc["cols"])
    if t == "adaboost":
        return AdaBoostModel([tuple(s) for s in doc["stumps"]],
                             doc["cols"])
    if t == "linear":
        from pyspark.sql import functions as F

        from orange3_spark.ml.learners import Model

        intercept = float(doc["intercept"])
        coefs = [float(b) for b in doc["coefficients"]]
        features = list(doc["features"])

        def _predict(d):
            expr = F.lit(intercept)
            for c, b in zip(features, coefs):
                expr = expr + F.col(c).cast("double") * F.lit(b)
            return d.withColumn("prediction", expr)

        m = Model(_predict, "linear")
        m.intercept, m.coefficients, m.features = intercept, coefs, features
        return m
    raise ValueError(f"unknown model type {t!r}")


def save_model(model: Any, path: str) -> None:
    with open(path, "w") as fh:
        json.dump(to_dict(model), fh, indent=1)


def load_model(path: str) -> Any:
    with open(path) as fh:
        return from_dict(json.load(fh))


def save_codebooks(centroids, path: str) -> None:
    """PQ codebooks / k-means centroids: integer-grid lists as-is."""
    with open(path, "w") as fh:
        json.dump(centroids, fh)


def load_codebooks(path: str):
    with open(path) as fh:
        return json.load(fh)
