"""Evaluation: cross-validation, train/test splits, scoring.

Reference: ``Orange/evaluation/testing.py`` (``CrossValidation :568``,
``TestOnTestData :712``, ``TestOnTrainingData :779``) and ``scoring.py``
(CA ``:156``, Precision/Recall/F1 ``:207-225``, AUC ``:226``, MCC ``:394``,
MSE/RMSE/MAE/MAPE/R2 ``:403-470``).

Folds are DETERMINISTIC content-hash assignments (same primitive as
operators.sample.sample_hash): fold membership is a pure function of the
row key, so results reproduce across runs, partitionings and engines —
Orange gets determinism from seeded numpy; hashing is the distributed
equivalent.  Scores are single aggregations over (label, prediction).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_fold(df: DataFrame, key: str, k: int, salt: str = "") -> DataFrame:
    """Deterministic fold 0..k-1 from md5 of the row key."""
    fold = F.conv(F.substring(
        F.md5(F.concat(F.col(key).cast("string"), F.lit(salt))), 1, 8),
        16, 10).cast("long") % k
    return df.withColumn("fold", fold.cast("int"))


def train_test_split(df: DataFrame, key: str, test_fraction: float = 0.25,
                     salt: str = "") -> tuple[DataFrame, DataFrame]:
    thr = format(int(test_fraction * 0xFFFFFFFF), "08x")
    h = F.substring(F.md5(F.concat(F.col(key).cast("string"), F.lit(salt))), 1, 8)
    return df.filter(h >= F.lit(thr)), df.filter(h < F.lit(thr))


def cross_validate(df: DataFrame, key: str, k: int,
                   fit: Callable[[DataFrame], object],
                   score: Callable[[DataFrame], float],
                   salt: str = "") -> list[float]:
    """k-fold CV: fit on k−1 folds, score predictions on the held-out fold.
    ``fit(train) -> Model``; ``score(predicted_test) -> float``."""
    folded = with_fold(df, key, k, salt).cache()
    out = []
    for i in range(k):
        train = folded.filter(F.col("fold") != i).drop("fold")
        test = folded.filter(F.col("fold") == i).drop("fold")
        model = fit(train)
        out.append(score(model.predict(test)))
    folded.unpersist()
    return out


# ------------------------------------------------------------------- scoring
# each is ONE aggregation over (label, prediction) — no driver-side loops

def _agg1(df, expr):
    return float(df.agg(expr).first()[0])


def ca(df: DataFrame, label: str = "label",
       pred: str = "prediction") -> float:
    """Classification accuracy (scoring.py:156)."""
    return _agg1(df, F.avg((F.col(label) == F.col(pred)).cast("double")))


def confusion_counts(df: DataFrame, positive, label: str = "label",
                     pred: str = "prediction") -> tuple[int, int, int, int]:
    r = df.agg(
        F.sum(((F.col(label) == positive) & (F.col(pred) == positive)).cast("long")).alias("tp"),
        F.sum(((F.col(label) != positive) & (F.col(pred) == positive)).cast("long")).alias("fp"),
        F.sum(((F.col(label) == positive) & (F.col(pred) != positive)).cast("long")).alias("fn"),
        F.sum(((F.col(label) != positive) & (F.col(pred) != positive)).cast("long")).alias("tn"),
    ).first()
    return int(r.tp), int(r.fp), int(r.fn), int(r.tn)


def precision_recall_f1(df: DataFrame, positive, label: str = "label",
                        pred: str = "prediction") -> tuple[float, float, float]:
    tp, fp, fn, _ = confusion_counts(df, positive, label, pred)
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return p, r, f1


def mcc(df: DataFrame, positive, label: str = "label",
        pred: str = "prediction") -> float:
    """Matthews correlation (scoring.py:394)."""
    import math
    tp, fp, fn, tn = confusion_counts(df, positive, label, pred)
    denom = math.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    return ((tp * tn - fp * fn) / denom) if denom else 0.0


def auc(df: DataFrame, label: str = "label",
        score_col: str = "score") -> float:
    """Binary AUC via the rank-sum (Mann-Whitney) identity — one sort-based
    window pass + one aggregate, no pairwise comparison.  Ties get average
    ranks (exactly scikit's roc_auc_score)."""
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col(score_col))
    wp = Window.partitionBy(F.col(score_col))
    ranked = df.select(
        F.col(label).cast("double").alias("y"),
        ((F.rank().over(w) - 1).cast("double")
         + (F.count(F.lit(1)).over(wp) + 1) / 2.0).alias("r"))
    agg = ranked.agg(
        F.sum(F.when(F.col("y") == 1.0, F.col("r"))).alias("rs"),
        F.sum(F.when(F.col("y") == 1.0, 1).otherwise(0)).alias("np"),
        F.count(F.lit(1)).alias("n")).first()
    n_pos, n_neg = agg.np, agg.n - agg.np
    if not n_pos or not n_neg:
        return float("nan")
    return (agg.rs - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)


def mse(df, label="label", pred="prediction"):
    return _agg1(df, F.avg(F.pow(F.col(label) - F.col(pred), 2)))


def rmse(df, label="label", pred="prediction"):
    import math
    return math.sqrt(mse(df, label, pred))


def mae(df, label="label", pred="prediction"):
    return _agg1(df, F.avg(F.abs(F.col(label) - F.col(pred))))


def mape(df, label="label", pred="prediction"):
    return _agg1(df, F.avg(F.abs((F.col(label) - F.col(pred)) / F.col(label))))


def r2(df, label="label", pred="prediction"):
    row = df.agg(
        F.sum(F.pow(F.col(label) - F.col(pred), 2)).alias("ss_res"),
        F.var_pop(label).alias("v"), F.count(F.lit(1)).alias("n")).first()
    return 1.0 - row.ss_res / (row.v * row.n) if row.v else float("nan")
