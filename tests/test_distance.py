"""Distance matrices + outlier detection."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from orange3_spark.stats import distance as D
from orange3_spark.stats import outliers as O


@pytest.fixture()
def pts(spark):
    return spark.createDataFrame(
        [(0, 0.0, 0.0), (1, 3.0, 4.0), (2, 0.0, 1.0)],
        "id long, x double, y double")


def _d(df):
    return {(r.id_a, r.id_b): r.dist for r in df.collect()}


def test_euclidean_manhattan(pts):
    e = _d(D.row_distances(pts, "id", ["x", "y"]))
    assert e[(0, 1)] == 5.0 and e[(0, 2)] == 1.0
    m = _d(D.row_distances(pts, "id", ["x", "y"], metric="manhattan"))
    assert m[(0, 1)] == 7.0 and m[(1, 2)] == 6.0


def test_cosine_is_distance(pts):
    c = _d(D.row_distances(pts, "id", ["x", "y"], metric="cosine"))
    # (3,4) vs (0,1): sim = 4/5 -> dist 0.2
    assert abs(c[(1, 2)] - 0.2) < 1e-12
    # zero vector: sim undefined -> NULL (missing), not an error
    assert c[(0, 1)] is None


def test_jaccard_hamming(spark):
    df = spark.createDataFrame(
        [(0, 1.0, 0.0, 1.0), (1, 1.0, 1.0, 0.0)], "id long, a double, b double, c double")
    j = _d(D.row_distances(df, "id", ["a", "b", "c"], metric="jaccard"))
    assert abs(j[(0, 1)] - (1 - 1 / 3)) < 1e-12
    h = _d(D.row_distances(df, "id", ["a", "b", "c"], metric="hamming"))
    assert h[(0, 1)] == 2.0


def test_mahalanobis_scale_invariance(spark):
    import numpy as np
    rng = np.random.default_rng(3)
    base = rng.normal(0, 1, (200, 2))
    rows = [(i, float(a), float(100 * b)) for i, (a, b) in enumerate(base)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    out = D.row_distances(df.limit(50), "id", ["x", "y"],
                          metric="mahalanobis",
                          inv_cov=D.inverse_covariance(df, ["x", "y"]))
    # mahalanobis whitens the 100× scale: distances comparable in both axes
    assert out.count() == 50 * 49 / 2
    assert out.agg(F.max("dist")).first()[0] < 10


def test_normalized_distances(pts):
    raw = _d(D.row_distances(pts, "id", ["x", "y"]))
    nrm = _d(D.row_distances(pts, "id", ["x", "y"], normalize=True))
    assert raw != nrm and len(nrm) == 3


def test_column_distances(pts):
    out = {(r.col_a, r.col_b): r.dist
           for r in D.column_distances(pts, ["x", "y"]).collect()}
    # columns x=(0,3,0), y=(0,4,1): dist = sqrt(1 + 1) = sqrt(2)
    assert abs(out[("x", "y")] - math.sqrt(2)) < 1e-12


def test_iqr_and_zscore_outliers(spark):
    rows = [(i, float(i % 10)) for i in range(100)] + [(100, 1000.0)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = O.iqr_outliers(df, "v").filter("is_outlier").collect()
    assert [r.id for r in got] == [100]
    gz = O.zscore_outliers(df, ["v"], z=3.0).filter("is_outlier").collect()
    assert [r.id for r in gz] == [100]


def test_mahalanobis_score_flags_planted(spark):
    import numpy as np
    rng = np.random.default_rng(5)
    rows = [(i, float(x), float(y))
            for i, (x, y) in enumerate(rng.normal(0, 1, (300, 2)))]
    rows.append((300, 8.0, -8.0))
    df = spark.createDataFrame(rows, "id long, x double, y double")
    top = (O.mahalanobis_score(df, ["x", "y"])
           .orderBy(F.col("maha").desc()).first())
    assert top.id == 300


def test_knn_distance_score(spark):
    rows = [(i, float(i % 5), float(i % 7)) for i in range(60)]
    rows.append((60, 50.0, 50.0))   # isolated point
    df = spark.createDataFrame(rows, "id long, x double, y double")
    out = O.knn_distance_score(df, "id", ["x", "y"], k=3)
    top = out.orderBy(F.col("knn_dist").desc()).first()
    assert top.id == 60
