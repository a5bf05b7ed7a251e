"""Clustering + projection: KMeans / BisectingKMeans / PCA on MLlib.

Reference: ``Orange/clustering/kmeans.py`` (sklearn KMeans wrap),
``Orange/projection/pca.py``.  Hierarchical/t-SNE/MDS are driver-local in
the reference too (SURVEY §7 risk register) — they stay out of scope here;
DBSCAN's density join is a future extension.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from orange3_spark.ml.learners import assemble_features


def kmeans(df: DataFrame, features: Sequence[str] = (), *,
           k: int = 8, array_col: Optional[str] = None, seed: int = 42,
           max_iter: int = 40) -> DataFrame:
    """Cluster assignment column via MLlib KMeans (k-means|| init).
    Returns the input plus ``cluster``; model metrics via ``kmeans_fit``."""
    model, assembled = kmeans_fit(df, features, k=k, array_col=array_col,
                                  seed=seed, max_iter=max_iter)
    return model.transform(assembled).drop("features")


def kmeans_fit(df: DataFrame, features: Sequence[str] = (), *,
               k: int = 8, array_col: Optional[str] = None, seed: int = 42,
               max_iter: int = 40):
    from pyspark.ml.clustering import KMeans as MKMeans

    assembled = assemble_features(df, features, array_col=array_col)
    model = MKMeans(k=k, seed=seed, maxIter=max_iter,
                    featuresCol="features",
                    predictionCol="cluster").fit(assembled)
    return model, assembled


def bisecting_kmeans(df: DataFrame, features: Sequence[str] = (), *,
                     k: int = 8, array_col: Optional[str] = None,
                     seed: int = 42) -> DataFrame:
    from pyspark.ml.clustering import BisectingKMeans as BKM

    assembled = assemble_features(df, features, array_col=array_col)
    model = BKM(k=k, seed=seed, featuresCol="features",
                predictionCol="cluster").fit(assembled)
    return model.transform(assembled).drop("features")


def silhouette(clustered: DataFrame, features: Sequence[str] = (), *,
               array_col: Optional[str] = None,
               cluster_col: str = "cluster") -> float:
    """Mean silhouette (squared-euclidean) — MLlib's ClusteringEvaluator;
    the reference scans k by silhouette the same way (owkmeans)."""
    from pyspark.ml.evaluation import ClusteringEvaluator

    assembled = assemble_features(clustered, features, array_col=array_col)
    return float(ClusteringEvaluator(
        featuresCol="features", predictionCol=cluster_col,
        metricName="silhouette").evaluate(assembled))


def pca(df: DataFrame, features: Sequence[str] = (), *,
        n_components: int = 2, array_col: Optional[str] = None,
        prefix: str = "PC") -> tuple[DataFrame, list[float]]:
    """Principal components + explained-variance ratios
    (``Orange/projection/pca.py``; MLlib computes the covariance SVD
    distributed, components come back as a small local matrix)."""
    from pyspark.ml.feature import PCA as MPCA
    from pyspark.ml.functions import vector_to_array

    assembled = assemble_features(df, features, array_col=array_col)
    model = MPCA(k=n_components, inputCol="features", outputCol="_pc") \
        .fit(assembled)
    arr = vector_to_array(F.col("_pc"))
    out = model.transform(assembled).select(
        *df.columns,
        *[arr.getItem(i).alias(f"{prefix}{i + 1}") for i in range(n_components)])
    return out, [float(v) for v in model.explainedVariance]
