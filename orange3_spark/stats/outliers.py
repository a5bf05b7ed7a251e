"""Outlier detection (``Orange/classification/outlier_detection.py``,
widget ``owoutliers.py``).

The reference wraps sklearn's One-class SVM / elliptic envelope / LOF /
Isolation Forest — all driver-local.  The distributed equivalents here:

  * IQR / z-score rules — exact, one aggregation pass + row-local predicate
    (the boxplot whisker rule; oracle-checkable);
  * Mahalanobis distance to the mean (elliptic-envelope's core statistic) —
    one covariance pass + row-local quadratic form;
  * kNN distance score (LOF's core statistic) — broadcast+BLAS like
    similarity.neardup_cosine_matmul, bounded; LSH-bucket it beyond that.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from orange3_spark.stats.distance import inverse_covariance


def iqr_outliers(df: DataFrame, col: str, *, k: float = 1.5,
                 flag_col: str = "is_outlier") -> DataFrame:
    """Tukey fences: outside [q1 − k·IQR, q3 + k·IQR] (exact quantiles)."""
    q1, q3 = df.agg(F.percentile(col, F.lit(0.25)),
                    F.percentile(col, F.lit(0.75))).first()
    lo, hi = q1 - k * (q3 - q1), q3 + k * (q3 - q1)
    return df.withColumn(flag_col,
                         (F.col(col) < F.lit(lo)) | (F.col(col) > F.lit(hi)))


def zscore_outliers(df: DataFrame, cols: Sequence[str], *, z: float = 3.0,
                    flag_col: str = "is_outlier") -> DataFrame:
    """|x − µ| > z·σ in ANY of the given columns."""
    stats = df.agg(*[F.avg(c).alias(f"m_{c}") for c in cols],
                   *[F.stddev_samp(c).alias(f"s_{c}") for c in cols]).first()
    pred = F.lit(False)
    for c in cols:
        s = stats[f"s_{c}"] or float("inf")
        pred = pred | (F.abs(F.col(c) - F.lit(stats[f"m_{c}"])) > F.lit(z * s))
    return df.withColumn(flag_col, pred)


def mahalanobis_score(df: DataFrame, cols: Sequence[str], *,
                      score_col: str = "maha") -> DataFrame:
    """Mahalanobis distance to the column means — the elliptic-envelope
    statistic, as a row-local quadratic form with broadcast constants."""
    means = df.agg(*[F.avg(c).alias(c) for c in cols]).first()
    inv = inverse_covariance(df, cols)
    diffs = [F.col(c).cast("double") - F.lit(float(means[c])) for c in cols]
    q = F.lit(0.0)
    for i in range(len(cols)):
        for j in range(len(cols)):
            if inv[i][j]:
                q = q + diffs[i] * diffs[j] * F.lit(float(inv[i][j]))
    return df.withColumn(score_col, F.sqrt(q))


def lof(df: DataFrame, id_col: str, cols: Sequence[str], *, k: int = 5,
        score_col: str = "lof") -> DataFrame:
    """Local Outlier Factor (Breunig et al. 2000; the reference wraps
    sklearn's LocalOutlierFactor, outlier_detection.py) as relational ops:

      1. kNN pair frame — self-join + per-point ``row_number`` window,
         deterministic tiebreak on (dist, neighbor id);
      2. k-distance — ``max`` over each point's kNN set;
      3. reachability — ``greatest(k-distance(o), d(p,o))`` via one join;
      4. lrd — grouped ``1/avg``;  5. LOF — ``avg(lrd(o))/lrd(p)``.

    Exact (hence DuckDB-oracle-checkable).  The O(n²) pair join is the
    correctness regime — at scale feed an LSH-bucketed candidate frame
    instead of the full cross pairs (similarity.lsh_bucket_knn pattern)."""
    from pyspark.sql import Window

    a = df.select(F.col(id_col).alias("pid"),
                  *[F.col(c).cast("double").alias(f"a_{c}") for c in cols])
    b = df.select(F.col(id_col).alias("oid"),
                  *[F.col(c).cast("double").alias(f"b_{c}") for c in cols])
    dist = sum(((F.col(f"a_{c}") - F.col(f"b_{c}"))
                * (F.col(f"a_{c}") - F.col(f"b_{c}")) for c in cols[1:]),
               (F.col(f"a_{cols[0]}") - F.col(f"b_{cols[0]}"))
               * (F.col(f"a_{cols[0]}") - F.col(f"b_{cols[0]}")))
    pairs = (a.join(b, F.col("pid") != F.col("oid"))
              .select("pid", "oid", F.sqrt(dist).alias("dist")))
    w = Window.partitionBy("pid").orderBy("dist", "oid")
    knn = (pairs.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= k).drop("rn"))
    kdist = knn.groupBy("pid").agg(F.max("dist").alias("kd"))
    reach = (knn.join(kdist.withColumnRenamed("pid", "oid"), "oid")
                .select("pid", "oid", F.greatest("kd", "dist").alias("rd")))
    lrd = reach.groupBy("pid").agg((F.lit(1.0) / F.avg("rd")).alias("lrd"))
    lrd_o = lrd.select(F.col("pid").alias("oid"), F.col("lrd").alias("lrd_o"))
    return (knn.join(lrd_o, "oid").join(lrd, "pid")
               .groupBy("pid")
               .agg((F.avg("lrd_o") / F.first("lrd")).alias(score_col))
               .select(F.col("pid").alias(id_col), score_col))


def knn_distance_score(df: DataFrame, id_col: str, cols: Sequence[str] = (),
                       *, array_col: Optional[str] = None, k: int = 5,
                       score_col: str = "knn_dist",
                       max_broadcast_cells: int = 50_000_000,
                       lsh_planes: int = 12, lsh_seed: int = 42) -> DataFrame:
    """Mean distance to the k nearest neighbors (LOF's core signal):
    broadcast matrix + per-partition BLAS, bounded.  Past the broadcast
    bound it switches AUTOMATICALLY to the LSH-bucket join (shuffle on
    sign-signature buckets, per-id top-k window — approximate, recall
    rises as ``lsh_planes`` falls) instead of erroring: at 100 TB the
    old ValueError WAS the user experience."""
    import numpy as np
    from pyspark.sql import types as T

    feat = list(cols)
    p = (len(feat) if array_col is None
         else len(df.select(array_col).first()[0]))
    n_rows = df.count()
    if n_rows * p > max_broadcast_cells:
        from orange3_spark.ml.learners import _knn_lsh_join

        # exclude self-matches: k+1 candidates, drop dist to itself
        pair_fn = _knn_lsh_join(df, feat, array_col, k + 1,
                                lsh_planes, lsh_seed)
        knn = pair_fn(df.select(id_col,
                                *([array_col] if array_col else feat)),
                      id_col)
        # rn=1 is the self pair (dist 0 sorts first; an exact duplicate
        # tied at 0 stays a legitimate neighbor at rn≥2)
        scored = (knn.filter(F.col("_rn") >= 2)
                  .groupBy(id_col)
                  .agg(F.avg("_dist").alias(score_col)))
        # a row alone in its sign-signature bucket has no candidates at
        # all — keep it with a NULL score (every input id must come back,
        # like the broadcast path) rather than silently shrinking the
        # population; callers treat NULL as "no neighbor evidence"
        return (df.select(id_col).join(scored, id_col, "left"))

    if array_col is not None:
        rows = df.select(id_col, array_col).collect()
        mat = np.array([r[1] for r in rows], dtype=np.float64)
    else:
        rows = df.select(id_col, *feat).collect()
        mat = np.array([r[1:] for r in rows], dtype=np.float64)
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    sc = df.sparkSession.sparkContext
    b_ids, b_mat = sc.broadcast(ids), sc.broadcast(mat)

    def run(pdf_iter):
        import pandas as pd
        X = b_mat.value
        for pdf in pdf_iter:
            if array_col is not None:
                q = np.array(list(pdf[array_col]), dtype=np.float64)
            else:
                q = pdf[feat].to_numpy(dtype=np.float64)
            qid = pdf[id_col].to_numpy(dtype=np.int64)
            d2 = ((q ** 2).sum(1)[:, None] - 2 * q @ X.T
                  + (X ** 2).sum(1)[None, :])
            d2[qid[:, None] == b_ids.value[None, :]] = np.inf  # self
            d2.sort(axis=1)
            score = np.sqrt(np.maximum(d2[:, :k], 0)).mean(axis=1)
            out = pdf[[id_col]].copy()
            out[score_col] = score
            yield out

    schema = T.StructType([df.schema[id_col],
                           T.StructField(score_col, T.DoubleType())])
    return df.select(id_col, *(feat or [array_col])) \
             .mapInPandas(run, schema=schema)
