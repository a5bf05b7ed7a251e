"""Distance matrices: Orange's ``Distance`` surface on DataFrames.

Reference: ``Orange/distance/distance.py`` — Euclidean ``:198``, Manhattan
``:342``, Cosine ``:394``, Jaccard ``:559``, Mahalanobis ``:807``, Hamming
``:869``; distances run over rows OR columns, with a fit/transform split
that can normalize continuous features first (``FittedDistance``).

Spark shape:
  * ROW distances — long-form ``(id_a, id_b, dist)`` via self-join on
    ``id_a < id_b``; per-pair arithmetic is plain column expressions over
    the k named feature columns (k is small and fixed — no data-sized
    arrays, so everything stays in codegen).  The O(n²) join is the
    correctness regime; at scale block with LSH (similarity.knn) first.
  * COLUMN distances — ONE aggregation pass: every pairwise column distance
    is a sum-expression (k(k−1)/2 aggregates), no transpose needed.
  * Mahalanobis — inverse covariance estimated once (driver, k×k) and
    folded into the pair expression as literals.
"""

from __future__ import annotations

from itertools import combinations
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _standardize(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    stats = df.agg(*[F.avg(c).alias(f"mu_{c}") for c in cols],
                   *[F.stddev_pop(c).alias(f"sd_{c}") for c in cols]).first()
    out = df
    for c in cols:
        sd = stats[f"sd_{c}"] or 1.0
        out = out.withColumn(c, (F.col(c) - F.lit(stats[f"mu_{c}"]))
                             / F.lit(sd if sd else 1.0))
    return out


def _row_pearson(a_cols: Sequence[Column], b_cols: Sequence[Column]) -> Column:
    """Pearson rho between two fixed-k vectors as a closed-form expression
    (reference `_corrcoef2`, distance.py:703-721) — stays in codegen."""
    k = len(a_cols)
    sa = sum(a_cols[1:], a_cols[0])
    sb = sum(b_cols[1:], b_cols[0])
    sab = sum((a * b for a, b in zip(a_cols[1:], b_cols[1:])),
              a_cols[0] * b_cols[0])
    saa = sum((a * a for a in a_cols[1:]), a_cols[0] * a_cols[0])
    sbb = sum((b * b for b in b_cols[1:]), b_cols[0] * b_cols[0])
    num = F.lit(float(k)) * sab - sa * sb
    den = F.sqrt(F.lit(float(k)) * saa - sa * sa) \
        * F.sqrt(F.lit(float(k)) * sbb - sb * sb)
    return F.try_divide(num, den)


def _row_avg_ranks(cols: Sequence[Column]) -> list[Column]:
    """Average-tie ranks of a fixed-k row vector (scipy ``rankdata`` default,
    used by the reference's SpearmanR, distance.py:609-620): for element i,
    rank = (#less) + (#equal, incl. self + 1)/2 — O(k^2) comparisons, all
    row-local expressions."""
    ranks = []
    for i, ci in enumerate(cols):
        others = [cj for j, cj in enumerate(cols) if j != i]
        less = sum(((cj < ci).cast("double") for cj in others), F.lit(0.0))
        equal = sum(((cj == ci).cast("double") for cj in others), F.lit(1.0))
        ranks.append(less + (equal + F.lit(1.0)) / F.lit(2.0))
    return ranks


def _corr_to_dist(rho: Column, absolute: bool) -> Column:
    # reference CorrelationDistanceModel.compute_distances (distance.py:592-603)
    if absolute:
        return F.lit(1.0) - F.abs(rho)
    return F.lit(0.5) - rho / F.lit(2.0)


def _pair_frame(df: DataFrame, id_col: str, cols: Sequence[str]):
    a = df.select(F.col(id_col).alias("id_a"),
                  *[F.col(c).cast("double").alias(f"a_{c}") for c in cols])
    b = df.select(F.col(id_col).alias("id_b"),
                  *[F.col(c).cast("double").alias(f"b_{c}") for c in cols])
    return a.join(b, F.col("id_a") < F.col("id_b"))


def row_distances(df: DataFrame, id_col: str, cols: Sequence[str], *,
                  metric: str = "euclidean", normalize: bool = False,
                  inv_cov=None) -> DataFrame:
    """Long-form pairwise row distances ``(id_a, id_b, dist)``."""
    if normalize:
        df = _standardize(df, cols)
    pairs = _pair_frame(df, id_col, cols)
    diffs = [F.col(f"a_{c}") - F.col(f"b_{c}") for c in cols]
    if metric == "euclidean":
        expr = F.sqrt(sum((d * d for d in diffs), F.lit(0.0)))
    elif metric == "manhattan":
        expr = sum((F.abs(d) for d in diffs), F.lit(0.0))
    elif metric == "cosine":
        dot = sum((F.col(f"a_{c}") * F.col(f"b_{c}") for c in cols), F.lit(0.0))
        na = F.sqrt(sum((F.col(f"a_{c}") ** 2 for c in cols), F.lit(0.0)))
        nb = F.sqrt(sum((F.col(f"b_{c}") ** 2 for c in cols), F.lit(0.0)))
        # Orange's Cosine is a DISTANCE: 1 − similarity (distance.py:394)
        expr = F.lit(1.0) - F.try_divide(dot, na * nb)
    elif metric == "jaccard":
        # binary Jaccard distance over nonzero indicators (distance.py:559)
        inter = sum(((F.col(f"a_{c}") != 0) & (F.col(f"b_{c}") != 0)).cast("double")
                    for c in cols)
        union = sum(((F.col(f"a_{c}") != 0) | (F.col(f"b_{c}") != 0)).cast("double")
                    for c in cols)
        expr = F.lit(1.0) - F.try_divide(inter, union)
    elif metric == "hamming":
        expr = sum((F.col(f"a_{c}") != F.col(f"b_{c}")).cast("double")
                   for c in cols)
    elif metric in ("pearson", "pearson_absolute"):
        rho = _row_pearson([F.col(f"a_{c}") for c in cols],
                           [F.col(f"b_{c}") for c in cols])
        expr = _corr_to_dist(rho, metric.endswith("absolute"))
    elif metric in ("spearman", "spearman_absolute"):
        rho = _row_pearson(_row_avg_ranks([F.col(f"a_{c}") for c in cols]),
                           _row_avg_ranks([F.col(f"b_{c}") for c in cols]))
        expr = _corr_to_dist(rho, metric.endswith("absolute"))
    elif metric == "bhattacharyya":
        # rows as probability distributions: -ln Σ√(p·q), clipped at 0
        # (reference _bhattacharyya, distance.py:776-784);
        # Σ√(aᵢ/Σa · bᵢ/Σb) = Σ√(aᵢbᵢ) / √(Σa·Σb) — single row-local form
        sa = sum((F.col(f"a_{c}") for c in cols), F.lit(0.0))
        sb = sum((F.col(f"b_{c}") for c in cols), F.lit(0.0))
        s = sum((F.sqrt(F.col(f"a_{c}") * F.col(f"b_{c}")) for c in cols),
                F.lit(0.0))
        expr = F.greatest(F.lit(0.0), -F.log(F.try_divide(s, F.sqrt(sa * sb))))
    elif metric == "mahalanobis":
        if inv_cov is None:
            inv_cov = inverse_covariance(df, cols)
        k = len(cols)
        q = F.lit(0.0)
        for i in range(k):
            for j in range(k):
                if inv_cov[i][j]:
                    q = q + diffs[i] * diffs[j] * F.lit(float(inv_cov[i][j]))
        expr = F.sqrt(q)
    else:
        raise ValueError(metric)
    return pairs.select("id_a", "id_b", expr.alias("dist"))


def inverse_covariance(df: DataFrame, cols: Sequence[str]) -> list[list[float]]:
    """k×k covariance from one agg pass, inverted on the driver
    (SURVEY §2.11: Mahalanobis = driver-side inverse covariance broadcast)."""
    import numpy as np

    aggs = [F.avg(F.col(a) * F.col(b)).alias(f"e_{i}_{j}")
            for i, a in enumerate(cols) for j, b in enumerate(cols) if i <= j]
    aggs += [F.avg(c).alias(f"m_{c}") for c in cols]
    r = df.agg(*aggs).first()
    k = len(cols)
    cov = np.zeros((k, k))
    for i in range(k):
        for j in range(i, k):
            v = r[f"e_{i}_{j}"] - r[f"m_{cols[i]}"] * r[f"m_{cols[j]}"]
            cov[i, j] = cov[j, i] = v
    return np.linalg.pinv(cov).tolist()


def column_distances(df: DataFrame, cols: Sequence[str], *,
                     metric: str = "euclidean") -> DataFrame:
    """Distances BETWEEN columns in one aggregation pass — no transpose:
    each pair's distance is a sum aggregate (the reference transposes the
    matrix; at 100 TB the transpose doesn't exist but the agg does)."""
    aggs = []
    for a, b in combinations(cols, 2):
        ca, cb = F.col(a).cast("double"), F.col(b).cast("double")
        if metric == "euclidean":
            e = F.sqrt(F.sum((ca - cb) * (ca - cb)))
        elif metric == "manhattan":
            e = F.sum(F.abs(ca - cb))
        elif metric == "cosine":
            e = F.lit(1.0) - F.try_divide(
                F.sum(ca * cb), F.sqrt(F.sum(ca * ca)) * F.sqrt(F.sum(cb * cb)))
        elif metric in ("pearson", "pearson_absolute"):
            e = _corr_to_dist(F.corr(ca, cb), metric.endswith("absolute"))
        elif metric == "bhattacharyya":
            e = F.greatest(F.lit(0.0), -F.log(F.try_divide(
                F.sum(F.sqrt(ca * cb)), F.sqrt(F.sum(ca) * F.sum(cb)))))
        else:
            raise ValueError(metric)
        aggs.append(e.alias(f"{a}|{b}"))
    row = df.agg(*aggs)
    pairs = F.array(*[
        F.struct(F.lit(c.split("|")[0]).alias("col_a"),
                 F.lit(c.split("|")[1]).alias("col_b"),
                 F.col(f"`{c}`").alias("dist")) for c in row.columns])
    return (row.select(F.explode(pairs).alias("p"))
               .select("p.col_a", "p.col_b", "p.dist"))


def spearman_column_distances(df: DataFrame, cols: Sequence[str], *,
                              absolute: bool = False) -> DataFrame:
    """SpearmanR distance between columns: replace each column with its
    average-tie rank (one window pass per column — `rank() + (ties-1)/2`,
    reference SpearmanModel distance.py:609-620), then Pearson on ranks.
    At scale the ranking is the classic distributed sort; the corr is one
    aggregation over all pairs."""
    from pyspark.sql import Window

    ranked = df
    for c in cols:
        # avg rank of value v = (#rows < v) + (#rows == v + 1)/2.  A global
        # rank() window would serialize to one partition; instead aggregate
        # per distinct value, cumulate over THAT frame, and join the
        # value→rank map back — no global sort of the data ever happens.
        # No broadcast hint: for near-unique continuous columns the rank map
        # is ~row-count rows, so let Catalyst (AQE) pick broadcast only when
        # the map really is small.
        counts = (df.groupBy(F.col(c).cast("double").alias("__v"))
                    .agg(F.count(F.lit(1)).cast("double").alias("__n")))
        w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, -1)
        rk = counts.select(
            "__v",
            (F.coalesce(F.sum("__n").over(w), F.lit(0.0))
             + (F.col("__n") + F.lit(1.0)) / F.lit(2.0)).alias(f"rk_{c}"))
        ranked = ranked.join(rk, ranked[c].cast("double") == rk["__v"]) \
                       .drop("__v", "__n")
    aggs = [_corr_to_dist(F.corr(f"rk_{a}", f"rk_{b}"), absolute)
            .alias(f"{a}|{b}") for a, b in combinations(cols, 2)]
    row = ranked.agg(*aggs)
    pairs = F.array(*[
        F.struct(F.lit(c.split("|")[0]).alias("col_a"),
                 F.lit(c.split("|")[1]).alias("col_b"),
                 F.col(f"`{c}`").alias("dist")) for c in row.columns])
    return (row.select(F.explode(pairs).alias("p"))
               .select("p.col_a", "p.col_b", "p.dist"))


def distance_transform(dist: DataFrame, *, dist_col: str = "dist",
                       normalize: bool = True,
                       invert: bool = False) -> DataFrame:
    """Distance Transformation widget
    (``Orange/widgets/unsupervised/owdistancetransformation.py``):
    normalize a long-form distance table to [0, 1] by its maximum
    and/or invert similarities (``max − d`` after normalization:
    ``1 − d``).  One max aggregate folded in lazily (broadcast scalar
    frame — no driver action), then a row-local map; the max of exact
    pair distances is order-independent, so the transform replays
    exactly."""
    mx = dist.agg(F.max(dist_col).alias("_mx"))
    out = dist.crossJoin(F.broadcast(mx))
    d = F.col(dist_col)
    if normalize:
        d = F.when(F.col("_mx") > 0, d / F.col("_mx")).otherwise(F.lit(0.0))
    if invert:
        top = F.lit(1.0) if normalize else F.col("_mx")
        d = top - d
    return out.withColumn(dist_col, d).drop("_mx")
