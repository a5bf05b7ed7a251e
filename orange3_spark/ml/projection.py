"""Projections beyond PCA: classical MDS and Fisher LDA.

Reference: ``Orange/projection/`` — ``MDS`` (wraps sklearn, driver-local on
a DistMatrix), ``LDA`` (``lda.py``, sklearn LinearDiscriminantAnalysis),
``CUR`` (``cur.py``).

Spark shape:
  * **MDS** — the reference is driver-local already; here the O(n²)
    distance frame is computed distributed, and only the scalar matrix is
    collected for the Torgerson eigensolve (bounded, like hierarchical).
  * **LDA** — the scatter matrices are k×k: ONE distributed aggregation
    pass (per-class counts, means, and second moments), eigensolve on the
    driver, and the projection is a row-local dot product — so LDA scales
    to any row count, unlike the reference.
  * **CUR** — column leverage scores from the (k×k) right singular vectors
    of the covariance eigendecomposition; column *selection* is a driver
    decision, the data is never transposed.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_MDS_POINTS = 20_000


def mds(df: DataFrame, id_col: str, cols: Sequence[str], *,
        n_components: int = 2, metric: str = "euclidean") -> DataFrame:
    """Classical (Torgerson) MDS: distributed pair distances → driver
    double-centering + eigensolve → ``(id, mds1..mdsd)``.

    Sign convention: each eigenvector's largest-|.|-component is made
    positive so the embedding is deterministic.
    """
    import numpy as np

    from orange3_spark.stats.distance import row_distances

    pairs = row_distances(df, id_col, cols, metric=metric)
    # guard with a distributed count BEFORE collect — the pair frame is
    # O(n²) rows, so a post-collect check cannot bound driver memory
    n_pairs = pairs.count()
    if n_pairs > MAX_MDS_POINTS * (MAX_MDS_POINTS - 1) // 2:
        raise ValueError(f"{n_pairs} pair rows exceeds the "
                         f"MAX_MDS_POINTS={MAX_MDS_POINTS} bound; sample first")
    rows = pairs.collect()
    ids = sorted({r[0] for r in rows} | {r[1] for r in rows})
    n = len(ids)
    if n > MAX_MDS_POINTS:
        raise ValueError(f"{n} points exceeds MAX_MDS_POINTS; sample first")
    pos = {v: i for i, v in enumerate(ids)}
    D2 = np.zeros((n, n))
    for r in rows:
        i, j = pos[r[0]], pos[r[1]]
        D2[i, j] = D2[j, i] = r[2] ** 2
    J = np.eye(n) - np.ones((n, n)) / n
    B = -0.5 * J @ D2 @ J
    w, v = np.linalg.eigh(B)
    order = np.argsort(w)[::-1][:n_components]
    coords = v[:, order] * np.sqrt(np.maximum(w[order], 0.0))
    for c in range(coords.shape[1]):
        if coords[np.argmax(np.abs(coords[:, c])), c] < 0:
            coords[:, c] = -coords[:, c]
    spark = df.sparkSession
    out = [(ids[i], *[float(x) for x in coords[i]]) for i in range(n)]
    schema = (f"{id_col} {df.schema[id_col].dataType.simpleString()}, "
              + ", ".join(f"mds{c + 1} double"
                          for c in range(coords.shape[1])))
    return spark.createDataFrame(out, schema)


def _class_moments(df: DataFrame, cols: Sequence[str], class_col: str):
    """Per-class n, means, and second moments in ONE aggregation pass."""
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    aggs += [F.avg(c).alias(f"m_{c}") for c in cols]
    aggs += [F.avg(F.col(a).cast("double") * F.col(b).cast("double"))
             .alias(f"e_{i}_{j}")
             for i, a in enumerate(cols) for j, b in enumerate(cols)
             if i <= j]
    return df.groupBy(class_col).agg(*aggs).collect()


def lda_fit(df: DataFrame, cols: Sequence[str], class_col: str, *,
            n_components: int = 2):
    """Fisher discriminant directions from one distributed moment pass.

    Returns ``(components, class_order)`` where components is a
    ``n_components × k`` list of projection vectors (deterministic sign:
    largest-|.| entry positive).
    """
    import numpy as np

    rows = _class_moments(df, cols, class_col)
    k = len(cols)
    N = sum(r["n"] for r in rows)
    mu = np.zeros(k)
    for r in rows:
        mu += r["n"] * np.array([r[f"m_{c}"] for c in cols])
    mu /= N
    Sw = np.zeros((k, k))
    Sb = np.zeros((k, k))
    for r in rows:
        m_c = np.array([r[f"m_{c}"] for c in cols])
        cov = np.zeros((k, k))
        for i in range(k):
            for j in range(i, k):
                cov[i, j] = cov[j, i] = r[f"e_{i}_{j}"] - m_c[i] * m_c[j]
        Sw += r["n"] * cov
        d = (m_c - mu)[:, None]
        Sb += r["n"] * (d @ d.T)
    # symmetric generalized eigenproblem via pinv — k×k, driver-trivial
    w, v = np.linalg.eig(np.linalg.pinv(Sw) @ Sb)
    order = np.argsort(-np.real(w))[:n_components]
    comps = np.real(v[:, order]).T
    for c in range(comps.shape[0]):
        if comps[c, np.argmax(np.abs(comps[c]))] < 0:
            comps[c] = -comps[c]
    classes = sorted(r[class_col] for r in rows)
    return comps.tolist(), classes


def lda_transform(df: DataFrame, cols: Sequence[str], components,
                  *, prefix: str = "lda") -> DataFrame:
    """Project rows onto the discriminant directions — row-local dot
    products, pure codegen."""
    out = df
    for c, vec in enumerate(components):
        expr = sum((F.col(col).cast("double") * F.lit(float(vi))
                    for col, vi in zip(cols[1:], vec[1:])),
                   F.col(cols[0]).cast("double") * F.lit(float(vec[0])))
        out = out.withColumn(f"{prefix}{c + 1}", expr)
    return out


def cur_column_leverage(df: DataFrame, cols: Sequence[str], *,
                        rank: int = 2) -> list[tuple[str, float]]:
    """CUR column leverage scores (reference ``projection/cur.py``): the
    top-``rank`` right singular vectors of the RAW data matrix give each
    column's leverage ``(1/r)·Σ v_ij²``.  Right singular vectors are the
    eigenvectors of the k×k UNCENTERED second-moment matrix ``E[ab]``
    (matching the reference's ``sla.svds(X, rank)`` on the raw matrix — no
    mean subtraction), so one aggregation pass + a driver eigensolve
    suffice: no transpose, no row-space work."""
    import numpy as np

    aggs = [F.avg(F.col(a).cast("double") * F.col(b).cast("double"))
            .alias(f"e_{i}_{j}")
            for i, a in enumerate(cols) for j, b in enumerate(cols) if i <= j]
    r = df.agg(*aggs).first()
    k = len(cols)
    mom = np.zeros((k, k))
    for i in range(k):
        for j in range(i, k):
            mom[i, j] = mom[j, i] = r[f"e_{i}_{j}"]
    w, v = np.linalg.eigh(mom)
    top = v[:, np.argsort(w)[::-1][:rank]]
    lev = (top ** 2).sum(axis=1) / rank
    return sorted(zip(cols, lev.tolist()), key=lambda t: -t[1])


def fisher_criterion(df: DataFrame, cols: Sequence[str],
                     class_col: str) -> float:
    """Fisher criterion ``J(w) = (wᵀΔμ)² / (wᵀ S_w w)`` of the top LDA
    direction for a BINARY class — at the optimum this equals
    ``Δμᵀ S_w⁻¹ Δμ``, a closed form an SQL oracle can reproduce with a k×k
    inverse.  ``J`` is invariant to the eigensolver's scale/sign, and
    stationarity at the optimum makes it second-order-insensitive to
    eigenvector error — the right projection of LDA to verify exactly."""
    import numpy as np

    rows = _class_moments(df, cols, class_col)
    if len(rows) != 2:
        raise ValueError("fisher_criterion needs a binary class")
    rows = sorted(rows, key=lambda r: r[class_col])
    k = len(cols)
    Sw = np.zeros((k, k))
    mus = []
    for r in rows:
        m_c = np.array([r[f"m_{c}"] for c in cols])
        mus.append(m_c)
        cov = np.zeros((k, k))
        for i in range(k):
            for j in range(i, k):
                cov[i, j] = cov[j, i] = r[f"e_{i}_{j}"] - m_c[i] * m_c[j]
        Sw += r["n"] * cov
    dmu = mus[1] - mus[0]
    w = np.linalg.pinv(Sw) @ dmu          # the top Fisher direction
    num = float(w @ dmu) ** 2
    den = float(w @ Sw @ w)
    return num / den if den else 0.0
