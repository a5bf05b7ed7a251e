"""Ensemble learners: stacking and AdaBoost.

Reference: ``Orange/ensembles/stack.py:18-40`` (StackedLearner — K-fold CV
produces base-model predictions as meta-features, an aggregate learner
fits over them) and ``Orange/ensembles/ada_boost.py`` (sklearn
AdaBoostClassifier wrap; sklearn's default estimator is a depth-1
decision stump, algorithm SAMME).  Tests:
``Orange/tests/test_stack.py``, ``Orange/tests/test_ada_boost.py``.

Spark-first shapes:

* ``stacked_ols`` — for linear bases + linear aggregate every fitted
  quantity is a sum, so the ENTIRE stack (per-fold base fits, meta-feature
  construction, aggregate fit, full-data base refits) reduces to TWO
  distributed moment scans (the ``cv_ols`` trick applied twice); meta
  features never materialize — they are Column expressions switched per
  fold.  The generic path costs k×B fits + a union; this costs two scans
  at any scale.
* ``stacked_learner`` — the generic K-fold shape for arbitrary base /
  aggregate learners (MLlib models included): per-fold predictions union
  into the meta-frame, exactly the reference's construction.
* ``ada_boost_classifier`` — SAMME boosting of depth-1 stumps.  The FIT
  runs on a bounded id-hash sample (same contract as
  ``ml/outlier_models.py``: sklearn in the reference is single-node
  anyway; the sample fit is the documented distributed compromise), with
  exact weighted-error threshold search.  PREDICT is a pure Column
  expression — Σ α_t·(±1 stump) is a fixed chain of CASE WHENs, whole-
  stage codegen, no Python — so the full-scale scoring pass is exactly
  mirrorable in SQL (``plans/oracle_replay.adaboost_oracle``).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from orange3_spark.ml.evaluation import with_fold
from orange3_spark.ml.learners import Model


# ------------------------------------------------------------------ stacking

def stacked_ols(df: DataFrame, key: str, base_features: Sequence[Sequence[str]],
                target: str, *, k: int = 3, salt: str = "") -> Model:
    """Stacked regression with OLS bases and an OLS aggregate in two scans.

    Scan 1 — per-(fold, base) moments: one ``groupBy(fold)`` aggregation
    collects z z' / z y moments for every base's feature set; complement
    moments (totals − fold) solve each base's fold model AND its full-data
    refit on the driver (exactly ``ml/evaluation.cv_ols``).

    Scan 2 — aggregate fit: each row's meta-feature vector
    ``z_b = Σ_i 1[fold=i]·(β_bi · x)`` is a Column expression (the base
    prediction from the model that did NOT see the row's fold — the
    reference's CV construction, stack.py:76-84), so the aggregate's
    normal-equation moments come from one more pass; no meta-frame is
    materialized, no union, no per-fold job.

    Returns a :class:`Model` whose ``predict`` appends ``prediction`` =
    aggregate(full-data base predictions); exposes ``base_models``
    (list of (intercept, coefs)) and ``meta`` ((intercept, weights)).
    """
    import numpy as np

    feats_all = sorted({c for fs in base_features for c in fs} | {target})
    folded = with_fold(df.na.drop(subset=feats_all), key, k, salt)

    # ---- scan 1: per-fold moments for every base ------------------------
    aggs = []
    y = F.col(target).cast("double")
    for b, feats in enumerate(base_features):
        z = [F.lit(1.0)] + [F.col(c).cast("double") for c in feats]
        for i in range(len(z)):
            for j in range(i, len(z)):
                aggs.append(F.sum(z[i] * z[j]).alias(f"m{b}_{i}_{j}"))
            aggs.append(F.sum(z[i] * y).alias(f"v{b}_{i}"))
    rows = {int(r["fold"]): r
            for r in folded.groupBy("fold").agg(*aggs).collect()}

    def _solve(b: int, fold: Optional[int]):
        p = len(base_features[b])
        M = np.zeros((p + 1, p + 1))
        v = np.zeros(p + 1)
        for r_fold, r in rows.items():
            if fold is not None and r_fold == fold:
                continue           # complement fit: leave this fold out
            for i in range(p + 1):
                for j in range(i, p + 1):
                    M[i, j] += r[f"m{b}_{i}_{j}"]
                    if i != j:
                        M[j, i] += r[f"m{b}_{i}_{j}"]
                v[i] += r[f"v{b}_{i}"]
        beta = np.linalg.solve(M, v)
        return float(beta[0]), [float(x) for x in beta[1:]]

    fold_models = {(b, f): _solve(b, f)
                   for b in range(len(base_features)) for f in rows}
    full_models = [_solve(b, None) for b in range(len(base_features))]

    def _base_expr(b: int, intercept: float, coefs) -> Column:
        e: Column = F.lit(intercept)
        for c, w in zip(base_features[b], coefs):
            e = e + F.col(c).cast("double") * F.lit(w)
        return e

    # ---- scan 2: aggregate OLS over expression meta-features ------------
    metas = []
    for b in range(len(base_features)):
        e = F.lit(None).cast("double")
        for f in sorted(rows):
            ib, cb = fold_models[(b, f)]
            e = F.when(F.col("fold") == f, _base_expr(b, ib, cb)).otherwise(e)
        metas.append(e)
    zm = [F.lit(1.0)] + metas
    maggs = []
    for i in range(len(zm)):
        for j in range(i, len(zm)):
            maggs.append(F.sum(zm[i] * zm[j]).alias(f"mm_{i}_{j}"))
        maggs.append(F.sum(zm[i] * y).alias(f"mv_{i}"))
    r = folded.agg(*maggs).first()
    B = len(base_features)
    M = np.zeros((B + 1, B + 1))
    v = np.zeros(B + 1)
    for i in range(B + 1):
        for j in range(i, B + 1):
            M[i, j] = M[j, i] = r[f"mm_{i}_{j}"]
        v[i] = r[f"mv_{i}"]
    wbeta = np.linalg.solve(M, v)
    meta_intercept, meta_w = float(wbeta[0]), [float(x) for x in wbeta[1:]]

    def _predict(d: DataFrame) -> DataFrame:
        e: Column = F.lit(meta_intercept)
        for b, (ib, cb) in enumerate(full_models):
            e = e + _base_expr(b, ib, cb) * F.lit(meta_w[b])
        return d.withColumn("prediction", e)

    m = Model(_predict, "stacked_ols")
    m.base_models = full_models
    m.fold_models = fold_models
    m.meta = (meta_intercept, meta_w)
    return m


def stacked_ols_quantized(df: DataFrame, key: str,
                          qx_cols: Sequence[str], qy_col: str, *,
                          k: int = 3, salt: str = ""):
    """Exact-arithmetic stacking of two single-feature OLS bases over
    PRE-QUANTIZED integer columns — the oracle-grade variant of
    :func:`stacked_ols`.

    Why this exists: the float version's meta system can be
    ill-conditioned (a weak base's meta-feature is nearly collinear with
    the intercept), so partition-order noise in double sums amplifies
    into the solved weights — measured 1e-6 relative drift vs the SQL
    oracle, far past the 9-significant-digit canon.  Here every
    distributed aggregation is an EXACT integer (Spark decimal(38,0) /
    DuckDB HUGEINT — identical under any partitioning), each integer is
    converted to double once (correctly rounded, identical everywhere),
    and all driver-side float math mirrors the oracle's SQL expression
    trees operation for operation — so even an ill-conditioned solve is
    bit-identical, because both engines feed identical doubles through
    identical IEEE op sequences.

    Returns ``(fold_betas, full_betas, meta, predict_expr)`` with betas
    as (intercept, slope) in quantized units, ``meta = (mi, w0, w1)``
    from the mirrored 3×3 Cramer solve, and ``predict_expr`` the Column
    for the stacked prediction (quantized-y units).
    """
    if len(qx_cols) != 2:
        raise ValueError("stacked_ols_quantized mirrors a fixed 3x3 "
                         "Cramer solve — exactly two bases")
    folded = with_fold(df, key, k, salt)
    dec = "decimal(38,0)"
    qy = F.col(qy_col).cast("long")
    aggs = [F.count(F.lit(1)).alias("n"),
            F.sum(qy.cast(dec)).alias("sy")]
    for b, c in enumerate(qx_cols):
        qx = F.col(c).cast("long")
        aggs += [F.sum(qx.cast(dec)).alias(f"s{b}"),
                 F.sum((qx * qx).cast(dec)).alias(f"s{b}{b}"),
                 F.sum((qx * qy).cast(dec)).alias(f"s{b}y")]
    rows = {int(r["fold"]): {k2: int(r[k2]) for k2 in r.asDict()
                             if k2 != "fold"}
            for r in folded.groupBy("fold").agg(*aggs).collect()}
    keys = list(next(iter(rows.values())))
    tot = {k2: sum(r[k2] for r in rows.values()) for k2 in keys}

    def _beta(n, s, ss, sy, sxy):
        # mirrors the oracle SQL exactly:
        # bs = (n*sxy - s*sy) / (n*ss - s*s);  bi = (sy - bs*s) / n
        cn, cs, css, csy, csxy = (float(n), float(s), float(ss),
                                  float(sy), float(sxy))
        bs = (cn * csxy - cs * csy) / (cn * css - cs * cs)
        bi = (csy - bs * cs) / cn
        return bi, bs

    def _base(b, m):
        return _beta(m["n"], m[f"s{b}"], m[f"s{b}{b}"], m["sy"], m[f"s{b}y"])

    fold_betas = {(b, f): _base(b, {k2: tot[k2] - rows[f][k2] for k2 in keys})
                  for b in (0, 1) for f in rows}
    full_betas = [_base(b, tot) for b in (0, 1)]

    # scan 2: quantized meta features (integer per row, exact sums)
    def _z(b):
        e = F.lit(None).cast("double")
        for f in sorted(rows):
            bi, bs = fold_betas[(b, f)]
            e = F.when(F.col("fold") == f,
                       F.lit(bi) + F.lit(bs)
                       * F.col(qx_cols[b]).cast("double")).otherwise(e)
        return F.floor(e + F.lit(0.5)).cast("long")

    qz0, qz1 = _z(0), _z(1)
    m = folded.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(qz0.cast(dec)).alias("a1"), F.sum(qz1.cast(dec)).alias("a2"),
        F.sum((qz0 * qz0).cast(dec)).alias("a11"),
        F.sum((qz0 * qz1).cast(dec)).alias("a12"),
        F.sum((qz1 * qz1).cast(dec)).alias("a22"),
        F.sum(qy.cast(dec)).alias("c0"),
        F.sum((qz0 * qy).cast(dec)).alias("c1"),
        F.sum((qz1 * qy).cast(dec)).alias("c2")).first()
    n, a1, a2 = float(int(m["n"])), float(int(m["a1"])), float(int(m["a2"]))
    a11, a12, a22 = (float(int(m["a11"])), float(int(m["a12"])),
                     float(int(m["a22"])))
    c0, c1, c2 = float(int(m["c0"])), float(int(m["c1"])), float(int(m["c2"]))
    # mirrored 3×3 Cramer on [[n,a1,a2],[a1,a11,a12],[a2,a12,a22]]
    det = (n * (a11 * a22 - a12 * a12) - a1 * (a1 * a22 - a12 * a2)
           + a2 * (a1 * a12 - a11 * a2))
    det0 = (c0 * (a11 * a22 - a12 * a12) - a1 * (c1 * a22 - a12 * c2)
            + a2 * (c1 * a12 - a11 * c2))
    det1 = (n * (c1 * a22 - a12 * c2) - c0 * (a1 * a22 - a12 * a2)
            + a2 * (a1 * c2 - c1 * a2))
    det2 = (n * (a11 * c2 - c1 * a12) - a1 * (a1 * c2 - c1 * a2)
            + c0 * (a1 * a12 - a11 * a2))
    mi, w0, w1 = det0 / det, det1 / det, det2 / det

    def _inner(b):
        bi, bs = full_betas[b]
        return (F.lit(bi) + F.lit(bs)
                * F.col(qx_cols[b]).cast("double"))

    predict_expr = (F.lit(mi) + F.lit(w0) * _inner(0)
                    + F.lit(w1) * _inner(1))
    return fold_betas, full_betas, (mi, w0, w1), predict_expr


def stacked_learner(df: DataFrame, key: str,
                    base_fits: Sequence[Callable[[DataFrame], Model]],
                    aggregate_fit: Callable[[DataFrame, Sequence[str]], Model],
                    *, k: int = 3, salt: str = "") -> Model:
    """Generic stacking (StackedLearner, stack.py:40-96): K-fold CV
    predictions of each base learner become meta-features ``z0..zB-1``;
    ``aggregate_fit(meta_frame, meta_cols)`` fits the combiner; the final
    model applies full-data base refits + the combiner.

    ``base_fits[b](train) -> Model`` must append ``prediction``;
    suits any learner in ``ml/learners.py`` (MLlib or closed-form).
    Cost: k×B base fits + B full refits — use :func:`stacked_ols` when
    all parts are linear (two scans instead).
    """
    folded = with_fold(df, key, k, salt).cache()
    parts = []
    for f in sorted({r["fold"] for r in
                     folded.select("fold").distinct().collect()}):
        train = folded.filter(F.col("fold") != f)
        test = folded.filter(F.col("fold") == f)
        out = test
        for b, fit in enumerate(base_fits):
            model = fit(train)
            out = (model.predict(out)
                   .withColumnRenamed("prediction", f"z{b}"))
        parts.append(out)
    meta = parts[0]
    for p in parts[1:]:
        meta = meta.unionByName(p)
    meta_cols = [f"z{b}" for b in range(len(base_fits))]
    combiner = aggregate_fit(meta, meta_cols)
    finals = [fit(folded) for fit in base_fits]
    folded.unpersist()

    def _predict(d: DataFrame) -> DataFrame:
        out = d
        for b, model in enumerate(finals):
            out = (model.predict(out)
                   .withColumnRenamed("prediction", f"z{b}"))
        out = combiner.predict(out)
        return out.drop(*meta_cols)

    m = Model(_predict, "stacked")
    m.base_models = finals
    m.combiner = combiner
    return m


# ------------------------------------------------------------------ AdaBoost

def fit_adaboost_matrix(X, y, *, n_estimators: int = 20,
                        learning_rate: float = 1.0):
    """SAMME boosting of depth-1 stumps on sample matrix ``(X, y±1)`` —
    pure numpy, shared by the Spark fit and the DuckDB oracle replay.

    Each round: exact weighted-error search over every midpoint threshold
    of every feature and both polarities (the classic O(n·p) stump sweep
    on sorted prefix sums); α = lr·½ln((1−ε)/ε); weights re-derive from
    the margin.  Ties break toward the lower feature index, then the
    lower threshold — fully deterministic.  Returns
    ``[(feature, threshold, polarity, alpha), ...]``; the stump votes
    ``polarity`` if ``x[feature] < threshold`` else ``-polarity``.
    """
    import numpy as np

    n, p = X.shape
    y = np.where(np.asarray(y) > 0, 1.0, -1.0)
    w = np.full(n, 1.0 / n)
    stumps = []
    for _ in range(n_estimators):
        best = None                      # (err, feat, thr, pol)
        for f in range(p):
            order = np.argsort(X[:, f], kind="stable")
            xs, ys, ws = X[order, f], y[order], w[order]
            # prefix weighted sums of +1/−1 labels → error at every cut
            swpos = np.cumsum(ws * (ys > 0))
            swneg = np.cumsum(ws * (ys < 0))
            tpos, tneg = swpos[-1], swneg[-1]
            cuts = np.nonzero(xs[1:] > xs[:-1])[0]   # distinct-value edges
            for c in cuts:
                thr = (xs[c] + xs[c + 1]) / 2.0
                # polarity +1: predict +1 below thr → errors = neg below
                # + pos at/above
                e_pos = swneg[c] + (tpos - swpos[c])
                e_neg = swpos[c] + (tneg - swneg[c])
                for pol, e in ((1.0, e_pos), (-1.0, e_neg)):
                    if best is None or e < best[0] - 1e-15:
                        best = (e, f, thr, pol)
        if best is None:
            break
        err, f, thr, pol = best
        err = min(max(err, 1e-12), 1.0 - 1e-12)
        alpha = learning_rate * 0.5 * float(np.log((1.0 - err) / err))
        stumps.append((int(f), float(thr), float(pol), alpha))
        pred = np.where(X[:, f] < thr, pol, -pol)
        w = w * np.exp(-alpha * y * pred)
        w = w / w.sum()
        if err < 1e-10:
            break
    return stumps


class AdaBoostModel:
    """Fitted stump ensemble; predict is a fixed chain of CASE WHENs —
    whole-stage codegen, mirrorable term for term in SQL."""

    def __init__(self, stumps, cols):
        self.stumps = stumps
        self.cols = list(cols)

    def margin(self) -> Column:
        e: Column = F.lit(0.0)
        for f, thr, pol, alpha in self.stumps:
            vote = F.when(F.col(self.cols[f]).cast("double") < F.lit(thr),
                          F.lit(pol)).otherwise(F.lit(-pol))
            e = e + vote * F.lit(alpha)
        return e

    def predict(self, df: DataFrame, *, margin_col: str = "margin",
                pred_col: str = "prediction") -> DataFrame:
        out = df.withColumn(margin_col, self.margin())
        return out.withColumn(pred_col, (F.col(margin_col) > 0))


def ada_boost_classifier(df: DataFrame, cols: Sequence[str],
                         label_col: str, *, n_estimators: int = 20,
                         learning_rate: float = 1.0,
                         max_samples: int = 4000,
                         id_cols: Optional[Sequence[str]] = None
                         ) -> AdaBoostModel:
    """AdaBoost (SklAdaBoostClassificationLearner, ada_boost.py:22; SAMME
    over depth-1 stumps) fit on a bounded id-hash sample; label is any
    boolean/0-1 column.  Deterministic: hash sampling + exact stump
    search, no randomness at all."""
    import numpy as np

    from orange3_spark.ml.outlier_models import _hash_sample

    aug = df.withColumn(
        "_xy", F.concat(F.array(*[F.col(c).cast("double") for c in cols]),
                        F.array(F.col(label_col).cast("double"))))
    S = _hash_sample(aug, [], "_xy", max_samples, id_cols=id_cols)
    X, y = np.asarray(S[:, :-1]), np.asarray(S[:, -1])
    stumps = fit_adaboost_matrix(X, y, n_estimators=n_estimators,
                                 learning_rate=learning_rate)
    return AdaBoostModel(stumps, cols)


# -------------------------------------------------------- AdaBoost.R2

def fit_adaboost_r2_matrix(X, y, *, n_estimators: int = 8,
                           learning_rate: float = 1.0,
                           w_scale: int = 1_000_000_000):
    """AdaBoost.R2 (Drucker 1997 — the algorithm behind the reference's
    ``SklAdaBoostRegressionLearner``, ``Orange/ensembles/ada_boost.py``)
    boosting regression stumps on a sample matrix — pure numpy, shared
    by the Spark fit and the DuckDB oracle replay, so the float pow/log
    in the weight updates run as the SAME instruction sequence on both
    sides.

    Deviations from sklearn, chosen for determinism: the base stump is
    fit on the weights DIRECTLY (exact weighted-SSE sweep over every
    distinct-value midpoint; sklearn draws a weighted bootstrap — i.e.
    randomness — instead), and stage weights are also returned QUANTIZED
    to integers (``floor(ln(1/β)·w_scale + 0.5)``) so the weighted-median
    prediction can run on exact integer cumulative sums in any engine.

    Each stump predicts the weighted mean of its side.  Rounds stop when
    average loss ≥ 0.5 or the fit is perfect.  Returns
    ``[(feature, threshold, left_mean, right_mean, alpha_q), ...]``.
    """
    import math

    import numpy as np

    X = np.asarray(X, dtype=float)
    y = np.asarray(y, dtype=float)
    n, p = X.shape
    w = np.full(n, 1.0 / n)
    stumps = []
    for _ in range(n_estimators):
        best = None             # (sse, feat, thr, lmean, rmean)
        for f in range(p):
            order = np.argsort(X[:, f], kind="stable")
            xs, ys, ws = X[order, f], y[order], w[order]
            cw = np.cumsum(ws)
            cwy = np.cumsum(ws * ys)
            cwy2 = np.cumsum(ws * ys * ys)
            tw, twy, twy2 = cw[-1], cwy[-1], cwy2[-1]
            for c in np.nonzero(xs[1:] > xs[:-1])[0]:
                lw, lwy, lwy2 = cw[c], cwy[c], cwy2[c]
                rw, rwy, rwy2 = tw - lw, twy - lwy, twy2 - lwy2
                if lw <= 0 or rw <= 0:
                    continue
                sse = (lwy2 - lwy * lwy / lw) + (rwy2 - rwy * rwy / rw)
                if best is None or sse < best[0] - 1e-15:
                    best = (sse, f, (xs[c] + xs[c + 1]) / 2.0,
                            lwy / lw, rwy / rw)
        if best is None:
            break
        _, f, thr, lm, rm = best
        pred = np.where(X[:, f] < thr, lm, rm)
        err = np.abs(y - pred)
        emax = float(err.max())
        # relative tolerance: an exactly-separating split leaves float
        # dust in the side means (~1e-15·|y|); without it the dust makes
        # loss≡1 on one side, eps hits 0.5 and the round aborts empty
        if emax <= 1e-12 * max(1.0, float(np.abs(y).max())):
            # perfect stage: by convention it dominates the median —
            # give it the weight cap and stop
            stumps.append((int(f), float(thr), float(lm), float(rm),
                           int(50.0 * w_scale)))
            break
        loss = err / emax
        eps = float((w * loss).sum())
        if eps >= 0.5:
            break
        beta = eps / (1.0 - eps)
        alpha = learning_rate * math.log(1.0 / max(beta, 1e-300))
        stumps.append((int(f), float(thr), float(lm), float(rm),
                       int(math.floor(alpha * w_scale + 0.5))))
        w = w * np.power(beta, (1.0 - loss) * learning_rate)
        s = float(w.sum())
        if s <= 0.0:
            break
        w = w / s
    return stumps


class AdaBoostR2Model:
    """Fitted stump ensemble; predict is the weighted MEDIAN over stage
    predictions (sklearn semantics) evaluated with exact integer stage
    weights: per row the stages sort by (prediction, stage), integer
    cumulative weights accumulate left-to-right, and the first stage
    reaching half the total wins — bit-replayable as a SQL window."""

    def __init__(self, stumps, cols):
        self.stumps = stumps
        self.cols = list(cols)
        self.half_q = (sum(s[4] for s in stumps) + 1) // 2

    def prediction(self) -> Column:
        entries = []
        for t, (f, thr, lm, rm, aq) in enumerate(self.stumps):
            pred = F.when(
                F.col(self.cols[f]).cast("double") < F.lit(thr),
                F.lit(lm)).otherwise(F.lit(rm))
            entries.append(F.struct(pred.alias("p"),
                                    F.lit(t).cast("int").alias("t"),
                                    F.lit(int(aq)).alias("w")))
        arr = F.sort_array(F.array(*entries))
        half = F.lit(int(self.half_q))
        init = F.struct(F.lit(0).cast("long").alias("s"),
                        F.lit(None).cast("double").alias("y"))
        return F.aggregate(
            arr, init,
            lambda a, x: F.struct(
                (a["s"] + x["w"]).alias("s"),
                F.when(a["y"].isNull() & (a["s"] + x["w"] >= half),
                       x["p"]).otherwise(a["y"]).alias("y")),
            lambda a: a["y"])

    def predict(self, df: DataFrame, *,
                pred_col: str = "prediction") -> DataFrame:
        return df.withColumn(pred_col, self.prediction())


def ada_boost_regressor(df: DataFrame, cols: Sequence[str],
                        target_col: str, *, n_estimators: int = 8,
                        learning_rate: float = 1.0,
                        max_samples: int = 4000,
                        id_cols: Optional[Sequence[str]] = None
                        ) -> AdaBoostR2Model:
    """AdaBoost.R2 fit on a bounded id-hash sample (same scaffold as
    ``ada_boost_classifier``); inference is one codegen column over the
    full table — no vectors leave the cluster after the sample."""
    import numpy as np

    from orange3_spark.ml.outlier_models import _hash_sample

    aug = df.withColumn(
        "_xy", F.concat(F.array(*[F.col(c).cast("double") for c in cols]),
                        F.array(F.col(target_col).cast("double"))))
    S = _hash_sample(aug, [], "_xy", max_samples, id_cols=id_cols)
    X, y = np.asarray(S[:, :-1]), np.asarray(S[:, -1])
    stumps = fit_adaboost_r2_matrix(X, y, n_estimators=n_estimators,
                                    learning_rate=learning_rate)
    if not stumps:
        # degenerate corpus (no valid split): constant global mean
        stumps = [(0, float("-inf"), float(np.mean(y)), float(np.mean(y)),
                   1_000_000_000)]
    return AdaBoostR2Model(stumps, cols)
