"""Ensembles: stacking must beat-or-match its worst base, AdaBoost must
nail a pattern no single stump can, and refits must be deterministic
(parity with Orange/tests/test_stack.py, test_ada_boost.py)."""

from __future__ import annotations

import pyspark.sql.functions as F


def _lin(spark, n=400):
    """y = 2·a − 3·b + 1 (exact), a and b each alone underdetermine y."""
    rows = [(i, float(i % 17), float((i * 7) % 13),
             2.0 * (i % 17) - 3.0 * ((i * 7) % 13) + 1.0)
            for i in range(n)]
    return spark.createDataFrame(rows, "id long, a double, b double, y double")


def test_stacked_ols_combines_bases(spark):
    from orange3_spark.ml.ensembles import stacked_ols
    from orange3_spark.ml.learners import ols_learner

    df = _lin(spark)
    stack = stacked_ols(df, "id", [["a"], ["b"]], "y", k=3)

    def _rmse(pred):
        return pred.agg(F.sqrt(F.avg((F.col("y") - F.col("prediction"))
                                     ** 2))).first()[0]

    r_stack = _rmse(stack.predict(df))
    r_a = _rmse(ols_learner(df, ["a"], "y").predict(df))
    r_b = _rmse(ols_learner(df, ["b"], "y").predict(df))
    # each base is blind to one term; the stack sees both through the
    # meta-combination and must strictly improve on both bases
    assert r_stack < min(r_a, r_b) * 0.9


def test_stacked_learner_generic(spark):
    from orange3_spark.ml.ensembles import stacked_learner
    from orange3_spark.ml.learners import mean_learner, ols_learner

    df = _lin(spark)
    stack = stacked_learner(
        df, "id",
        [lambda d: ols_learner(d, ["a"], "y"),
         lambda d: ols_learner(d, ["b"], "y"),
         lambda d: mean_learner(d, "y")],
        lambda meta, cols: ols_learner(meta, cols, "y"), k=3)
    out = stack.predict(df)
    r = out.agg(F.sqrt(F.avg((F.col("y") - F.col("prediction"))
                             ** 2))).first()[0]
    base = ols_learner(df, ["a"], "y").predict(df)
    r_a = base.agg(F.sqrt(F.avg((F.col("y") - F.col("prediction"))
                               ** 2))).first()[0]
    assert r < r_a
    assert "z0" not in out.columns          # meta cols cleaned up


def test_adaboost_learns_interval(spark):
    """label = x in [3, 7): a single threshold stump caps at 0.7 accuracy
    (it can only get one side of the interval); the boosted combination
    must beat that cap decisively."""
    from orange3_spark.ml.ensembles import ada_boost_classifier

    rows = [(i, float(i % 10), bool(3 <= i % 10 < 7))
            for i in range(300)]
    df = spark.createDataFrame(rows, "id long, x double, y boolean")
    model = ada_boost_classifier(df, ["x"], "y", n_estimators=10,
                                 id_cols=["id"])
    scored = model.predict(df)
    acc = (scored.filter(F.col("prediction") == F.col("y")).count()
           / df.count())
    assert acc >= 0.85, f"boosted acc {acc} should beat the 0.7 stump cap"
    # determinism: refit produces identical stumps
    again = ada_boost_classifier(df, ["x"], "y", n_estimators=10,
                                 id_cols=["id"])
    assert again.stumps == model.stumps


def test_adaboost_predict_is_codegen(spark):
    from orange3_spark.ml.ensembles import ada_boost_classifier

    rows = [(i, float(i % 10), bool(i % 10 < 5)) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, x double, y boolean")
    model = ada_boost_classifier(df, ["x"], "y", n_estimators=5,
                                 id_cols=["id"])
    plan = (model.predict(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_adaboost_r2_stump_and_median(spark):
    """Literal check: a single clean split is found in round 1, and the
    distributed weighted-median predict equals the numpy replay."""
    import numpy as np

    from orange3_spark.ml.ensembles import (AdaBoostR2Model,
                                            fit_adaboost_r2_matrix)

    X = np.array([[1.0], [2.0], [3.0], [10.0], [11.0], [12.0]])
    y = np.array([5.0, 5.0, 5.0, 20.0, 20.0, 20.0])
    stumps = fit_adaboost_r2_matrix(X, y, n_estimators=4)
    f, thr, lm, rm, aq = stumps[0]
    assert f == 0 and thr == 6.5
    assert abs(lm - 5.0) < 1e-9 and abs(rm - 20.0) < 1e-9
    assert aq == 50_000_000_000          # perfect stage cap, then stop
    assert len(stumps) == 1
    df = spark.createDataFrame([(float(v),) for v in X[:, 0]], "x double")
    got = {r["x"]: r["prediction"] for r in
           AdaBoostR2Model(stumps, ["x"]).predict(df).collect()}
    assert got[1.0] == lm and got[12.0] == rm


def test_adaboost_r2_weighted_median_order(spark):
    """With three stages of known weights, the median picks the stage
    where the integer cumulative weight first reaches half."""
    from orange3_spark.ml.ensembles import AdaBoostR2Model

    # stage preds at x=0: 1.0, 3.0, 2.0 with weights 2, 3, 4 (total 9,
    # half=5): sorted by pred -> (1.0,w2)->2, (2.0,w4)->6 >= 5 -> 2.0
    stumps = [(0, 10.0, 1.0, -1.0, 2), (0, 10.0, 3.0, -3.0, 3),
              (0, 10.0, 2.0, -2.0, 4)]
    m = AdaBoostR2Model(stumps, ["x"])
    df = spark.createDataFrame([(0.0,), (99.0,)], "x double")
    got = {r["x"]: r["prediction"] for r in m.predict(df).collect()}
    assert got[0.0] == 2.0
    assert got[99.0] == -2.0   # mirrored side: -3,-2,-1 -> cum 3,7 -> -2


def test_model_json_roundtrip(spark, tmp_path):
    """Fitted models round-trip through JSON (no pickle surface) with
    identical predictions."""
    import numpy as np

    from orange3_spark.ml import persist as P
    from orange3_spark.ml.ensembles import fit_adaboost_r2_matrix, \
        AdaBoostR2Model
    from orange3_spark.ml.learners import ols_learner

    rng = np.random.default_rng(2)
    rows = [(float(x), float(2.5 * x + 1.0 + rng.normal() * 0.1))
            for x in rng.uniform(0, 10, 80)]
    df = spark.createDataFrame(rows, "x double, y double")

    ols = ols_learner(df, ["x"], "y")
    p = tmp_path / "ols.json"
    P.save_model(ols, str(p))
    ols2 = P.load_model(str(p))
    a = [r["prediction"] for r in ols.predict(df).collect()]
    b = [r["prediction"] for r in ols2.predict(df).collect()]
    assert a == b

    X = np.array([[r[0]] for r in rows])
    y = np.array([r[1] for r in rows])
    m = AdaBoostR2Model(fit_adaboost_r2_matrix(X, y, n_estimators=3),
                        ["x"])
    p2 = tmp_path / "r2.json"
    P.save_model(m, str(p2))
    m2 = P.load_model(str(p2))
    assert m2.stumps == m.stumps and m2.half_q == m.half_q
    a = [r["prediction"] for r in m.predict(df).collect()]
    b = [r["prediction"] for r in m2.predict(df).collect()]
    assert a == b

    books = [[[1, 2], [3, 4]], [[5, 6], [7, 8]]]
    p3 = tmp_path / "books.json"
    P.save_codebooks(books, str(p3))
    assert P.load_codebooks(str(p3)) == books
