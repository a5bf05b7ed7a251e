"""SVR family (Orange/regression/svm.py:11,22,33): the RFF-RBF fit must
capture a nonlinearity the linear variant cannot, deterministically."""

from __future__ import annotations

import math

import pyspark.sql.functions as F


def _sine(spark):
    rows = [(i, i / 50.0 * 2 * math.pi, math.sin(i / 50.0 * 2 * math.pi))
            for i in range(200)]
    return spark.createDataFrame(rows, "id int, x double, y double")


def _rmse(pred):
    return pred.agg(F.sqrt(F.avg(
        F.pow(F.col("prediction") - F.col("y"), 2)))).first()[0]


def test_rbf_svr_fits_sine(spark):
    from orange3_spark.ml.svr import svr

    df = _sine(spark)
    model = svr(df, ["x"], "y", epsilon=0.05, gamma=8.0, epochs=500, seed=1)
    assert _rmse(model.predict(df)) < 0.25
    # determinism: same seed, same predictions
    again = svr(df, ["x"], "y", epsilon=0.05, gamma=8.0, epochs=500, seed=1)
    a = model.predict(df).orderBy("id").select("prediction").collect()
    b = again.predict(df).orderBy("id").select("prediction").collect()
    assert a == b


def test_nu_svr_fits_sine(spark):
    from orange3_spark.ml.svr import nu_svr

    df = _sine(spark)
    model = nu_svr(df, ["x"], "y", nu=0.4, gamma=8.0, epochs=500, seed=1)
    assert _rmse(model.predict(df)) < 0.3


def test_linear_svr_is_codegen_and_weaker_on_sine(spark):
    from orange3_spark.ml.svr import linear_svr, svr

    df = _sine(spark)
    lin = linear_svr(df, ["x"], "y", epochs=500)
    rbf = svr(df, ["x"], "y", gamma=8.0, epochs=500, seed=1)
    rmse_lin, rmse_rbf = _rmse(lin.predict(df)), _rmse(rbf.predict(df))
    assert rmse_rbf < rmse_lin, "RBF must beat linear on a sine"
    plan = (lin.predict(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_linear_svr_recovers_line(spark):
    from orange3_spark.ml.svr import linear_svr

    rows = [(i, float(i), 3.0 * i + 7.0) for i in range(100)]
    df = spark.createDataFrame(rows, "id int, x double, y double")
    model = linear_svr(df, ["x"], "y", epsilon=0.01, epochs=2000)
    assert _rmse(model.predict(df)) < 5.0


def test_kernel_svm_separates_xor(spark):
    """XOR labels are not linearly separable — the RFF kernel map must
    get them (Orange/classification/svm.py SVC parity)."""
    import numpy as np
    from orange3_spark.ml.svr import svm_classifier

    rng = np.random.default_rng(7)
    rows = []
    for i in range(400):
        x, y = rng.normal(0, 1.0), rng.normal(0, 1.0)
        x += 2.0 if i % 4 in (0, 1) else -2.0
        y += 2.0 if i % 4 in (0, 2) else -2.0
        rows.append((i, float(x), float(y), bool((x > 0) == (y > 0))))
    df = spark.createDataFrame(rows, "id long, x double, y double, lbl boolean")
    data = df.withColumn("_y", F.col("lbl").cast("double"))
    model = svm_classifier(data, ["x", "y"], "_y", id_cols=["id"],
                           gamma=0.5, epochs=400, seed=2)
    scored = model.predict(data)
    acc = scored.filter(F.col("prediction") == F.col("lbl")).count() / 400
    assert acc > 0.9, acc


def test_kernel_svm_refit_deterministic(spark):
    import numpy as np
    from orange3_spark.ml.svr import svm_classifier

    rows = [(i, float(i % 13), float((i * 3) % 7), bool(i % 2))
            for i in range(100)]
    df = spark.createDataFrame(rows, "id long, a double, b double, l boolean")
    data = df.withColumn("_y", F.col("l").cast("double"))
    m1 = svm_classifier(data, ["a", "b"], "_y", id_cols=["id"], epochs=50)
    m2 = svm_classifier(data, ["a", "b"], "_y", id_cols=["id"], epochs=50)
    assert np.array_equal(m1._scorer.w, m2._scorer.w)
    assert m1._scorer.b == m2._scorer.b


def test_knn_regressor_exact_mean(spark):
    """1-d integer grid: the k=3 neighbor set and Σ/k mean are fully
    predictable — assert them literally."""
    from orange3_spark.ml.learners import knn_regressor

    train = spark.createDataFrame(
        [(i, i * 10, i * 100) for i in range(10)],
        "id long, qx long, qy long")
    test = spark.createDataFrame([(100, 41), (101, 95)],
                                 "id long, qx long")
    model = knn_regressor(train, ["qx"], "qy", k=3, id_col="id")
    got = {r["id"]: r["prediction"]
           for r in model.predict(test).collect()}
    # qx=41 → neighbors 40,50,30 (dists 1,81,121) → mean(400,500,300)=400
    assert got[100] == 400.0
    # qx=95 → neighbors 90,80,70 (dists 25,225,625) → mean(900,800,700)=800
    assert got[101] == 800.0


def test_knn_regressor_1d_window_matches_brute_force(spark):
    """Large 1-d train set with heavy duplicate x values: the sorted-window
    fast path must agree exactly with the O(n·m) lexsort definition.
    Regression test for a window-local index applied to the global array."""
    import numpy as np
    from orange3_spark.ml.learners import knn_regressor

    rng = np.random.default_rng(7)
    n_tr, k = 4000, 5
    tx = rng.integers(0, 500, size=n_tr)      # ~8x multiplicity
    ty = rng.integers(0, 1000, size=n_tr)
    train = spark.createDataFrame(
        [(int(i), int(tx[i]), int(ty[i])) for i in range(n_tr)],
        "id long, qx long, qy long")
    probes = rng.integers(-10, 510, size=60)
    test = spark.createDataFrame(
        [(1_000_000 + j, int(q)) for j, q in enumerate(probes)],
        "id long, qx long")
    model = knn_regressor(train, ["qx"], "qy", k=k, id_col="id")
    got = {r["id"]: r["prediction"] for r in model.predict(test).collect()}
    for j, q in enumerate(probes):
        d2 = (tx.astype(np.int64) - int(q)) ** 2
        order = np.lexsort((np.arange(n_tr), d2))[:k]
        assert got[1_000_000 + j] == ty[order].sum() / k


def test_knn_regressor_lsh_fallback_matches_broadcast(spark):
    """Over-bound knn_regressor must fall back to the LSH-bucket join
    instead of raising; with 0 planes (single bucket) the candidate set
    is the full train set, so predictions match the broadcast path
    wherever the k-th distance is untied."""
    from orange3_spark.ml.learners import knn_regressor

    rows = [(i, float(i % 23) + (i % 7) * 0.013, float((i * 5) % 19))
            for i in range(150)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    small = knn_regressor(df, ["x"], "y", k=3, id_col="id")
    big = knn_regressor(df, ["x"], "y", k=3, id_col="id",
                        max_broadcast_cells=1, lsh_planes=0)
    got_small = {r["id"]: r["prediction"] for r in small.predict(df).collect()}
    got_big = {r["id"]: r["prediction"] for r in big.predict(df).collect()}
    assert set(got_small) == set(got_big)
    agree = sum(abs(got_small[i] - got_big[i]) < 1e-9 for i in got_small)
    assert agree >= 0.9 * len(got_small), agree


def test_sample_xy_named_cols_matches_array_path(spark):
    """The r10 named-cols fast path in _sample_xy (codegen null-drop on
    cast columns instead of the exists() HOF over the concat array) must
    return the bit-identical sample — same rows, same order — as the
    generic array_col route, with and without id_cols keys."""
    import numpy as np
    from pyspark.sql import functions as F

    from orange3_spark.ml.svr import _sample_xy

    rows = [(i,
             None if i % 7 == 3 else (i % 31) / 31.0,
             (i * 3 % 13) / 13.0,
             None if i % 11 == 5 else (i % 5) / 5.0)
            for i in range(400)]
    df = spark.createDataFrame(
        rows, "id long, x0 double, x1 double, y double")
    arr = df.withColumn("_a", F.array(F.col("x0"), F.col("x1")))
    for id_cols in (["id"], None):
        Xn, yn = _sample_xy(df, ["x0", "x1"], None, "y", 100,
                            id_cols=id_cols)
        Xa, ya = _sample_xy(arr, [], "_a", "y", 100, id_cols=id_cols)
        assert np.array_equal(Xn, Xa) and np.array_equal(yn, ya)
        assert Xn.shape == (100, 2)
