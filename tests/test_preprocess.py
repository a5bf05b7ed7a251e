"""Preprocess-layer units: transformation kernels, continuize treatments,
impute, remove, scorers — hand-computed expectations on tiny tables."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from orange3_spark.preprocess import discretize as D
from orange3_spark.preprocess import score as SC
from orange3_spark.preprocess import transform as P


@pytest.fixture(scope="module")
def toy(spark):
    return spark.createDataFrame(
        [("a", "x", 1.0), ("a", "x", 2.0), ("a", "y", 3.0),
         ("b", "y", 4.0), ("b", "y", None), ("b", None, 6.0)],
        "g string, d string, v double")


def test_continuize_indicators(spark, toy):
    out = P.continuize(toy, "d", ["x", "y"], "indicators")
    assert "d=x" in out.columns and "d=y" in out.columns and "d" not in out.columns
    sums = out.agg(F.sum("d=x").alias("x"), F.sum("d=y").alias("y")).collect()[0]
    assert (sums["x"], sums["y"]) == (2.0, 3.0)


def test_continuize_first_as_base(toy):
    out = P.continuize(toy, "d", ["x", "y"], "first_as_base")
    assert out.columns[-1] == "d=y" and "d=x" not in out.columns


def test_continuize_ordinal(toy):
    out = P.continuize(toy, "d", ["x", "y"], "as_normalized_ordinal")
    vals = {r["d_ordinal"] for r in out.collect()}
    assert vals == {0.0, 1.0, None}


def test_impute_average(toy):
    out = P.impute_average(toy, ["v"])
    vals = sorted(r["v"] for r in out.collect())
    assert vals == pytest.approx([1.0, 2.0, 3.0, 3.2, 4.0, 6.0])  # mean=3.2


def test_impute_as_value(toy):
    out = P.impute_as_value(toy, "d")
    rows = out.select("d", "d_defined").collect()
    assert {(r["d"], r["d_defined"]) for r in rows} >= {("N/A", 0.0), ("x", 1.0)}


def test_remove_constant_columns(spark):
    df = spark.createDataFrame([(1, 7, "a"), (2, 7, "b")], "x int, c int, s string")
    out = P.remove_constant_columns(df)
    assert out.columns == ["x", "s"]


def test_remove_nan_columns(spark):
    df = spark.createDataFrame([(1.0, None), (2.0, None)], "x double, y double")
    out = P.remove_nan_columns(df, threshold=0.9)
    assert out.columns == ["x"]


def test_purge_unused_values(toy):
    kept = P.purge_unused_values(toy, "d", ["x", "y", "z"])
    assert kept == ["x", "y"]


def test_lookup_kernel(spark):
    df = spark.createDataFrame([("a",), ("b",), ("c",)], "s string")
    out = df.withColumn("m", P.lookup("s", {"a": 1.0, "b": 2.0}, default=0.0))
    assert {r["m"] for r in out.collect()} == {1.0, 2.0, 0.0}


def test_discretize_thresholds(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "x double")
    ew = D.equal_width_thresholds(df, "x", 4)
    assert ew == pytest.approx([25.75, 50.5, 75.25])
    ef = D.equal_freq_thresholds(df, "x", 4)
    assert ef == pytest.approx([25.75, 50.5, 75.25])
    fw = D.fixed_width_thresholds(1.0, 100.0, 25.0)
    assert fw == [25.0, 50.0, 75.0]
    binned = df.withColumn("b", D.bucketize_expr("x", ew))
    counts = {r["b"]: r["c"] for r in
              binned.groupBy("b").agg(F.count("*").alias("c")).collect()}
    assert counts == {0: 25, 1: 25, 2: 25, 3: 25}


def test_entropy_mdl_perfect_split(spark):
    # class flips exactly at x=50 -> MDL should find one cut near 50
    rows = [(float(i), "lo" if i <= 50 else "hi") for i in range(1, 101)]
    df = spark.createDataFrame(rows, "x double, y string")
    ts = D.entropy_mdl_thresholds(df, "x", "y")
    assert len(ts) == 1 and ts[0] == pytest.approx(50.5)


def test_info_gain_perfect_predictor(spark):
    rows = [("x", "p")] * 10 + [("y", "q")] * 10
    df = spark.createDataFrame(rows, "f string, y string")
    assert SC.info_gain(df, "f", "y") == pytest.approx(1.0)  # H(y)=1 bit
    assert SC.gain_ratio(df, "f", "y") == pytest.approx(1.0)
    assert SC.gini(df, "f", "y") == pytest.approx(0.5)
    stat, dof = SC.chi2(df, "f", "y")
    assert stat == pytest.approx(20.0) and dof == 1


def test_info_gain_independent(spark):
    rows = [("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")] * 5
    df = spark.createDataFrame(rows, "f string, y string")
    assert SC.info_gain(df, "f", "y") == pytest.approx(0.0, abs=1e-9)


def test_anova(spark):
    rows = [("a", v) for v in (1.0, 2.0, 3.0)] + [("b", v) for v in (7.0, 8.0, 9.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    # hand computation: grand=5, ssb=3*16*... -> F = 54/ (4/4) = 54
    assert SC.anova_f(df, "v", "g") == pytest.approx(54.0)


def test_select_best_features(spark):
    rows = [("x", "u", "p")] * 10 + [("y", "u", "q")] * 10
    df = spark.createDataFrame(rows, "good string, bad string, y string")
    best = SC.select_best_features(df, ["good", "bad"], "y", k=1)
    assert best == ["good"]


def test_normalize_standardize(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 11)], "x double")
    out = P.normalize(df, ["x"], method="standardize")
    stats = out.agg(F.avg("x").alias("m"), F.stddev_samp("x").alias("s")).collect()[0]
    assert stats["m"] == pytest.approx(0.0, abs=1e-12)
    assert stats["s"] == pytest.approx(1.0)
    out01 = P.normalize(df, ["x"], method="span_01")
    mm = out01.agg(F.min("x").alias("a"), F.max("x").alias("b")).collect()[0]
    assert (mm["a"], mm["b"]) == (0.0, 1.0)


def test_impute_model(spark):
    from orange3_spark.preprocess.transform import impute_model

    rows = [(float(i), 2.0 * i + 1) for i in range(20)]
    rows += [(100.0, None), (200.0, None)]
    df = spark.createDataFrame(rows, "x double, y double")
    out = impute_model(df, "y", ["x"])
    got = {r.x: r.y for r in out.collect()}
    assert abs(got[100.0] - 201.0) < 1e-6   # learned y = 2x + 1
    assert abs(got[200.0] - 401.0) < 1e-6
    assert got[3.0] == 7.0                  # defined rows untouched


def test_randomize_breaks_correlation(spark):
    from orange3_spark.preprocess.transform import randomize

    df = spark.createDataFrame(
        [(float(i), float(i)) for i in range(200)], "a double, b double")
    out = randomize(df, ["b"], seed=1)
    assert out.count() == 200
    # marginal distribution preserved...
    assert sorted(r.b for r in out.collect()) == [float(i) for i in range(200)]
    # ...but the perfect correlation with a is destroyed
    corr = out.stat.corr("a", "b")
    assert abs(corr) < 0.5


def test_create_instance(spark):
    from orange3_spark.preprocess.transform import create_instance

    df = spark.createDataFrame(
        [(1.0, "x"), (3.0, "x"), (5.0, "y")], "v double, c string")
    row = create_instance(df, "mean").first()
    assert row.v == 3.0 and row.c == "x"
    manual = create_instance(df, values={"v": 9.0, "c": "z"}).first()
    assert manual.v == 9.0 and manual.c == "z"


def test_relieff_ranks_informative_feature(spark):
    from orange3_spark.preprocess.score import relieff

    import numpy as np
    rng = np.random.default_rng(11)
    rows = []
    for i in range(300):
        cls = i % 2
        inf = cls * 2.0 + rng.normal(0, 0.2)     # separates classes
        noise = rng.normal(0, 1.0)               # doesn't
        rows.append((float(inf), float(noise), cls))
    df = spark.createDataFrame(rows, "inf double, noise double, cls int")
    w = relieff(df, ["inf", "noise"], "cls", n_samples=150)
    assert w["inf"] > w["noise"]
    assert w["inf"] > 0


def test_rrelieff_ranks_informative_feature(spark):
    import numpy as np
    rng = np.random.default_rng(9)
    rows = []
    for i in range(150):
        x1 = float(rng.uniform(0, 1))
        x2 = float(rng.uniform(0, 1))          # irrelevant
        y = 3 * x1 + float(rng.normal(0, 0.05))
        rows.append((x1, x2, y))
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    from orange3_spark.preprocess.score import rrelieff
    w = rrelieff(df, ["x1", "x2"], "y", n_samples=150, k=5)
    assert w["x1"] > w["x2"]
    assert w["x1"] > 0


def test_fixed_time_width_units(spark):
    from datetime import datetime
    from orange3_spark.preprocess.discretize import fixed_time_width

    df = spark.createDataFrame(
        [(datetime(2021, 11, 25, 14, 30, 5),),
         (datetime(2021, 11, 25, 16, 59, 59),),
         (datetime(2021, 12, 2, 0, 0, 0),),
         (datetime(2022, 3, 1, 12, 0, 0),)], "ts timestamp")

    got = {r.ts.isoformat(): r.ts_bin.isoformat() for r in
           fixed_time_width(df, "ts", 6, "hour", max_intervals=None).collect()}
    assert got["2021-11-25T14:30:05"] == "2021-11-25T12:00:00"
    assert got["2021-11-25T16:59:59"] == "2021-11-25T12:00:00"

    got = {r.ts.isoformat(): r.ts_bin.isoformat() for r in
           fixed_time_width(df, "ts", 1, "week").collect()}
    # 2021-11-25 is a Thursday -> Monday 2021-11-22
    assert got["2021-11-25T14:30:05"] == "2021-11-22T00:00:00"
    assert got["2021-12-02T00:00:00"] == "2021-11-29T00:00:00"

    got = {r.ts.isoformat(): r.ts_bin.isoformat() for r in
           fixed_time_width(df, "ts", 3, "month").collect()}
    # quarter starts: Oct 2021, Jan 2022
    assert got["2021-11-25T14:30:05"] == "2021-10-01T00:00:00"
    assert got["2022-03-01T12:00:00"] == "2022-01-01T00:00:00"

    got = {r.ts.isoformat(): r.ts_bin.isoformat() for r in
           fixed_time_width(df, "ts", 10, "year").collect()}
    assert got["2021-11-25T14:30:05"] == "2020-01-01T00:00:00"


def test_fixed_time_width_pre_epoch_months(spark):
    """Negative month indexes need pmod: % keeps the dividend's sign and
    would hand make_date a month <= 0 for pre-1970 timestamps."""
    from datetime import datetime
    from orange3_spark.preprocess.discretize import fixed_time_width

    df = spark.createDataFrame(
        [(datetime(1969, 8, 15, 3, 0, 0),),
         (datetime(1969, 12, 31, 23, 59, 59),)], "ts timestamp")
    got = {r.ts.isoformat(): r.ts_bin.isoformat() for r in
           fixed_time_width(df, "ts", 6, "month", max_intervals=None).collect()}
    assert got["1969-08-15T03:00:00"] == "1969-07-01T00:00:00"
    assert got["1969-12-31T23:59:59"] == "1969-07-01T00:00:00"


def test_fixed_time_width_max_intervals_guard(spark):
    """The interval-count guard must trip on an explicitly wide span — its
    own fixture, so no other test's data width decides whether it fires."""
    from datetime import datetime

    import pytest as _p

    from orange3_spark.preprocess.discretize import fixed_time_width

    df = spark.createDataFrame(
        [(datetime(2000, 1, 1, 0, 0, 0),),
         (datetime(2000, 1, 15, 0, 0, 0),)], "ts timestamp")  # 336 hours
    with _p.raises(ValueError):
        fixed_time_width(df, "ts", 1, "hour", max_intervals=100)
    # and it must NOT trip when the bound accommodates the span
    assert fixed_time_width(df, "ts", 1, "hour",
                            max_intervals=400).count() == 2


def test_nice_decimal_binnings_shapes():
    from orange3_spark.preprocess.discretize import nice_decimal_binnings

    # reference docstring example: values in [10004001, 10007005]
    cands = nice_decimal_binnings(10004001.0, 10007005.0, 1000)
    assert cands, "must produce candidates"
    for ts in cands:
        w = ts[1] - ts[0]
        assert ts[0] <= 10004001 and ts[-1] >= 10007005
        assert 2 <= len(ts) - 1 <= 50
        # uniform nice width
        for a, b in zip(ts, ts[1:]):
            assert abs((b - a) - w) < 1e-6


def test_nice_binning_picks_near_n(spark):
    from orange3_spark.preprocess.discretize import (
        nice_binning, nice_binning_thresholds)

    df = spark.createDataFrame(
        [(float(v),) for v in range(0, 1000, 7)], "x double")
    ts = nice_binning_thresholds(df, "x", 4)
    assert 2 <= len(ts) + 1 <= 8   # near 4 bins
    out = nice_binning(df, "x", 4)
    bins = {r.x_bin for r in out.collect()}
    assert bins == set(range(len(ts) + 1))

    # few uniques -> one bin per distinct value (bucketize maps v <= t[i]
    # to bin i, so the largest value needs no threshold)
    small = spark.createDataFrame([(1.0,), (2.0,), (5.0,)] * 3, "x double")
    ts = nice_binning_thresholds(small, "x", 4)
    assert ts == [1.0, 2.0]
    binned = nice_binning(small, "x", 4)
    assert {(r.x, r.x_bin) for r in binned.collect()} == \
        {(1.0, 0), (2.0, 1), (5.0, 2)}


def test_remove_nan_classes_and_sparse(spark):
    from orange3_spark.preprocess.transform import (
        remove_nan_classes, remove_sparse)

    df = spark.createDataFrame(
        [(1.0, 0.0, None), (2.0, 0.0, "a"), (None, 1.0, "b"), (4.0, 0.0, "a")],
        "x double, z double, cls string")
    assert remove_nan_classes(df, ["cls"]).count() == 3

    # z is 75% zeros -> dropped at threshold 0.5; x has 1 zero-count
    out = remove_sparse(df, 0.5, columns=["x", "z"])
    assert "z" not in out.columns and "x" in out.columns
    # NaN mode: x has 1 null of 4 -> survives 0.5, dropped at absolute 1
    out = remove_sparse(df, 0.5, filter0=False, columns=["x"])
    assert "x" in out.columns
    out = remove_sparse(df, 1, filter0=False, columns=["x"])
    assert "x" not in out.columns


def test_scale_variants(spark):
    from orange3_spark.preprocess.transform import scale

    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,), (10.0,)], "x double")
    # median center + span scale: median=2.5, span=9
    got = sorted(r.x for r in scale(df, ["x"], center="median",
                                    scaling="span").collect())
    expect = sorted((v - 2.5) / 9.0 for v in [1, 2, 3, 10])
    assert all(abs(a - b) < 1e-12 for a, b in zip(got, expect))
    # mean center + population std
    import statistics
    mu = 4.0
    sd = (sum((v - mu) ** 2 for v in [1, 2, 3, 10]) / 4) ** 0.5
    got = sorted(r.x for r in scale(df, ["x"]).collect())
    expect = sorted((v - mu) / sd for v in [1, 2, 3, 10])
    assert all(abs(a - b) < 1e-12 for a, b in zip(got, expect))
    # constant column: scale degrades to 1
    const = spark.createDataFrame([(5.0,), (5.0,)], "x double")
    got = [r.x for r in scale(const, ["x"]).collect()]
    assert got == [0.0, 0.0]


def test_relieff_quantized_matches_float_ranking(spark):
    """The exact integer path ranks features like the float path and
    raises when a class has too few sampled rows."""
    import pytest

    from orange3_spark.preprocess.score import relieff

    # sub-quantum jitter keeps every raw tuple DISTINCT (the sample pool
    # is deduped by feature vector) without moving any quantized value
    rows = [(float(i % 10) + i * 1e-5, float((i * 7) % 5) + i * 1e-5,
             "a" if i % 10 < 5 else "b")
            for i in range(120)]
    df = spark.createDataFrame(rows, "inf double, noise double, cls string")
    wq = relieff(df, ["inf", "noise"], "cls", n_samples=100, quantize=100.0)
    assert wq["inf"] > wq["noise"]
    tiny = spark.createDataFrame(rows[:8], "inf double, noise double, cls string")
    with pytest.raises(ValueError, match="<= k"):
        relieff(tiny, ["inf", "noise"], "cls", n_samples=8, quantize=100.0)


def test_select_random_features_seeded():
    """SelectRandomFeatures (fss.py:106-132): deterministic seeded draw,
    original column order preserved, float k = proportion."""
    from orange3_spark.preprocess.score import select_random_features

    cols = ["a", "b", "c", "d", "e", "f"]
    k3 = select_random_features(cols, 3, seed=1)
    assert k3 == select_random_features(cols, 3, seed=1)  # replayable
    assert len(k3) == 3 and [c for c in cols if c in k3] == k3
    assert select_random_features(cols, 0.5, seed=1) == k3
    assert select_random_features(cols, 99, seed=1) == cols
    assert select_random_features(cols, 0, seed=1) == []
    # a different seed eventually draws a different subset
    assert any(select_random_features(cols, 3, seed=s) != k3
               for s in range(2, 12))
