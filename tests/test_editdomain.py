"""Edit Domain / Purge Domain / FCBF."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from orange3_spark.domain import Domain, TYPE_CONTINUOUS, TYPE_DISCRETE, Variable, with_domain
from orange3_spark.operators import editdomain as ED


@pytest.fixture()
def df(spark):
    base = spark.createDataFrame(
        [("a", 1.0, "k", "u"), ("b", 2.0, "k", "v"), ("a", 3.0, "k", "u")],
        "cls string, x double, const string, extra string")
    return with_domain(base, [
        Variable("cls", TYPE_DISCRETE, values=("a", "b", "c")),
        Variable("x", TYPE_CONTINUOUS),
        Variable("const", TYPE_DISCRETE, values=("k",)),
        Variable("extra", TYPE_DISCRETE, values=("v", "u")),
    ])


def test_rename_variables_keeps_metadata(df):
    out = ED.rename_variables(df, {"cls": "class_var"})
    dom = Domain.from_df(out)
    assert "class_var" in out.columns and "cls" not in out.columns
    assert dom["class_var"].values == ("a", "b", "c")


def test_rename_values_updates_data_and_order(df):
    out = ED.rename_values(df, "cls", {"a": "alpha"})
    dom = Domain.from_df(out)
    assert dom["cls"].values == ("alpha", "b", "c")
    assert {r.cls for r in out.collect()} == {"alpha", "b"}


def test_reorder_values(df):
    out = ED.reorder_values(df, "cls", ["c", "b", "a"])
    assert Domain.from_df(out)["cls"].values == ("c", "b", "a")
    with pytest.raises(ValueError):
        ED.reorder_values(df, "cls", ["a"])


def test_change_type(df):
    out = ED.change_type(df, "x", TYPE_DISCRETE)
    dom = Domain.from_df(out)
    assert dom["x"].var_type == TYPE_DISCRETE
    assert dom["x"].values == ("1.0", "2.0", "3.0")


def test_annotate(df):
    out = ED.annotate(df, "x", unit="cm", origin="test")
    assert Domain.from_df(out)["x"].attributes == \
        {"unit": "cm", "origin": "test"}


def test_purge_domain(df):
    out = ED.purge_domain(df, sort_values=True)
    assert "const" not in out.columns          # constant dropped
    dom = Domain.from_df(out)
    assert dom["cls"].values == ("a", "b")     # unused 'c' dropped
    assert dom["extra"].values == ("u", "v")   # sorted


def test_fcbf(spark):
    from orange3_spark.preprocess.score import fcbf

    rows = []
    for i in range(200):
        cls = str(i % 2)
        informative = cls                 # perfect predictor
        copy = cls                        # redundant duplicate of it
        noise = str((i // 7) % 3)         # unrelated
        rows.append((cls, informative, copy, noise))
    df = spark.createDataFrame(rows, "cls string, inf string, dup string, noise string")
    kept = fcbf(df, ["inf", "dup", "noise"], "cls")
    names = [f for f, _ in kept]
    assert names[0] in ("inf", "dup")
    assert not ("inf" in names and "dup" in names)  # redundancy eliminated
    assert "noise" not in names
