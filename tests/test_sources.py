"""Sources: .tab 3-row header, csv sniff+inference, basket, registry."""

from __future__ import annotations

import textwrap

import pytest

from orange3_spark.domain import (
    Domain, ROLE_CLASS, ROLE_META, TYPE_CONTINUOUS, TYPE_DISCRETE,
    TYPE_STRING, TYPE_TIME,
)
from orange3_spark.sources import read_table
from orange3_spark.sources.basket import basket_to_wide, read_basket
from orange3_spark.sources.csv import read_csv
from orange3_spark.sources.infer import guess_data_type
from orange3_spark.sources.tab import read_tab, write_tab

IRIS_ISH = textwrap.dedent("""\
    sepal length\tpetal length\tiris\tnote
    continuous\tc\tIris-setosa Iris-versicolor Iris-virginica\tstring
    \t\tclass\tmeta note=free
    5.1\t1.4\tIris-setosa\thello
    4.9\t?\tIris-versicolor\t
    7.0\t4.7\tIris-virginica\tworld
    """)


@pytest.fixture()
def tab_file(tmp_path):
    p = tmp_path / "iris_ish.tab"
    p.write_text(IRIS_ISH)
    return str(p)


def test_tab_three_row_header(spark, tab_file):
    df = read_tab(spark, tab_file)
    assert df.columns == ["sepal length", "petal length", "iris", "note"]
    dom = Domain.from_df(df)
    assert dom["sepal length"].var_type == TYPE_CONTINUOUS
    assert dom["iris"].var_type == TYPE_DISCRETE
    assert dom["iris"].role == ROLE_CLASS
    assert dom["iris"].values == ("Iris-setosa", "Iris-versicolor", "Iris-virginica")
    assert dom["note"].role == ROLE_META
    assert dom["note"].attributes == {"note": "free"}
    rows = df.orderBy("sepal length").collect()
    assert rows[0]["sepal length"] == 4.9
    assert rows[0]["petal length"] is None          # '?' -> missing
    assert df.count() == 3


def test_tab_roundtrip(spark, tab_file, tmp_path):
    df = read_tab(spark, tab_file)
    out = str(tmp_path / "rt.tab")
    write_tab(df, out)
    df2 = read_tab(spark, out)
    assert df2.columns == df.columns
    assert Domain.from_df(df2)["iris"].values == \
        Domain.from_df(df)["iris"].values
    assert sorted(map(tuple, df2.collect())) == sorted(map(tuple, df.collect()))


def test_tab_one_row_header_inference(spark, tmp_path):
    p = tmp_path / "plain.tsv"
    p.write_text("x\ty\tlabel\n1.5\t2\ta\n2.5\t3\tb\n3.5\t4\ta\n")
    df = read_tab(spark, str(p))
    dom = Domain.from_df(df)
    assert dom["x"].var_type == TYPE_CONTINUOUS
    assert dom["label"].var_type == TYPE_DISCRETE
    assert df.count() == 3


def test_guess_data_type_rules():
    assert guess_data_type(["1.5", "2.5", "x"])[0] == TYPE_DISCRETE  # small set
    assert guess_data_type([str(i) for i in range(50)])[0] == TYPE_CONTINUOUS
    assert guess_data_type(["0", "1", "0", "1"]) == (TYPE_DISCRETE, ("0", "1"))
    assert guess_data_type(["2024-01-01", "2024-02-03"])[0] == TYPE_TIME
    t, vals = guess_data_type(["red", "green", "blue"])
    assert t == TYPE_DISCRETE and vals == ("blue", "green", "red")
    long_text = [f"this is sentence number {i}" for i in range(40)]
    assert guess_data_type(long_text)[0] == TYPE_STRING


def test_csv_sniff_and_types(spark, tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("a;b;c\n1.0;x;2024-01-01\n2.0;y;2024-01-02\n3.5;x;2024-01-03\n")
    df = read_csv(spark, str(p))
    dom = Domain.from_df(df)
    assert dom["a"].var_type == TYPE_CONTINUOUS
    assert dom["b"].var_type == TYPE_DISCRETE
    assert dom["c"].var_type == TYPE_TIME
    assert df.count() == 3
    assert df.selectExpr("sum(a)").collect()[0][0] == 6.5


def test_basket(spark, tmp_path):
    p = tmp_path / "b.basket"
    p.write_text("bread, butter=2, milk\nbutter, jam=0.5\n")
    long_df = read_basket(spark, str(p))
    assert long_df.count() == 5
    wide = basket_to_wide(long_df)
    row = {r["row_id"]: r for r in wide.collect()}
    first = [r for r in row.values() if r["bread"] == 1.0][0]
    assert first["butter"] == 2.0 and first["milk"] == 1.0 and first["jam"] == 0.0


def test_registry_dispatch(spark, sf_dir, tab_file):
    df = read_table(spark, f"{sf_dir}/region.parquet")
    assert df.count() == 5
    assert read_table(spark, tab_file).count() == 3
    with pytest.raises(ValueError):
        read_table(spark, "mystery.xyz")


def test_basket_sparse_vectors(spark, tmp_path):
    from orange3_spark.sources.basket import basket_to_sparse_vectors, read_basket

    p = tmp_path / "s.basket"
    p.write_text("bread, butter=2\nmilk=3\n")
    long_df = read_basket(spark, str(p))
    out = {r.row_id: r.features
           for r in basket_to_sparse_vectors(long_df).collect()}
    assert len(out) == 2
    v = [f for f in out.values() if f.numNonzeros() == 2][0]
    # keys sorted alphabetically: bread=0, butter=1, milk=2
    assert v[0] == 1.0 and v[1] == 2.0
    w = [f for f in out.values() if f.numNonzeros() == 1][0]
    assert w[2] == 3.0 and w.size == 3


def test_lenient_timestamp_formats(spark):
    """TimeVariable.parse parity (Orange/data/variable.py:937-985,1146):
    every _ISO_FORMATS/ADDITIONAL_FORMATS family parses; time-only values
    get the epoch date; plain numbers read as Unix seconds."""
    from orange3_spark.functions.timeparse import lenient_timestamp

    cases = [
        ("2021-11-25 14:30:05", "2021-11-25T14:30:05"),
        ("2021-11-25 14:30", "2021-11-25T14:30:00"),
        ("2021-11-25T14:30:05", "2021-11-25T14:30:05"),
        ("2021-11-25T14:30:05Z", "2021-11-25T14:30:05"),
        ("2021-11-25", "2021-11-25T00:00:00"),
        ("2021-11-25 14:30:05.25", "2021-11-25T14:30:05.250000"),
        ("20211125T143005", "2021-11-25T14:30:05"),
        ("20211125", "2021-11-25T00:00:00"),
        ("14:30:05", "1970-01-01T14:30:05"),
        ("14:30", "1970-01-01T14:30:00"),
        ("2021-11", "2021-11-01T00:00:00"),
        ("2021", "2021-01-01T00:00:00"),
        ("25.11.2021", "2021-11-25T00:00:00"),
        ("11/25/2021", "2021-11-25T00:00:00"),
        ("11/25/21", "2021-11-25T00:00:00"),
        ("1637850605", "2021-11-25T14:30:05"),  # unix seconds
        # Z-suffix on offset-LESS shapes: the reference rstrip('Z')s, so
        # these must parse via the stripped probes (ADVICE r2)
        ("2021-11-25Z", "2021-11-25T00:00:00"),
        ("14:30:05Z", "1970-01-01T14:30:05"),
        ("1637850605Z", "2021-11-25T14:30:05"),
        ("not a date", None),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], "raw string")
    got = {r.raw: r.ts for r in
           df.select("raw", lenient_timestamp("raw").alias("ts")).collect()}
    for raw, expect in cases:
        ts = got[raw]
        if expect is None:
            assert ts is None, raw
        else:
            assert ts is not None and ts.isoformat() == expect, (raw, ts)


def test_time_inference_extended_shapes():
    from orange3_spark.sources.infer import guess_data_type
    t, _ = guess_data_type(
        ["2021-11-25 14:30:05", "25.11.2021", "11/25/2021",
         "20211125T143005", "2021-11-25T14:30:05+0100"])
    assert t == "time"


def test_url_trimmers():
    from orange3_spark.sources.url import (
        normalize_url, trim_dropbox, trim_googledrive, trim_googlesheet,
        trim_url)

    assert (trim_googlesheet(
        "https://docs.google.com/spreadsheets/d/AbC-123_x/edit#gid=77")
        == "https://docs.google.com/spreadsheets/d/AbC-123_x/export"
           "?format=tsv&gid=77")
    assert (trim_googlesheet("docs.google.com/spreadsheets/d/AbC/edit")
            == "https://docs.google.com/spreadsheets/d/AbC/export?format=tsv")
    assert (trim_googledrive("https://drive.google.com/file/d/XYZ/view")
            == "https://drive.google.com/uc?export=download&id=XYZ")
    assert (trim_dropbox("https://www.dropbox.com/s/abc/f.csv?dl=0")
            == "https://www.dropbox.com/s/abc/f.csv?dl=1")
    # non-matching URLs pass through untouched
    assert trim_url("https://example.com/data.csv") == "https://example.com/data.csv"
    assert normalize_url("example.com/x.csv") == "http://example.com/x.csv"
    assert normalize_url("http://ex.com/č.csv") == "http://ex.com/%C4%8D.csv"


def test_url_reader_file_scheme(spark, tmp_path):
    from orange3_spark.sources.registry import read_table

    p = tmp_path / "t.csv"
    p.write_text("a;b;c\n1.0;x;2024-01-01\n2.0;y;2024-01-02\n3.5;x;2024-01-03\n")
    df = read_table(spark, f"file://{p}")
    rows = sorted(map(tuple, df.select("a", "b").collect()))
    assert rows == [(1.0, "x"), (2.0, "y"), (3.5, "x")]


def test_lenient_timestamp_z_is_utc_in_any_session_tz(spark):
    """A trailing Z is an explicit UTC offset — it must not be stripped
    and re-read as session-local wall clock."""
    from pyspark.sql import functions as F

    from orange3_spark.functions.timeparse import lenient_timestamp

    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = spark.createDataFrame([("2021-01-01T12:00:00Z",)], "s string")
        got = df.select(
            F.unix_timestamp(lenient_timestamp("s")).alias("e")).first()["e"]
        assert got == 1609502400          # 2021-01-01T12:00:00 UTC
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_xlsx_reader_malformed(spark, tmp_path):
    """A zip without workbook parts raises a real error, not a silent
    empty frame (the reader is self-contained — no openpyxl gate)."""
    import zipfile

    import pytest as _p

    from orange3_spark.sources.registry import read_table

    p = tmp_path / "mini.xlsx"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("xl/nothing.xml", "<x/>")
    with _p.raises(KeyError):
        read_table(spark, str(p))


def test_xlsx_roundtrip_values_and_types(spark, tmp_path):
    """Self-contained xlsx codec: typed numeric cells, inline strings with
    XML-special characters, NULLs, and sheet selection all survive."""
    from orange3_spark.sources.xlsx import read_xlsx, write_xlsx

    df = spark.createDataFrame(
        [(1, 2.5, "a<b&c", "x"), (2, None, "plain", None),
         (3, -0.125, "ünïcode", "y")],
        "k int, v double, s string, m string")
    path = str(tmp_path / "t.xlsx")
    write_xlsx(df, path, sheet="data")
    back = read_xlsx(spark, path)
    # k has 3 distinct numeric values -> Orange rules it DISCRETE (kept
    # as string), same as the reference's guess_data_type probe
    rows = {r["k"]: r for r in back.collect()}
    assert rows["1"]["s"] == "a<b&c"
    assert rows["2"]["v"] is None and rows["2"]["m"] is None
    assert rows["3"]["v"] == -0.125 and rows["3"]["s"] == "ünïcode"
    # named-sheet resolution
    assert read_xlsx(spark, path, sheet="data").count() == 3
    import pytest
    with pytest.raises(ValueError):
        read_xlsx(spark, path, sheet="nope")


def test_xlsx_writer_bounds(spark, tmp_path):
    from orange3_spark.sources.xlsx import write_xlsx
    import pytest

    with pytest.raises(ValueError, match="driver-side"):
        write_xlsx(spark.range(100), str(tmp_path / "big.xlsx"), max_rows=10)


def test_xlsx_extension_dispatch(spark, tmp_path):
    from orange3_spark.sources.registry import read_table
    from orange3_spark.sources.xlsx import write_xlsx

    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, s string")
    path = str(tmp_path / "d.xlsx")
    write_xlsx(df, path)
    assert read_table(spark, path).count() == 2


def test_csv_import_options(spark, tmp_path):
    """owcsvimport surface: encoding, quote/escape, skip_rows, na_values,
    per-column overrides (force string / force continuous / skip)."""
    p = tmp_path / "opts.csv"
    body = ('# preamble line to skip\n'
            'id;name;code;junk\n'
            '1;"Ann; the 1st";007;x\n'
            '2;Bé;008;y\n'
            '3;Cy;NA!;z\n')
    p.write_bytes(body.encode("latin-1"))
    from orange3_spark.sources.csv import read_csv

    df = read_csv(spark, str(p), sep=";", header=True, skip_rows=1,
                  encoding="ISO-8859-1", na_values=["NA!"],
                  column_types={"code": "string", "id": "continuous",
                                "junk": "skip"})
    assert df.columns == ["id", "name", "code"]
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1.0]["name"] == "Ann; the 1st"      # quoted sep survives
    assert rows[2.0]["name"] == "Bé"                # latin-1 decoded
    assert rows[1.0]["code"] == "007"               # forced string: no cast
    assert rows[3.0]["code"] is None                # custom NA token


def test_dst_write_read_roundtrip(spark, tmp_path):
    from orange3_spark.sources.dst import read_dst, write_dst

    pairs = spark.createDataFrame(
        [(10, 20, 1.5), (10, 30, 2.5), (20, 30, 0.25)],
        "id_a long, id_b long, dist double")
    p = tmp_path / "m.dst"
    write_dst(pairs, str(p))
    txt = p.read_text().splitlines()
    assert txt[0] == "3\taxis=1\trow_labels"
    assert txt[1].split("\t") == ["10", "0.0"]          # lower triangle
    assert txt[3].split("\t") == ["30", "2.5", "0.25", "0.0"]
    back = read_dst(spark, str(p))
    assert back.dst_meta == {"n": 3, "axis": 1, "symmetric": True}
    got = {(r["i"], r["j"]): (r["row_label"], r["dist"])
           for r in back.collect()}
    assert len(got) == 9                                 # full square
    assert got[(0, 1)] == ("10", 1.5) == (got[(1, 0)][0].replace("20", "10"),
                                          got[(1, 0)][1])  # mirrored
    assert got[(2, 2)] == ("30", 0.0)                    # zero diagonal


def test_dst_reader_reference_format_rules(spark, tmp_path):
    import pytest

    from orange3_spark.sources.dst import read_dst

    # asymmetric + col_labels + axis flag; short rows zero-pad
    p = tmp_path / "a.dst"
    p.write_text("3\taxis=0\tasymmetric\tcol_labels\trow_labels\n"
                 "c1\tc2\tc3\n"
                 "r1\t1.0\t2.0\t3.0\n"
                 "r2\t4.0\n"
                 "r3\t5.0\t6.0\t7.0\n")
    back = read_dst(spark, str(p))
    assert back.dst_meta == {"n": 3, "axis": 0, "symmetric": False}
    got = {(r["i"], r["j"]): r["dist"] for r in back.collect()}
    assert got[(0, 2)] == 3.0 and got[(2, 0)] == 5.0     # no mirroring
    assert got[(1, 1)] == 0.0                            # zero-padded
    labs = {(r["i"], r["j"]): (r["row_label"], r["col_label"])
            for r in back.collect()}
    assert labs[(1, 1)] == ("r2", "c2") and labs[(0, 2)] == ("r1", "c3")
    # symmetric: data above the diagonal is ignored, mirror wins
    q = tmp_path / "s.dst"
    q.write_text("2\n1.0\t9.0\n3.0\t1.0\n")
    got2 = {(r["i"], r["j"]): r["dist"]
            for r in read_dst(spark, str(q)).collect()}
    assert got2[(0, 1)] == 3.0 and got2[(1, 0)] == 3.0
    # error surface mirrors the reference
    bad = tmp_path / "bad.dst"
    bad.write_text("x 3\n")
    with pytest.raises(ValueError, match="begin with dimension"):
        read_dst(spark, str(bad))
    bad.write_text("2\tweird_flag\n")
    with pytest.raises(ValueError, match="invalid flag"):
        read_dst(spark, str(bad))
    bad.write_text("1\n1.0\n2.0\n")
    with pytest.raises(ValueError, match="too many rows"):
        read_dst(spark, str(bad))


def test_dst_xlsx_roundtrip_and_symmetricize(spark, tmp_path):
    from orange3_spark.sources.dst import read_dst_xlsx, write_dst_xlsx

    pairs = spark.createDataFrame(
        [("a", "b", 1.5), ("a", "c", 2.5), ("b", "c", 0.25)],
        "id_a string, id_b string, dist double")
    p = tmp_path / "m.xlsx"
    write_dst_xlsx(pairs, str(p))
    back = read_dst_xlsx(spark, str(p))
    assert back.dst_meta == {"n_rows": 3, "n_cols": 3,
                             "symmetricized": True}
    got = {(r["i"], r["j"]): (r["row_label"], r["dist"])
           for r in back.collect()}
    assert len(got) == 9
    assert got[(1, 0)] == ("b", 1.5)            # stored lower triangle
    assert got[(0, 1)] == ("a", 1.5)            # mirrored upper
    assert got[(2, 2)] == ("c", 0.0)            # padded zero diagonal
    assert got[(2, 0)][1] == 2.5 and got[(0, 2)][1] == 2.5


def test_dst_xlsx_label_detection_and_no_symmetricize(spark, tmp_path):
    from orange3_spark.sources.dst import read_dst_xlsx
    from orange3_spark.sources.xlsx import write_grid

    p = tmp_path / "full.xlsx"
    # col labels + row labels + FULL square: nothing to symmetricize
    write_grid(str(p), [[None, "x", "y"],
                        ["x", 0.0, 3.0],
                        ["y", 7.0, 0.0]])
    back = read_dst_xlsx(spark, str(p))
    assert back.dst_meta["symmetricized"] is False
    got = {(r["i"], r["j"]): (r["row_label"], r["col_label"], r["dist"])
           for r in back.collect()}
    assert got[(0, 1)] == ("x", "y", 3.0)
    assert got[(1, 0)] == ("y", "x", 7.0)       # kept asymmetric
    # all-numeric grid: NO labels detected (reference contract)
    q = tmp_path / "plain.xlsx"
    write_grid(str(q), [[0.0, 1.0], [1.0, 0.0]])
    back2 = read_dst_xlsx(spark, str(q))
    assert "row_label" not in back2.columns
    assert back2.count() == 4
