"""CSV reader with dialect sniffing + Orange type inference.

Reference: ``Orange/data/io.py:120-190`` (``CSVReader`` sniffs delimiter and
header shape, then runs ``guess_data_type`` per column).  Spark already has
a distributed csv scan; this layer adds the driver-side sniff (bounded read
of the first KBs) and the Orange typing/metadata pass on a sample.
"""

from __future__ import annotations

import csv as _csv

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orange3_spark.domain import (
    ROLE_ATTRIBUTE, ROLE_META, TYPE_CONTINUOUS, TYPE_DISCRETE, TYPE_STRING,
    TYPE_TIME, Variable, with_domain,
)
from orange3_spark.sources.infer import guess_data_type
from orange3_spark.sources.tab import MISSING_TOKENS


def sniff_dialect(path: str, sample_bytes: int = 64 * 1024) -> tuple[str, bool]:
    """→ (delimiter, has_header) from a bounded driver-side read."""
    with open(path, "r", encoding="utf-8", errors="replace") as fh:
        sample = fh.read(sample_bytes)
    try:
        dialect = _csv.Sniffer().sniff(sample, delimiters=",;\t|")
        delim = dialect.delimiter
    except _csv.Error:
        delim = ","
    try:
        has_header = _csv.Sniffer().has_header(sample)
    except _csv.Error:
        has_header = True
    return delim, has_header


def read_csv(spark: SparkSession, path: str, *,
             sep: str | None = None, header: bool | None = None,
             sample_rows: int = 1000) -> DataFrame:
    """Distributed csv scan + sampled Orange type inference.

    The scan itself is ``spark.read.csv`` (splittable, pushdown-capable —
    including .gz via Hadoop codecs, though gzip is not splittable); only
    the sniff and the type probe touch the driver.
    """
    if sep is None or header is None:
        s_sep, s_header = sniff_dialect(path)
        sep = sep if sep is not None else s_sep
        header = header if header is not None else s_header

    df = spark.read.csv(path, sep=sep, header=header, inferSchema=False)
    return infer_and_type(df, sample_rows=sample_rows)


def infer_and_type(df: DataFrame, *, sample_rows: int = 1000) -> DataFrame:
    """Sampled Orange type inference + typed casts over a string-typed
    frame — shared by the csv and xlsx readers (``io_util.py:153-192``
    applies the same probe regardless of source format)."""
    sample = df.limit(sample_rows).collect()
    variables, cols = [], []
    for i, name in enumerate(df.columns):
        vals = [r[i] for r in sample
                if r[i] is not None and r[i] not in MISSING_TOKENS]
        var_type, values = guess_data_type(vals)
        role = ROLE_META if var_type == TYPE_STRING else ROLE_ATTRIBUTE
        variables.append(Variable(name, var_type, role, values=values))
        c = F.col(name)
        c = F.when(c.isin(list(MISSING_TOKENS)), None).otherwise(c)
        if var_type == TYPE_CONTINUOUS:
            c = c.cast("double")
        elif var_type == TYPE_TIME:
            from orange3_spark.functions.timeparse import lenient_timestamp
            c = lenient_timestamp(c)
        cols.append(c.alias(name))
    return with_domain(df.select(*cols), variables)
