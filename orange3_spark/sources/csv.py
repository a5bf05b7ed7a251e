"""CSV reader with dialect sniffing + Orange type inference.

Reference: ``Orange/data/io.py:120-190`` (``CSVReader`` sniffs delimiter and
header shape, then runs ``guess_data_type`` per column).  Spark already has
a distributed csv scan; this layer adds the driver-side sniff (bounded read
of the first KBs) and the Orange typing/metadata pass on a sample.
"""

from __future__ import annotations

import csv as _csv
from typing import Mapping, Sequence  # noqa: F401  (doc-typed params)

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
             sample_rows: int = 1000, encoding: str = "UTF-8",
             quote: str = '"', escape: str = '"',
             skip_rows: int = 0,
             na_values: "Sequence[str] | None" = None,
             column_types: "Mapping[str, str] | None" = None) -> DataFrame:
    """Distributed csv scan + sampled Orange type inference, with the
    import-wizard option surface (``Orange/widgets/data/owcsvimport.py``):
    ``encoding``, ``quote``/``escape`` chars, ``skip_rows`` (leading
    comment/preamble lines), extra ``na_values`` tokens, and
    ``column_types`` per-column overrides — ``continuous | discrete |
    string | time | skip`` — that pin a column's ruling instead of the
    sampled probe (``skip`` drops it).

    The scan itself is ``spark.read.csv`` (splittable, pushdown-capable —
    including .gz via Hadoop codecs, though gzip is not splittable); only
    the sniff and the type probe touch the driver.
    """
    if sep is None or header is None:
        s_sep, s_header = sniff_dialect(path)
        sep = sep if sep is not None else s_sep
        header = header if header is not None else s_header

    if not skip_rows:
        df = spark.read.csv(path, sep=sep, header=header, inferSchema=False,
                            encoding=encoding, quote=quote, escape=escape)
    else:
        # A preamble line can have fewer separators than the table, and
        # Spark sizes the row schema from the FIRST line — so read whole
        # lines (sentinel sep, quoting off; the outer csv reader still
        # honors ``encoding``), drop the preamble by file-order index, lift
        # the header on the driver (one tiny row), and parse the remaining
        # lines distributed with ``from_csv`` (splittable, no driver data).
        lines = spark.read.csv(path, sep="\x01", header=False,
                               encoding=encoding, quote="")
        line_col = lines.columns[0]
        # Splittable line index — NO global window (row_number over an
        # unpartitioned window collapses the whole file into one task):
        # partition-local record number (the lower 33 bits of
        # monotonically_increasing_id, per its documented layout) plus
        # cumulative per-partition offsets from one small count job.
        # File splits are byte-ranges in order, so partition id order is
        # line order; the index is stable across the re-scan because the
        # same file yields the same splits.
        lines = (lines
                 .withColumn("__pid", F.spark_partition_id())
                 .withColumn("__mid", F.monotonically_increasing_id()))
        counts = {r["__pid"]: r["n"] for r in
                  lines.groupBy("__pid")
                       .agg(F.count(F.lit(1)).alias("n")).collect()}
        acc, offs = 0, {}
        for pid in sorted(counts):
            offs[pid] = acc
            acc += counts[pid]
        if not offs:                       # empty file: keep the map valid
            offs = {0: 0}
        off = F.create_map(*[F.lit(v) for kv in offs.items()
                             for v in kv])[F.col("__pid")]
        local = (F.col("__mid")
                 - F.shiftleft(F.col("__pid").cast("long"), 33))
        lines = (lines
                 .withColumn("__i", (off + local + F.lit(1)).cast("long"))
                 .drop("__pid", "__mid")
                 .filter(F.col("__i") > skip_rows))
        first_kept = F.col("__i") == skip_rows + 1
        if header:
            head_line = lines.filter(first_kept).collect()[0][line_col]
            names = next(_csv.reader([head_line], delimiter=sep,
                                     quotechar=quote or '"'))
            lines = lines.filter(F.col("__i") > skip_rows + 1)
        else:
            n_fields = len(next(_csv.reader(
                [lines.filter(first_kept).collect()[0][line_col]],
                delimiter=sep, quotechar=quote or '"')))
            names = [f"_c{j}" for j in range(n_fields)]
        schema = ", ".join(f"`{n}` STRING" for n in names)
        parsed = F.from_csv(F.col(line_col), F.lit(schema),
                            {"sep": sep, "quote": quote, "escape": escape})
        df = lines.select(parsed.alias("__s")).select("__s.*")
    return infer_and_type(df, sample_rows=sample_rows,
                          na_values=na_values, column_types=column_types)


def infer_and_type(df: DataFrame, *, sample_rows: int = 1000,
                   na_values: "Sequence[str] | None" = None,
                   column_types: "Mapping[str, str] | None" = None
                   ) -> DataFrame:
    """Sampled Orange type inference + typed casts over a string-typed
    frame — shared by the csv and xlsx readers (``io_util.py:153-192``
    applies the same probe regardless of source format).  ``column_types``
    overrides the probe per column (owcsvimport's per-column type hints);
    ``na_values`` extends the missing-token set."""
    missing = set(MISSING_TOKENS) | set(na_values or ())
    overrides = dict(column_types or {})
    sample = df.limit(sample_rows).collect()
    variables, cols = [], []
    for i, name in enumerate(df.columns):
        forced = overrides.get(name)
        if forced == "skip":
            continue
        vals = [r[i] for r in sample
                if r[i] is not None and r[i] not in missing]
        var_type, values = guess_data_type(vals)
        if forced is not None:
            if forced not in (TYPE_CONTINUOUS, TYPE_DISCRETE, TYPE_STRING,
                              TYPE_TIME):
                raise ValueError(f"unknown column type override {forced!r}")
            var_type = forced
            values = sorted(set(vals)) if forced == TYPE_DISCRETE else None
        role = ROLE_META if var_type == TYPE_STRING else ROLE_ATTRIBUTE
        variables.append(Variable(name, var_type, role, values=values))
        c = F.col(name)
        c = F.when(c.isin(list(missing)), None).otherwise(c)
        if var_type == TYPE_CONTINUOUS:
            c = c.cast("double")
        elif var_type == TYPE_TIME:
            from orange3_spark.functions.timeparse import lenient_timestamp
            c = lenient_timestamp(c)
        cols.append(c.alias(name))
    return with_domain(df.select(*cols), variables)
