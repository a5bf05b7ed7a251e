"""Native `.tab` / `.tsv` reader-writer: Orange's 3-row-header format on Spark.

Reference format (``Orange/data/io_base.py:117-207`` header parse, ``Flags``
``io_base.py:40-90``, builder ``io_base.py:209-399``):

  row 1: variable names
  row 2: types — ``continuous|c``, ``discrete|d``, ``string|s``,
         ``time|t``, ``basket``, or a space-separated list of category
         values (discrete with explicit value order)
  row 3: flags — ``class``, ``meta``, ``ignore``, ``weight``, and free-form
         ``key=value`` attribute annotations

1-row (names only, types inferred) and 0-row headers are supported like the
reference (``io_base.py:400-556``).  Missing cells: ``?``, ``.``, ``~``,
``NA``, ``*`` or empty (``io_util.py``).

Spark shape: the 3 header lines are read driver-side (a bounded O(1) read);
the DATA path is a distributed ``spark.read.csv`` with an explicit schema —
at 100 TB the header probe stays tiny while the scan parallelizes.  Types
land in the column metadata layer (:mod:`orange3_spark.domain`).
"""

from __future__ import annotations

import csv
import io
import os
from typing import Iterable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from orange3_spark.domain import (
    Domain, META_KEY, ROLE_ATTRIBUTE, ROLE_CLASS, ROLE_META, ROLE_WEIGHT,
    TYPE_CONTINUOUS, TYPE_DISCRETE, TYPE_STRING, TYPE_TIME, Variable,
    with_domain,
)
from orange3_spark.sources.infer import guess_data_type

MISSING_TOKENS = {"?", ".", "~", "NA", "*", ""}

_TYPE_ALIASES = {
    "continuous": TYPE_CONTINUOUS, "c": TYPE_CONTINUOUS,
    "discrete": TYPE_DISCRETE, "d": TYPE_DISCRETE,
    "string": TYPE_STRING, "s": TYPE_STRING, "text": TYPE_STRING,
    "time": TYPE_TIME, "t": TYPE_TIME,
}

_FLAG_ROLES = {"class": ROLE_CLASS, "c": ROLE_CLASS,
               "meta": ROLE_META, "m": ROLE_META,
               "weight": ROLE_WEIGHT, "w": ROLE_WEIGHT}


def _head_lines(path: str, n: int = 3) -> list[str]:
    with open(path, "r", encoding="utf-8", newline="") as fh:
        return [fh.readline().rstrip("\r\n") for _ in range(n)]


def _split(line: str, sep: str) -> list[str]:
    return next(csv.reader(io.StringIO(line), delimiter=sep))


def detect_header_rows(lines: list[str], sep: str) -> int:
    """3 if row2 looks like types and row3 like flags; 1 if row1 is
    non-numeric names; else 0 (``io_base.py:400-556`` heuristic)."""
    if len(lines) >= 3 and lines[0]:
        types = _split(lines[1], sep)
        flags = _split(lines[2], sep)
        type_ok = all(t.strip() == "" or t.strip().lower() in _TYPE_ALIASES
                      or " " in t.strip() for t in types)
        flag_ok = all(f.strip() == "" or all(
            p in _FLAG_ROLES or p in ("ignore", "i") or "=" in p
            for p in f.strip().split()) for f in flags)
        if type_ok and flag_ok and types:
            return 3
    if lines and lines[0]:
        first = _split(lines[0], sep)
        def _num(s):
            try:
                float(s)
                return True
            except ValueError:
                return False
        if not any(_num(c) for c in first if c.strip()):
            return 1
    return 0


def parse_three_row_header(names: list[str], types: list[str],
                           flags: list[str]) -> tuple[list[Variable], list[bool]]:
    """→ (variables, keep-mask) honoring the ``ignore`` flag."""
    variables: list[Variable] = []
    keep: list[bool] = []
    for i, name in enumerate(names):
        t = (types[i] if i < len(types) else "").strip()
        f = (flags[i] if i < len(flags) else "").strip()
        parts = f.split() if f else []
        role = ROLE_ATTRIBUTE
        attrs: dict = {}
        ignored = False
        for p in parts:
            if p in ("ignore", "i"):
                ignored = True
            elif p in _FLAG_ROLES:
                role = _FLAG_ROLES[p]
            elif "=" in p:
                k, v = p.split("=", 1)
                attrs[k] = v
        tl = t.lower()
        if tl in _TYPE_ALIASES:
            var_type, values = _TYPE_ALIASES[tl], None
        elif t == "":
            var_type, values = TYPE_STRING, None   # inferred later
        else:
            var_type, values = TYPE_DISCRETE, tuple(t.split(" "))
        if var_type == TYPE_STRING and role == ROLE_ATTRIBUTE and tl in ("s", "string", "text"):
            role = ROLE_META   # strings default to metas (io inference rule)
        variables.append(Variable(name or f"var{i:04d}", var_type, role,
                                  values=values, attributes=attrs))
        keep.append(not ignored)
    return variables, keep


def _spark_type(v: Variable) -> T.DataType:
    return v.spark_type()


def read_tab(spark: SparkSession, path: str, sep: str = "\t") -> DataFrame:
    """Read a ``.tab``/``.tsv`` file into a metadata-carrying DataFrame."""
    lines = _head_lines(path)
    n_header = detect_header_rows(lines, sep)

    if n_header == 3:
        names = _split(lines[0], sep)
        variables, keep = parse_three_row_header(
            names, _split(lines[1], sep), _split(lines[2], sep))
    elif n_header == 1:
        names = _split(lines[0], sep)
        variables = [Variable(n, TYPE_STRING) for n in names]
        keep = [True] * len(names)
    else:
        width = len(_split(lines[0], sep)) if lines[0] else 0
        names = [f"var{i:04d}" for i in range(width)]
        variables = [Variable(n, TYPE_STRING) for n in names]
        keep = [True] * width

    # distributed data scan: everything as string first, then typed casts
    raw_schema = T.StructType(
        [T.StructField(v.name, T.StringType(), True) for v in variables])
    df = spark.read.csv(path, sep=sep, schema=raw_schema,
                        enforceSchema=True, mode="PERMISSIVE")
    # drop the header rows: Spark's csv reader can only skip ONE header line,
    # so filter out rows whose every cell equals a header line's cells
    if n_header:
        hdr_vals = [_split(lines[i], sep) for i in range(n_header)]
        for row in hdr_vals:
            cond = None
            for v, cell in zip(variables, row + [""] * (len(variables) - len(row))):
                c = F.coalesce(F.col(v.name).cast("string"), F.lit(""))
                eq = c == F.lit(cell)
                cond = eq if cond is None else (cond & eq)
            df = df.filter(~cond)

    # type inference for columns the header left untyped (1/0-row headers)
    if n_header < 3:
        sample = df.limit(1000).collect()
        inferred = []
        for i, v in enumerate(variables):
            col_vals = [r[i] for r in sample if r[i] is not None
                        and r[i] not in MISSING_TOKENS]
            var_type, values = guess_data_type(col_vals)
            role = ROLE_META if var_type == TYPE_STRING else ROLE_ATTRIBUTE
            inferred.append(Variable(v.name, var_type, role, values=values))
        variables = inferred

    cols = []
    for v, k in zip(variables, keep):
        if not k:
            continue
        c = F.col(v.name)
        c = F.when(c.isin(list(MISSING_TOKENS)), None).otherwise(c)
        if v.var_type == TYPE_CONTINUOUS:
            c = c.cast("double")
        elif v.var_type == TYPE_TIME:
            from orange3_spark.functions.timeparse import lenient_timestamp
            c = lenient_timestamp(c)
        cols.append(c.alias(v.name))
    out = df.select(*cols)
    return with_domain(out, [v for v, k in zip(variables, keep) if k])


def _type_cell(v: Variable) -> str:
    if v.is_discrete and v.values:
        return " ".join(v.values)
    return v.var_type


def _flag_cell(v: Variable) -> str:
    parts = []
    if v.role == ROLE_CLASS:
        parts.append("class")
    elif v.role == ROLE_META:
        parts.append("meta")
    elif v.role == ROLE_WEIGHT:
        parts.append("weight")
    parts += [f"{k}={val}" for k, val in (v.attributes or {}).items()]
    return " ".join(parts)


def write_tab(df: DataFrame, path: str, sep: str = "\t",
              max_rows: int = 1_000_000) -> None:
    """Write the 3-row-annotated format (``io_base.py:596-699``).

    Driver-side single file — .tab is the reference's small-data interchange
    format; the engine's scalable sink is parquet (``df.write.parquet``)."""
    n = df.count()
    if n > max_rows:
        raise ValueError(f".tab writer is driver-side; {n} rows > {max_rows}."
                         " Use df.write.parquet for large data.")
    domain = Domain.from_df(df)
    vs = {v.name: v for v in domain}
    variables = [vs[c] for c in df.columns]
    with open(path, "w", encoding="utf-8", newline="") as fh:
        w = csv.writer(fh, delimiter=sep, lineterminator="\n")
        w.writerow([v.name for v in variables])
        w.writerow([_type_cell(v) for v in variables])
        w.writerow([_flag_cell(v) for v in variables])
        for row in df.collect():
            out = []
            for v, cell in zip(variables, row):
                if cell is None:
                    out.append("?")
                elif v.is_time and hasattr(cell, "isoformat"):
                    out.append(cell.isoformat(sep=" "))
                else:
                    out.append(cell)
            w.writerow(out)
