"""Row-wise aggregates over a set of columns (Aggregate Columns widget).

Reference: ``Orange/widgets/data/owaggregatecolumns.py:53-60,211-227`` —
per-row Sum, Product, Min, Max, Mean, Variance, Median, Count non-zero over
selected columns, ignoring missing values (numpy nan* semantics).

Spark shape: a single array-of-columns expression per aggregate, evaluated
row-locally inside codegen — no shuffle, no UDF.  One level of higher-order
functions over a k-element literal array is cheap (contrast the MinHash
lesson in ``text/dedup.py``: *nested* HOFs over data-sized arrays fall off
codegen; these arrays have len(columns) elements, a compile-time constant).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _defined(cols: Sequence[str]) -> Column:
    """Non-null values of the selected columns, as array<double>."""
    return F.filter(F.array(*[F.col(c).cast("double") for c in cols]),
                    lambda x: x.isNotNull())


def _empty_to_null(arr: Column, out: Column) -> Column:
    # all-missing row → missing result (numpy nansum would give 0; Orange's
    # widget masks all-nan rows to nan, owaggregatecolumns.py:211-227)
    return F.when(F.size(arr) == 0, F.lit(None).cast("double")).otherwise(out)


def row_sum(cols: Sequence[str]) -> Column:
    a = _defined(cols)
    return _empty_to_null(a, F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x))


def row_product(cols: Sequence[str]) -> Column:
    a = _defined(cols)
    return _empty_to_null(a, F.aggregate(a, F.lit(1.0), lambda acc, x: acc * x))


def row_min(cols: Sequence[str]) -> Column:
    return F.array_min(_defined(cols))


def row_max(cols: Sequence[str]) -> Column:
    return F.array_max(_defined(cols))


def row_mean(cols: Sequence[str]) -> Column:
    a = _defined(cols)
    return _empty_to_null(
        a, F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x) / F.size(a))


def row_var(cols: Sequence[str]) -> Column:
    """Population variance (ddof=0, matching numpy ``nanvar``)."""
    a = _defined(cols)
    n = F.size(a)
    s = F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x)
    ss = F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    return F.when(n == 0, F.lit(None).cast("double")) \
            .otherwise(ss / n - (s / n) * (s / n))


def row_median(cols: Sequence[str]) -> Column:
    """Median with the standard even-count average of the two middles."""
    a = F.array_sort(_defined(cols))
    n = F.size(a)
    mid = (n / 2).cast("int")
    odd = F.element_at(a, mid + 1)
    even = (F.element_at(a, mid) + F.element_at(a, mid + 1)) / 2.0
    return F.when(n == 0, F.lit(None).cast("double")) \
            .otherwise(F.when(n % 2 == 1, odd).otherwise(even))


def row_count_nonzero(cols: Sequence[str]) -> Column:
    return F.size(F.filter(_defined(cols), lambda x: x != 0.0)).cast("long")


ROW_AGGS = {
    "sum": row_sum,
    "product": row_product,
    "min": row_min,
    "max": row_max,
    "mean": row_mean,
    "var": row_var,
    "median": row_median,
    "count_nonzero": row_count_nonzero,
}


def aggregate_columns(df, cols: Sequence[str], aggs: Sequence[str],
                      prefix: str = "row_"):
    """Append one derived column per requested aggregate."""
    out = df
    for a in aggs:
        out = out.withColumn(f"{prefix}{a}", ROW_AGGS[a](cols))
    return out
