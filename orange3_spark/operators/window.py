"""Window / ranking functions — extension surface beyond the reference.

The reference has no row-window aggregates (SURVEY §2.6: none — the nearest
analogues are Unique's tiebreakers and feature ranking).  On Spark these are
native and cheap, so the engine exposes them as first-class operators; Unique
(reshape.unique) is built on them.

All helpers take explicit partition/order columns — an unordered distributed
DataFrame has no implicit row order to window over.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _win(partition_by: Sequence[str], order_by: Sequence[str]):
    w = Window.partitionBy(*partition_by) if partition_by else Window.partitionBy()
    return w.orderBy(*order_by)


def with_row_number(df: DataFrame, partition_by: Sequence[str],
                    order_by: Sequence[str], name: str = "rn") -> DataFrame:
    return df.withColumn(name, F.row_number().over(_win(partition_by, order_by)))


def with_rank(df: DataFrame, partition_by: Sequence[str],
              order_by: Sequence[str], name: str = "rank",
              dense: bool = False) -> DataFrame:
    fn = F.dense_rank() if dense else F.rank()
    return df.withColumn(name, fn.over(_win(partition_by, order_by)))


def with_lag(df: DataFrame, col: str, partition_by: Sequence[str],
             order_by: Sequence[str], offset: int = 1,
             name: Optional[str] = None) -> DataFrame:
    name = name or f"{col}_lag{offset}"
    return df.withColumn(name, F.lag(col, offset).over(_win(partition_by, order_by)))


def with_lead(df: DataFrame, col: str, partition_by: Sequence[str],
              order_by: Sequence[str], offset: int = 1,
              name: Optional[str] = None) -> DataFrame:
    name = name or f"{col}_lead{offset}"
    return df.withColumn(name, F.lead(col, offset).over(_win(partition_by, order_by)))


def with_rolling(df: DataFrame, col: str, agg: str,
                 partition_by: Sequence[str], order_by: Sequence[str],
                 preceding: int = 2, following: int = 0,
                 name: Optional[str] = None) -> DataFrame:
    """Rolling frame aggregate (rows between)."""
    name = name or f"{col}_{agg}_roll"
    w = _win(partition_by, order_by).rowsBetween(-preceding, following)
    expr: Column = {
        "sum": F.sum(col), "mean": F.avg(col), "min": F.min(col),
        "max": F.max(col), "count": F.count(col),
    }[agg]
    return df.withColumn(name, expr.over(w))


def with_cumulative(df: DataFrame, col: str, agg: str,
                    partition_by: Sequence[str], order_by: Sequence[str],
                    name: Optional[str] = None) -> DataFrame:
    name = name or f"{col}_{agg}_cum"
    w = _win(partition_by, order_by).rowsBetween(Window.unboundedPreceding, 0)
    expr: Column = {"sum": F.sum(col), "mean": F.avg(col), "min": F.min(col),
                    "max": F.max(col), "count": F.count(col)}[agg]
    return df.withColumn(name, expr.over(w))


def top_k_per_group(df: DataFrame, partition_by: Sequence[str],
                    order_by: Sequence[str], k: int) -> DataFrame:
    """Top-k rows per group — one shuffle, rank-filter.  Always pass a
    deterministic tiebreaker in ``order_by`` for reproducible output."""
    return (with_row_number(df, partition_by, order_by, "_rn")
            .filter(F.col("_rn") <= k).drop("_rn"))
