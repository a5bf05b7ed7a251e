"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` pair every implemented operator from SURVEY.md §2 with a
DuckDB oracle for the t2 correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from orange3_spark.session import load_tables
from orange3_spark.operators.filters import (
    ContinuousOps,
    FilterContinuous,
)
from orange3_spark.operators import groupby as G

SF0001 = "/root/testdata/sf0.001"


# --------------------------------------------------------------------------
# flagship: TPC-H-Q1-shaped — FilterContinuous + groupby/aggregate
# (SURVEY.md §7 step 2; reference vocabulary: Orange/data/filter.py +
# Orange/data/aggregate.py)
# --------------------------------------------------------------------------

def _q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    li = FilterContinuous("l_shipdate", ContinuousOps.LESS_EQUAL,
                          "1998-09-02")(li)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    out = G.aggregate(
        li.withColumn("_disc_price", disc_price).withColumn("_charge", charge),
        ["l_returnflag", "l_linestatus"],
        {
            "l_quantity": [("sum", "sum_qty"), ("mean", "avg_qty")],
            "l_extendedprice": [("sum", "sum_base_price"), ("mean", "avg_price")],
            "_disc_price": [("sum", "sum_disc_price")],
            "_charge": [("sum", "sum_charge")],
            "l_discount": [("mean", "avg_disc")],
            "l_orderkey": [("count", "count_order")],
        },
    )
    return out.select(
        "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
        "sum_disc_price", "sum_charge", "avg_qty", "avg_price", "avg_disc",
        "count_order")


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity)                                        AS sum_qty,
       sum(l_extendedprice)                                   AS sum_base_price,
       sum(l_extendedprice * (1 - l_discount))                AS sum_disc_price,
       sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))  AS sum_charge,
       avg(l_quantity)                                        AS avg_qty,
       avg(l_extendedprice)                                   AS avg_price,
       avg(l_discount)                                        AS avg_disc,
       count(*)                                               AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q1(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {"q1_filter_groupby": _q1}


def oracle_sql() -> dict[str, str]:
    return {"q1_filter_groupby": _Q1_SQL}
