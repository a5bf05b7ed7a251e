"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` pair every implemented operator from SURVEY.md §2 with a
DuckDB oracle for the t2 correctness gate.  The actual definitions live in
``orange3_spark/plans/queries_*.py`` (registry pattern).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# importing the modules populates the registry
import orange3_spark.plans.queries_analytics  # noqa: F401
import orange3_spark.plans.queries_core  # noqa: F401
import orange3_spark.plans.queries_media  # noqa: F401
import orange3_spark.plans.queries_ml  # noqa: F401
import orange3_spark.plans.queries_preprocess  # noqa: F401
import orange3_spark.plans.queries_stats  # noqa: F401
import orange3_spark.plans.queries_streaming  # noqa: F401
import orange3_spark.plans.queries_text  # noqa: F401
from orange3_spark.plans.registry import ORACLE, QUERIES

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q1_filter_groupby"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
