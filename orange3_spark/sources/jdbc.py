"""JDBC source: the ``SqlTable`` analog (``Orange/data/sql/table.py``).

The reference proxies a PostgreSQL/MSSQL table and composes SQL fragments
per filter/aggregate (its own pushdown engine, ``sql/table.py:476-544``).
Spark's JDBC source IS that machinery generalized: Catalyst pushes
predicates/column pruning/aggregates (Spark 3.4+ with
``pushDownAggregate``) into the remote database, and partitioned reads
parallelize the scan — the reference's 1-16 connection pool becomes
``numPartitions`` bounded parallel cursors.

No database is reachable in this environment; this wrapper is the
documented, import-safe surface (options mirror the reference's knobs) and
is exercised only for its option plumbing.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(spark: SparkSession, url: str, table: str, *,
              user: Optional[str] = None, password: Optional[str] = None,
              partition_column: Optional[str] = None,
              lower_bound=None, upper_bound=None, num_partitions: int = 8,
              push_down_aggregate: bool = True,
              fetch_size: int = 10_000) -> DataFrame:
    """Lazy remote table (dialect handled by the JDBC driver).

    ``partition_column`` + bounds split the scan into ``num_partitions``
    range queries — the scalable path for big remote tables; without it the
    read is a single cursor (the reference's situation, ``AUTO_DL_LIMIT``).
    """
    reader = (spark.read.format("jdbc")
              .option("url", url)
              .option("dbtable", table)
              .option("fetchsize", str(fetch_size))
              .option("pushDownPredicate", "true")
              .option("pushDownAggregate", str(push_down_aggregate).lower()))
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    if partition_column is not None:
        reader = (reader.option("partitionColumn", partition_column)
                  .option("lowerBound", str(lower_bound))
                  .option("upperBound", str(upper_bound))
                  .option("numPartitions", str(num_partitions)))
    return reader.load()
