"""Bucketed storage: co-located joins and aggregations without shuffles.

No reference equivalent (single-process engine) — this is the 100 TB
storage-layout feature: writing fact tables bucketed on their join/group
keys means every later equi-join or groupBy on those keys reads
pre-partitioned data and skips the Exchange entirely.  At 1000 executors
the shuffle of a 100 TB fact table IS the bottleneck; bucketing pays that
cost once at write time.

Uses the session catalog's managed-table API (``bucketBy`` is only valid
with ``saveAsTable``); the warehouse dir is set in session.py.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, keys: Sequence[str],
                   num_buckets: int, *,
                   sort_by: Optional[Sequence[str]] = None,
                   mode: str = "overwrite") -> None:
    """Persist as a parquet table bucketed (and optionally sorted) on
    ``keys``.  Pick ``num_buckets`` ≈ cluster cores × small factor; both
    sides of a co-located join must use the SAME bucket count."""
    if mode == "overwrite":
        # a fresh session's catalog doesn't know about tables written by a
        # previous process, but their warehouse directories persist — drop
        # both, or saveAsTable fails with LOCATION_ALREADY_EXISTS
        import shutil

        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        wh = spark.conf.get("spark.sql.warehouse.dir", "")
        loc = os.path.join(wh.removeprefix("file:"), table.lower())
        shutil.rmtree(loc, ignore_errors=True)
    w = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *keys)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def is_exchange_free_join(left: DataFrame, right: DataFrame,
                          on: Sequence[str]) -> tuple[DataFrame, bool]:
    """Join + report whether the plan shuffles either side — the bucketing
    acceptance check (used by tests; returns the joined frame too)."""
    joined = left.join(right, list(on))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return joined, "Exchange" not in plan
