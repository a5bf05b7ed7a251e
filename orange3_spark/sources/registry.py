"""Reader registry: dispatch by extension (``Orange/data/io_base.py:701-771``
``FileFormat`` registry; ``Table.from_file`` ``table.py:1096-1120``).

Parquet is the engine's native persisted form (replacing the reference's
pickle, ``io.py:199-220``); the xlsx reader/writer is self-contained
(stdlib zip+XML, ``sources/xlsx.py``) so no optional dependency gates it.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

READERS = {}


def reader(*exts):
    def deco(fn):
        for e in exts:
            READERS[e] = fn
        return fn
    return deco


@reader(".parquet")
def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    from orange3_spark.session import _read_parquet as rp
    return rp(spark, path)


@reader(".tab", ".tsv")
def _read_tab(spark: SparkSession, path: str) -> DataFrame:
    from orange3_spark.sources.tab import read_tab
    return read_tab(spark, path)


@reader(".csv", ".csv.gz")
def _read_csv(spark: SparkSession, path: str) -> DataFrame:
    from orange3_spark.sources.csv import read_csv
    return read_csv(spark, path)


@reader(".basket")
def _read_basket(spark: SparkSession, path: str) -> DataFrame:
    from orange3_spark.sources.basket import read_basket
    return read_basket(spark, path)


@reader(".json", ".jsonl")
def _read_json(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.json(path)


@reader(".orc")
def _read_orc(spark: SparkSession, path: str) -> DataFrame:
    # columnar interchange with the Hive/Trino world; fully distributed
    return spark.read.orc(path)


@reader(".xlsx")
def _read_xlsx(spark: SparkSession, path: str) -> DataFrame:
    # driver-side: excel is small-data by construction (io.py:246-389);
    # self-contained zip+XML parser, no openpyxl dependency
    from orange3_spark.sources.xlsx import read_xlsx
    return read_xlsx(spark, path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Extension-dispatched read — the ``Table(name)`` entry point.
    URLs (http/https/file, or share links io.py:409-513) route through
    the UrlReader."""
    if re.match(r"^(https?|file)://", path) or re.match(
            r"^(www\.)?(docs\.google\.com|drive\.google\.com|"
            r"[-\w.]*dropbox\.com)/", path):
        from orange3_spark.sources.url import read_url
        return read_url(spark, path)
    base = path.lower()
    for ext in sorted(READERS, key=len, reverse=True):
        if base.endswith(ext):
            return READERS[ext](spark, path)
    raise ValueError(f"no reader for {os.path.basename(path)}; "
                     f"known: {sorted(READERS)}")
