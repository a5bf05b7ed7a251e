"""Deterministic sketches: KMV distinct-count and Count-Min frequency.

At 100 TB, exact `count(DISTINCT x)` and exact per-item frequencies are
full-shuffle aggregations over unbounded key spaces; the classic answer
is a BOUNDED-STATE sketch (Bar-Yossef et al. 2002 KMV; Cormode &
Muthukrishnan 2005 CMS).  Spark ships HLL++ (`approx_count_distinct`),
but its estimate is engine-internal and not replayable — these sketches
instead use the engine-portable md5 hash family the CV folds / samplers
already standardize on, so every estimate is a pure integer function of
the data that DuckDB reproduces bit-for-bit (true "approximate but
deterministic": the approximation is in the ESTIMATOR, never in the
execution).

Scale shape:
  * KMV keeps the k smallest distinct 32-bit hash values per group — a
    per-partition Arrow pre-prune bounds the global merge input to
    k·partitions rows, then one partitioned window takes the global
    k-min set.  Estimate = ``(k−1)·2³² DIV h_k`` (exact integer
    division; relative error ~1/√k).
  * CMS is a depth×width integer count table (one groupBy over
    ``depth`` exploded lanes per row — bounded output regardless of
    input key cardinality); a point estimate is the min over depth
    lane counts, an overestimate by construction.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: KMV hashes are the first 8 md5 hex digits → uniform on [0, 2³²)
_KMV_SPACE = 1 << 32


def _h32(col) -> object:
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def kmv_distinct(df: DataFrame, col: str, *, group_by: str,
                 k: int = 256) -> DataFrame:
    """K-minimum-values distinct-count estimate per group →
    ``(group_by, n_kept, h_k, est_distinct)``.

    Exactly-k contract: when a group has fewer than k distinct hashes
    the estimate IS the exact distinct count (``n_kept``); otherwise
    ``(k−1)·2³² DIV h_k`` with ``h_k`` the k-th smallest hash."""
    import pandas as pd

    dist = (df.select(F.col(group_by).cast("string").alias("g"),
                      _h32(F.col(col)).alias("h"))
            .groupBy("g", "h").agg(F.lit(1)))

    def _prune(it):
        # per-partition k smallest per group: bounds the merge input to
        # k·partitions rows; the global k-min set is unchanged (any
        # global top-k member is a partition top-k member)
        for pdf in it:
            if len(pdf):
                yield (pdf.sort_values(["g", "h"])
                       .groupby("g", sort=False).head(k)[["g", "h"]])
            else:
                yield pd.DataFrame({"g": pd.Series([], dtype=str),
                                    "h": pd.Series([], dtype="int64")})

    pruned = dist.select("g", "h").mapInPandas(_prune, "g string, h long")
    w = Window.partitionBy("g").orderBy("h")
    kmin = (pruned.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k))
    return (kmin.groupBy("g")
            .agg(F.count(F.lit(1)).alias("n_kept"),
                 F.max("h").alias("h_k"))
            .select(F.col("g").alias(group_by), "n_kept", "h_k",
                    F.when(F.col("n_kept") < k, F.col("n_kept"))
                    .otherwise(F.expr(f"(({k} - 1) * {_KMV_SPACE}L) "
                                      f"DIV h_k"))
                    .cast("long").alias("est_distinct")))


def cms_lanes(df: DataFrame, col: str, *, width: int = 1024,
              depth: int = 4) -> DataFrame:
    """Count-Min table: ``(lane, bucket, n)`` — depth·width rows of
    bounded state, one map-side-combined groupBy regardless of the
    input's key cardinality.

    Streaming-compatible as-is: on a ``readStream`` frame the same
    expression maintains the sketch as a bounded streaming aggregation
    (depth·width state-store keys forever, the property that makes CMS
    the right frequency monitor on an unbounded stream) — stream/batch
    equality is pinned in tests/test_streaming.py."""
    lanes = F.array(*[
        F.struct(F.lit(d).alias("lane"),
                 F.pmod(_h32(F.concat(F.lit(f"{d}|"), F.col(col))),
                        F.lit(width)).alias("bucket"))
        for d in range(depth)])
    return (df.select(F.explode(lanes).alias("lb"))
            .select("lb.lane", "lb.bucket")
            .groupBy("lane", "bucket")
            .agg(F.count(F.lit(1)).alias("n")))


def cms_point_estimates(table: DataFrame, items: Sequence[str], *,
                        width: int = 1024, depth: int = 4) -> DataFrame:
    """Point-frequency estimates for ``items`` from a ``cms_lanes``
    table → ``(item, cms_n)``: min over the depth lane counts (an
    overestimate of the true count by construction; error ≤ 2N/width
    with probability 1−2^−depth)."""
    import hashlib

    spark = table.sparkSession
    probes = []
    for it in items:
        for d in range(depth):
            h = int(hashlib.md5(f"{d}|{it}".encode()).hexdigest()[:8], 16)
            probes.append((it, d, h % width))
    pr = spark.createDataFrame(probes, "item string, lane int, bucket int")
    return (pr.join(table, ["lane", "bucket"], "left")
            .groupBy("item")
            .agg(F.min(F.coalesce(F.col("n"), F.lit(0)))
                 .cast("long").alias("cms_n")))
