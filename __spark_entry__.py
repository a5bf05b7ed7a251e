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


# The correctness harness grades entries in dict order and may not reach the
# tail in one round; order so every operator accumulates a driver-recorded
# green row across rounds: (1) round-1 err/hash-mismatch queries first —
# each has a fix to prove (nanos-parquet reads, new closed-form oracles,
# tie-rank parity); (2) everything never checked; (3) queries already
# verified green in CORRECTNESS_r01.json last.
_ERR_R1 = [
    "q_outlier_iqr", "q_maha_outliers", "q_groupby_matrix", "q_window_lag",
    "q_window_cumsum", "q_media_bytes", "q_ml_kmeans", "q_ml_dbscan",
    "q_ml_pca", "q_ml_logreg_cv", "q_ml_hierarchical",
    "q_distance_spearman_rows",
]
_VERIFIED_GREEN_R1 = [
    "q_distance_rows", "q_distance_columns", "q_boxplot", "q_sieve_chi2",
    "q3_shipping_priority", "q6_forecast_revenue", "q10_returned_items",
    "q_time_bins", "q_distance_pearson_rows", "q_distance_bhattacharyya",
    "q_distance_spearman_cols", "q_outlier_lof", "q1_filter_groupby",
    "q_filter_values_tree", "q_filter_string", "q_filter_isdefined",
    "q_join_inner", "q_join_left_agg", "q5_region_revenue", "q_semi_join",
    "q_anti_join", "q_concatenate_agg", "q_pivot", "q_pivot_cube_totals",
    "q_melt", "q_unique_first", "q_topk_per_group", "q_distribution",
    "q_contingency", "q_histogram", "q_basic_stats", "q_concat_source",
    "q_create_class", "q_media_metadata", "q_media_dedup",
    "q_ml_majority_ca", "q_ml_ols", "q_ml_knn_ca",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    first = [q for q in _ERR_R1 if q in QUERIES]
    green = [q for q in _VERIFIED_GREEN_R1 if q in QUERIES]
    placed = set(first) | set(green)
    pending = [q for q in QUERIES if q not in placed]
    return {q: QUERIES[q] for q in first + pending + green}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
