"""orange3_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of biolab/orange3, re-expressed Spark-first.

Design stance (see SURVEY.md §7):
  * Orange ``Domain``   -> ``StructType`` + per-column metadata (roles, value
    order, time flags).
  * Orange ``Table``    -> ``pyspark.sql.DataFrame``.
  * ``compute_value``   -> ``Column`` expressions; ``transform`` -> ``select``.
  * ``Storage`` pushdown hooks -> Catalyst (predicate pushdown / pruning are
    native).

Nothing in here is a port of the reference's numpy executor; only the
*semantics* (NaN-as-missing -> NULL, NULL-safe ``!=``, NaN keys never join,
group keys to metas, discrete value order) are preserved.
"""

from orange3_spark.session import get_spark, load_tables

__all__ = ["get_spark", "load_tables"]

__version__ = "0.1.0"
