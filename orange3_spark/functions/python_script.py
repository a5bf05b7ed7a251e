"""Python Script surface + custom-aggregate (UDAF) wrappers.

Reference: ``Orange/widgets/data/owpythonscript.py`` — an escape hatch that
hands the user's function the in-memory table (``in_data``) and takes back
``out_data``.  The distributed equivalents:

- ``python_script``: the user's pandas-level function runs per Arrow batch
  (``mapInPandas``) or once per group (``applyInPandas``) — never on the
  collected table, so the escape hatch survives 100 TB.  The function must
  be row-local (batch boundaries are arbitrary); for whole-group logic pass
  ``group_by``.
- ``grouped_agg``: GROUPED_AGG pandas UDF factory — a named custom
  aggregate usable inside ``groupBy().agg(...)`` beside built-ins, which
  Spark executes with partial Arrow batches per group (one shuffle, same
  plan shape as a built-in agg).
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf


def python_script(df: DataFrame, fn: Callable[[pd.DataFrame], pd.DataFrame],
                  schema: str, *,
                  group_by: Optional[Sequence[str]] = None) -> DataFrame:
    """Run an arbitrary pandas-level transform over the table.

    ``fn(pdf) -> pdf`` sees one Arrow batch (row-local contract) or, with
    ``group_by``, one whole group per call.  ``schema`` is the output
    schema DDL (e.g. ``"id long, score double"``).
    """
    if group_by:
        return df.groupBy(*group_by).applyInPandas(
            lambda pdf: fn(pdf), schema=schema)

    def run(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            yield fn(pdf)

    return df.mapInPandas(run, schema=schema)


def grouped_agg(fn: Callable[[pd.Series], float], return_type: str = "double"):
    """Wrap ``fn(Series) -> scalar`` as a GROUPED_AGG pandas UDF.

    Usage::

        trimmed = grouped_agg(lambda s: s.clip(s.quantile(.05),
                                               s.quantile(.95)).mean())
        df.groupBy("g").agg(trimmed("x").alias("trimmed_mean"))

    Caveat vs built-ins: a GROUPED_AGG UDF is not partial-aggregatable
    (no map-side combine) — every group's column ships to one task.  Use
    for genuinely custom statistics; anything expressible as built-in
    aggregates should stay JVM-side (``operators/groupby.py``).
    """
    @pandas_udf(return_type)
    def _agg(s: pd.Series) -> float:
        return fn(s)

    return _agg
