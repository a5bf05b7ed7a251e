"""Multi-table set comparison — the Venn Diagram widget's computation.

Reference: ``Orange/widgets/visualize/owvenndiagram.py`` — up to five
input tables compared by a shared identity key; the widget renders
region counts and outputs the selected region plus the input annotated
with per-set membership indicator columns.  The GUI is out of scope;
the computations are:

* :func:`venn_membership` — one row per distinct key with a boolean
  indicator per set and the region label (e.g. ``"A∩B"``): a cascade of
  full outer joins on DISTINCT keys, so each input is scanned once and
  the join keys are pre-deduplicated (bounded fan-out, map-side
  combinable distincts).
* :func:`venn_counts` — region cardinalities: one groupBy over the
  membership frame.

At 100 TB both are ordinary shuffles on the identity key; no driver
materialization anywhere.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def venn_membership(tables: Mapping[str, DataFrame],
                    key: str) -> DataFrame:
    """``(key, <name> bool per table, region)`` for every key present in
    at least one table.  Region labels join member names with ``∩`` in
    the mapping's order (insertion-ordered, like the widget's inputs)."""
    if not 1 <= len(tables) <= 5:
        raise ValueError("venn comparison takes 1-5 tables "
                         f"(got {len(tables)})")
    names = list(tables)
    out = None
    for name, df in tables.items():
        part = (df.select(F.col(key)).where(F.col(key).isNotNull())
                .distinct().withColumn(name, F.lit(True)))
        out = part if out is None else out.join(part, key, "full_outer")
    for name in names:
        out = out.withColumn(name, F.coalesce(F.col(name), F.lit(False)))
    region = F.concat_ws("∩", *[
        F.when(F.col(n), F.lit(n)) for n in names])
    return out.withColumn("region", region)


def venn_counts(tables: Mapping[str, DataFrame], key: str) -> DataFrame:
    """Region cardinalities ``(region, n_keys)`` — the numbers inside
    the widget's circles."""
    m = venn_membership(tables, key)
    return (m.groupBy("region")
            .agg(F.count(F.lit(1)).cast("long").alias("n_keys")))


def annotate_membership(df: DataFrame, tables: Mapping[str, DataFrame],
                        key: str) -> DataFrame:
    """The widget's annotated output: ``df`` with one boolean indicator
    column per comparison set (False where the key is absent)."""
    m = venn_membership(tables, key).drop("region")
    out = df.join(m, key, "left")
    for name in tables:
        out = out.withColumn(name, F.coalesce(F.col(name), F.lit(False)))
    return out
