"""Edit Domain / Purge Domain: schema surgery with metadata preserved.

Reference: ``Orange/widgets/data/oweditdomain.py`` (≈2900 LoC of GUI around
four operations: rename variables, rename/reorder discrete values, change
type, edit annotations) and Purge Domain (``Orange/preprocess/remove.py``:
drop constant columns, drop unused discrete values, sort values).

All are metadata-plus-projection rewrites: one ``select`` carrying the
updated column metadata (SURVEY §4 custom piece (a)); the only data scans
are the distinct/constant probes in purge, each a single aggregation.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from orange3_spark.domain import (
    Domain, META_KEY, TYPE_CONTINUOUS, TYPE_DISCRETE, TYPE_STRING, TYPE_TIME,
    Variable, with_domain,
)


def rename_variables(df: DataFrame, renames: Mapping[str, str]) -> DataFrame:
    """Rename columns, keeping each variable's metadata."""
    dom = Domain.from_df(df)
    cols, new_vars = [], []
    for f in df.schema.fields:
        new = renames.get(f.name, f.name)
        cols.append(F.col(f"`{f.name}`").alias(new))
        v = dom[f.name]
        new_vars.append(Variable(new, v.var_type, v.role, v.values,
                                 v.have_date, v.have_time,
                                 v.number_of_decimals, v.attributes))
    return with_domain(df.select(*cols), new_vars)


def rename_values(df: DataFrame, column: str,
                  mapping: Mapping[str, str]) -> DataFrame:
    """Rename discrete values (data remap + ordered values list update)."""
    dom = Domain.from_df(df)
    v = dom[column]
    expr = F.col(column)
    out_expr = None
    for old, new in mapping.items():
        cond = expr == F.lit(old)
        out_expr = F.when(cond, F.lit(new)) if out_expr is None \
            else out_expr.when(cond, F.lit(new))
    out_expr = expr if out_expr is None else out_expr.otherwise(expr)
    new_values = tuple(mapping.get(x, x) for x in (v.values or ()))
    out = df.withColumn(column, out_expr)
    return with_domain(out, [Variable(column, v.var_type, v.role,
                                      new_values or None,
                                      attributes=v.attributes)])


def reorder_values(df: DataFrame, column: str,
                   new_order: Sequence[str]) -> DataFrame:
    """Reorder a discrete variable's value list (order is semantic — it
    drives continuize indicators, mappers, display). Data untouched."""
    v = Domain.from_df(df)[column]
    missing = set(v.values or ()) - set(new_order)
    if missing:
        raise ValueError(f"new order drops values: {sorted(missing)}")
    return with_domain(df, [Variable(column, v.var_type, v.role,
                                     tuple(new_order),
                                     attributes=v.attributes)])


def change_type(df: DataFrame, column: str, new_type: str) -> DataFrame:
    """Retype a variable (string↔discrete↔continuous↔time) with cast."""
    v = Domain.from_df(df)[column]
    c = F.col(column)
    values = None
    if new_type == TYPE_CONTINUOUS:
        c = c.cast("double")
    elif new_type == TYPE_TIME:
        c = F.coalesce(F.to_timestamp(c), F.to_timestamp(c, "yyyy-MM-dd"))
    elif new_type in (TYPE_DISCRETE, TYPE_STRING):
        c = c.cast("string")
        if new_type == TYPE_DISCRETE:
            values = tuple(r[0] for r in df.select(c.alias("_v"))
                           .filter(F.col("_v").isNotNull())
                           .distinct().orderBy("_v").collect())
    out = df.withColumn(column, c)
    return with_domain(out, [Variable(column, new_type, v.role, values,
                                      attributes=v.attributes)])


def annotate(df: DataFrame, column: str, **attributes) -> DataFrame:
    """Merge free-form key=value annotations into a variable."""
    v = Domain.from_df(df)[column]
    merged = {**(v.attributes or {}), **attributes}
    return with_domain(df, [Variable(column, v.var_type, v.role, v.values,
                                     v.have_date, v.have_time,
                                     v.number_of_decimals, merged)])


def purge_domain(df: DataFrame, *, remove_constant: bool = True,
                 remove_unused_values: bool = True,
                 sort_values: bool = False) -> DataFrame:
    """Purge Domain (``remove.py:13-120``): drop constant columns, shrink
    discrete value lists to values actually present, optionally sort them.
    ONE aggregation pass probes everything."""
    dom = Domain.from_df(df)
    aggs = []
    for v in dom:
        aggs.append(F.approx_count_distinct(f"`{v.name}`").alias(f"n_{v.name}"))
        if v.is_discrete and remove_unused_values:
            aggs.append(F.collect_set(f"`{v.name}`").alias(f"s_{v.name}"))
    probe = df.agg(*aggs).first()

    keep, new_vars = [], []
    for v in dom:
        if remove_constant and probe[f"n_{v.name}"] <= 1:
            continue
        keep.append(f"`{v.name}`")
        if v.is_discrete and remove_unused_values and v.values:
            present = set(probe[f"s_{v.name}"] or [])
            vals = [x for x in v.values if x in present]
            if sort_values:
                vals = sorted(vals)
            new_vars.append(Variable(v.name, v.var_type, v.role, tuple(vals),
                                     attributes=v.attributes))
        else:
            new_vars.append(v)
    return with_domain(df.select(*keep), new_vars)
